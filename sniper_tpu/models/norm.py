"""Per-device BatchNorm (network.BN_MODE=local).

The reference deliberately trains PER-GPU BatchNorm statistics — the
large per-GPU chip batch (16) makes local statistics sufficient, and
skipping the cross-device sync is the point of SNIPER's "train with BN
on detection" story (/root/reference/README.md:10). Under this repo's
auto-partitioned train jit the default is the opposite: XLA computes
BN statistics over the GLOBAL batch (sync-BN, a quality superset — see
train/trainer.py module notes).

``LocalBatchNorm`` restores the reference semantics WITHOUT shard_map
(whose grad-with-aux lowering was measured 15-40x slower on this
backend): the batch axis is reshaped to [groups, B/groups, ...] and
statistics are computed per group. When ``groups`` equals the data-
parallel device count and shard_batch lays images out contiguously per
device (it does — jax.sharding over dim 0), each group's statistics
only read that device's shard, so XLA partitions the reduction locally
with no cross-device collective, exactly like per-GPU BN.

Variable structure matches flax.linen.BatchNorm bit-for-bit (params:
scale/bias, batch_stats: mean/var, fp32) so sync- and local-mode
checkpoints are interchangeable. Running statistics are updated with
the across-group AVERAGE of the per-group moments — the analog of
MXNet Module's aux-state averaging across devices when saving
(the reference's per-epoch checkpoints do exactly that).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp


class LocalBatchNorm(nn.Module):
    """Drop-in for nn.BatchNorm computing statistics per batch group.

    groups=1 gives exactly nn.BatchNorm's training behavior (global
    batch statistics); groups=N gives per-device statistics on an
    N-device data-parallel mesh. Inference (use_running_average=True)
    is identical to nn.BatchNorm.
    """

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = None
    groups: int = 1
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = (
            self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            if self.use_scale else jnp.ones((c,), jnp.float32)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            if self.use_bias else jnp.zeros((c,), jnp.float32)
        )

        if self.use_running_average:
            y = (x.astype(jnp.float32) - ra_mean.value) * lax.rsqrt(
                ra_var.value + self.epsilon
            ) * scale + bias
        else:
            g = self.groups
            b = x.shape[0]
            if b % g:
                raise ValueError(
                    f"LocalBatchNorm: batch {b} not divisible by "
                    f"groups {g} (BN_MODE=local needs the global batch "
                    "to split evenly across devices)"
                )
            xg = x.astype(jnp.float32).reshape((g, b // g) + x.shape[1:])
            axes = tuple(range(1, xg.ndim - 1))  # per-group batch+spatial
            gmean = jnp.mean(xg, axis=axes)            # [g, c]
            gvar = jnp.mean(
                jnp.square(xg), axis=axes
            ) - jnp.square(gmean)                       # E[x^2]-E[x]^2
            bshape = (g,) + (1,) * (xg.ndim - 2) + (c,)
            y = (xg - gmean.reshape(bshape)) * lax.rsqrt(
                gvar.reshape(bshape) + self.epsilon
            )
            y = y.reshape(x.shape) * scale + bias
            if not self.is_initializing():
                m = jnp.float32(self.momentum)
                ra_mean.value = m * ra_mean.value + (1 - m) * gmean.mean(0)
                ra_var.value = m * ra_var.value + (1 - m) * gvar.mean(0)
        return y.astype(self.dtype or x.dtype)


def make_batch_norm(*, use_running_average, momentum, epsilon, dtype,
                    name, bn_mode: str = "sync", bn_groups: int = 1,
                    use_scale: bool = True, use_bias: bool = True):
    """The one BN constructor every trunk goes through.

    bn_mode="sync" (default) -> flax nn.BatchNorm: under the
    auto-partitioned train jit its statistics are global-batch (sync-
    BN). bn_mode="local" -> LocalBatchNorm with ``bn_groups`` groups
    (per-device statistics, the reference's training semantics).
    Frozen/inference BN is identical either way, so "local" only
    changes the training-time statistics.
    """
    if bn_mode == "local" and not use_running_average and bn_groups > 1:
        return LocalBatchNorm(
            use_running_average=False, momentum=momentum, epsilon=epsilon,
            dtype=dtype, groups=bn_groups, use_scale=use_scale,
            use_bias=use_bias, name=name,
        )
    return nn.BatchNorm(
        use_running_average=use_running_average, momentum=momentum,
        epsilon=epsilon, dtype=dtype, use_scale=use_scale,
        use_bias=use_bias, name=name,
    )
