"""Pre-activation ResNet trunks with deformable, dilated C5.

TPU-native rebuild of the reference trunk
(/root/reference/symbols/faster/resnet_mx_101_e2e.py:36-145,394-448):
- pre-act bottlenecks (BN -> ReLU -> conv x3, shortcut conv off act1),
- stem: data-normalizing frozen BN, 7x7/2 conv, frozen BN, maxpool 3x3/2,
- stage1 BN frozen (use_global_stats), stages 2-3 BN trainable with
  momentum 0.95 (SNIPER's real-BN-training selling point),
- C5: stride 1, dilation 2, deformable 3x3 (4 groups) with a
  zero-initialized offset conv per unit,
- C4 (1024ch) and C5 (2048ch) returned separately; the detector concats
  them for the RPN/heads like the reference.

Layout is NHWC; trunk compute runs in ``dtype`` (bf16 by default) with
fp32 params and fp32 BN statistics — the TPU replacement for the
reference's fp16 + static-loss-scale scheme.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sniper_tpu.ops.deform import deformable_conv

BN_EPS = 2e-5


def sow_dcn_offset_stats(mod, offsets, window: int = 0):
    """Sow trunk DCN offset telemetry into 'intermediates'.

    A no-op unless the collection is mutable (the train step makes it
    so); the train loop surfaces the running max as dcn_offset_max so a
    real run records how far learned C5 offsets actually reach — the
    evidence that decides whether the bounded-window fast path
    (network.DEFORM_WINDOW) is lossless for a given checkpoint.
    """
    ab = jnp.abs(jax.lax.stop_gradient(offsets.astype(jnp.float32)))
    mod.sow("intermediates", "dcn_offset_max", jnp.max(ab))
    if window:
        mod.sow(
            "intermediates", "dcn_offset_clamp_frac",
            jnp.mean((ab >= float(window)).astype(jnp.float32)),
        )


class PreActBottleneck(nn.Module):
    filters: int           # output channels
    stride: int = 1
    dim_match: bool = True
    fix_bn: bool = False
    dilation: int = 1
    deform: bool = False
    deform_groups: int = 4
    bn_momentum: float = 0.95
    bn_mode: str = "sync"      # "local" -> per-device statistics
    bn_groups: int = 1         # data-parallel device count for "local"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        from sniper_tpu.models.norm import make_batch_norm

        mid = self.filters // 4
        use_ra = (not train) or self.fix_bn

        def bn(name):
            return make_batch_norm(
                use_running_average=use_ra, momentum=self.bn_momentum,
                epsilon=BN_EPS, dtype=self.dtype, name=name,
                bn_mode=self.bn_mode, bn_groups=self.bn_groups,
            )

        def conv(f, k, s, d, name):
            return nn.Conv(
                f, (k, k), strides=(s, s), padding=[(d * (k - 1) // 2,) * 2] * 2,
                kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
                name=name,
            )

        act1 = nn.relu(bn("bn1")(x)).astype(self.dtype)
        h = conv(mid, 1, 1, 1, "conv1")(act1)
        act2 = nn.relu(bn("bn2")(h)).astype(self.dtype)
        if self.deform:
            offsets = nn.Conv(
                self.deform_groups * 2 * 9, (3, 3), padding=[(2, 2), (2, 2)],
                kernel_dilation=(2, 2), dtype=jnp.float32,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                name="offset",
            )(act2.astype(jnp.float32))
            sow_dcn_offset_stats(self, offsets)
            kernel = self.param(
                "conv2_kernel",
                nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
                (3, 3, mid, mid), jnp.float32,
            )
            h = deformable_conv(
                act2, offsets, kernel.astype(self.dtype),
                num_groups=self.deform_groups, dilation=self.dilation,
            ).astype(self.dtype)
        else:
            h = conv(mid, 3, self.stride, self.dilation, "conv2")(act2)
        act3 = nn.relu(bn("bn3")(h)).astype(self.dtype)
        h = conv(self.filters, 1, 1, 1, "conv3")(act3)
        if self.dim_match:
            sc = x.astype(self.dtype)
        else:
            sc = conv(self.filters, 1, self.stride, 1, "sc")(act1)
        return h + sc


class ResNetTrunk(nn.Module):
    """c4/c5 feature extractor. units=(3,4,23,3) for R101, (3,4,6,3) R50."""

    units: Sequence[int] = (3, 4, 23, 3)
    filters: Sequence[int] = (64, 256, 512, 1024, 2048)
    deform_c5: bool = True
    bn_momentum: float = 0.95
    bn_mode: str = "sync"      # network.BN_MODE: per-device stats = "local"
    bn_groups: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x [B,H,W,3] raw pixel-mean-subtracted input. Returns (c4, c5)."""
        # frozen data-normalizing BN (gamma fixed, global stats)
        h = nn.BatchNorm(
            use_running_average=True, epsilon=BN_EPS, use_scale=False,
            dtype=jnp.float32, name="bn_data",
        )(x.astype(jnp.float32))
        h = nn.Conv(
            self.filters[0], (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=jnp.float32, name="conv0",
        )(h)
        h = h.astype(self.dtype)  # reference casts to half after conv0
        h = nn.BatchNorm(
            use_running_average=True, epsilon=BN_EPS, dtype=self.dtype,
            name="bn0",
        )(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # stages 1..3 -> C4
        for i in range(3):
            fix = i == 0  # stage1 BN frozen like the reference
            h = PreActBottleneck(
                self.filters[i + 1], stride=1 if i == 0 else 2, dim_match=False,
                fix_bn=fix, bn_momentum=self.bn_momentum, dtype=self.dtype,
                bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                name=f"stage{i + 1}_unit1",
            )(h, train)
            for j in range(self.units[i] - 1):
                h = PreActBottleneck(
                    self.filters[i + 1], dim_match=True, fix_bn=fix,
                    bn_momentum=self.bn_momentum, dtype=self.dtype,
                    bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                    name=f"stage{i + 1}_unit{j + 2}",
                )(h, train)
        c4 = h

        # stage 4 -> C5: stride 1, dilation 2, deformable
        h = PreActBottleneck(
            self.filters[4], stride=1, dim_match=False, dilation=2,
            deform=self.deform_c5, bn_momentum=self.bn_momentum,
            bn_mode=self.bn_mode, bn_groups=self.bn_groups,
            dtype=self.dtype, name="stage4_unit1",
        )(c4, train)
        for j in range(self.units[3] - 1):
            h = PreActBottleneck(
                self.filters[4], dim_match=True, dilation=2,
                deform=self.deform_c5, bn_momentum=self.bn_momentum,
                bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                dtype=self.dtype, name=f"stage4_unit{j + 2}",
            )(h, train)
        return c4, h
