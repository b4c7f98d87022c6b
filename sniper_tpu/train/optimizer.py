"""Optimizer + LR schedule matching the reference training recipe.

Reference: /root/reference/lib/train_utils/utils.py:13-42 (SGD momentum
0.9, weight decay, fp16 loss-scale arithmetic — unnecessary under bf16)
and lr_scheduler.py:43-66 (WarmupMultiBatchScheduler: linear warmup
``warmup_lr -> lr`` over ``warmup_step`` iterations, then multiplicative
``lr_factor`` decay at epoch-fraction boundaries converted to iteration
counts).

Frozen parameters (network.FIXED_PARAMS prefix matching, reference
utils.py:103-117) are masked out of the update (zero update; they also
receive no weight decay).
"""

from __future__ import annotations

import jax
import optax


def warmup_multistep(base_lr, warmup_lr, warmup_step, steps, factor=0.1):
    """Linear warmup then step decay; ``steps`` are absolute iterations."""
    def schedule(count):
        import jax.numpy as jnp

        count = jnp.asarray(count, jnp.float32)
        frac = jnp.clip(count / jnp.maximum(warmup_step, 1), 0.0, 1.0)
        lr = warmup_lr + (base_lr - warmup_lr) * frac
        n_decays = sum(
            (count >= s).astype(jnp.float32) for s in steps
        ) if steps else 0.0
        return jnp.where(
            count < warmup_step, lr, base_lr * factor ** n_decays
        )

    return schedule


def lr_step_iters(lr_step: str, epoch_size: int) -> list[int]:
    """'5.33' or '4,6' epoch fractions -> absolute iteration counts."""
    if not lr_step:
        return []
    return [int(float(s) * epoch_size) for s in str(lr_step).split(",")]


def fixed_param_mask(params, fixed_prefixes):
    """Pytree mask: False (frozen) when any path component starts with a
    fixed prefix (reference prefix semantics: 'stage1' freezes every
    stage1_unit*)."""
    prefixes = tuple(fixed_prefixes or ())

    def trainable(path):
        for p in path:
            name = getattr(p, "key", None)
            if name is None:
                continue
            if any(name.startswith(pref) for pref in prefixes):
                return False
        return True

    return jax.tree_util.tree_map_with_path(
        lambda path, _: trainable(path), params
    )


def make_optimizer(cfg, epoch_size: int, params):
    """optax chain reproducing the reference SGD recipe. Returns (tx,
    schedule) — schedule exposed for logging."""
    steps = lr_step_iters(cfg.TRAIN.lr_step, epoch_size)
    schedule = warmup_multistep(
        cfg.TRAIN.lr,
        cfg.TRAIN.warmup_lr if cfg.TRAIN.warmup else cfg.TRAIN.lr,
        cfg.TRAIN.warmup_step if cfg.TRAIN.warmup else 0,
        steps,
        cfg.TRAIN.lr_factor,
    )
    mask = fixed_param_mask(params, cfg.network.FIXED_PARAMS)
    tx = optax.chain(
        optax.masked(optax.add_decayed_weights(cfg.TRAIN.wd), mask),
        optax.trace(decay=cfg.TRAIN.momentum, nesterov=False),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
        optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(
            lambda t: not t, mask)),
    )
    return tx, schedule
