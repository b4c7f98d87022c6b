"""Data-parallel training step: shard_map over the 'data' mesh axis.

TPU-native replacement for the reference's MXNet Module.fit +
kvstore='device' loop (main_train.py:89-146): one jitted step that runs
per-device forward/backward (per-device BatchNorm statistics — the
reference's semantics, README.md:10), ``pmean``s gradients, metrics and
updated BN stats over ICI, and applies the optimizer. Params and
optimizer state are replicated; only the batch is sharded.

Optional cross-replica ("sync") BatchNorm is available by pmean-ing the
stats each step (cfg.parallel.sync_batchnorm) — stats are pmean-ed either
way so checkpoints are replica-consistent; the flag is reserved for true
in-graph sync BN later.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sniper_tpu.models.losses import total_loss


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, cfg, sample_batch, tx, seed: int = 0):
    """Initialize model variables + optimizer state from one host batch."""
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "sampling": jax.random.PRNGKey(seed + 1),
    }
    variables = model.init(
        rngs,
        sample_batch["data"],
        sample_batch["im_info"],
        sample_batch["gt_boxes"],
        sample_batch["valid_ranges"],
        gt_masks=sample_batch.get("gt_masks"),
        train=True,
    )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(model, tx, mesh: Mesh, batch_images_per_device: int,
                    rpn_batch_size: int = 256, with_autofocus: bool = False,
                    with_mask: bool = False, rpn_only: bool = False,
                    axis: str = "data"):
    """Build the jitted data-parallel train step.

    Returns step(state, batch, key) -> (state, metrics). ``batch`` dicts
    are sharded along dim 0; ``key`` is a replicated PRNG key folded with
    the device index so roi sampling differs per replica.
    """

    def device_step(state, batch, key):
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["data"], batch["im_info"], batch["gt_boxes"],
                batch["valid_ranges"], gt_masks=batch.get("gt_masks"),
                train=True, rngs={"sampling": key}, mutable=["batch_stats"],
            )
            loss, metrics = total_loss(
                out, batch, batch_images=batch_images_per_device,
                rpn_batch_size=rpn_batch_size, with_autofocus=with_autofocus,
                with_mask=with_mask, rpn_only=rpn_only,
            )
            # train-visible accuracy metrics (reference metric.py set)
            if not rpn_only:
                labels = out["rcnn_labels"]
                pred = jnp.argmax(out["cls_score"], axis=-1)
                valid = labels >= 0
                metrics["rcnn_acc"] = jnp.where(
                    valid, (pred == labels), 0
                ).sum() / jnp.maximum(valid.sum(), 1)
                fg = labels > 0
                metrics["rcnn_fg_frac"] = fg.sum() / jnp.maximum(
                    valid.sum(), 1)
            return loss, (metrics, mutated["batch_stats"])

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        new_bs = jax.lax.pmean(new_bs, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1, params=params,
                batch_stats=new_bs, opt_state=opt_state,
            ),
            metrics,
        )

    rep = P()
    data_spec = {
        k: P(axis)
        for k in ("data", "im_info", "gt_boxes", "valid_ranges", "label",
                  "bbox_target", "bbox_weight", "scale_label", "gt_masks")
    }

    def batch_spec(batch):
        return {k: data_spec[k] for k in batch}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        f = shard_map(
            device_step, mesh=mesh,
            in_specs=(rep, batch_spec(batch), rep),
            out_specs=(rep, rep),
            check_vma=False,
        )
        return f(state, batch, key)

    return step


def make_eval_step(model, mesh: Mesh, axis: str = "data"):
    """Jitted data-parallel inference step: batch in, detections out."""

    def device_step(params, batch_stats, data, im_info):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            data, im_info, train=False,
        )

    @jax.jit
    def step(params, batch_stats, data, im_info):
        f = shard_map(
            device_step, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
        return f(params, batch_stats, data, im_info)

    return step
