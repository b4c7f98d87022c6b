"""Data-parallel training step.

TPU-native replacement for the reference's MXNet Module.fit +
kvstore='device' loop (main_train.py:89-146): ONE jitted step over the
'data' mesh axis using XLA's automatic SPMD partitioning — the batch is
sharded along dim 0 (shard_batch), params/optimizer state are
replicated, and XLA inserts the gradient all-reduces and BatchNorm
statistics collectives over ICI.

BatchNorm note: under auto-partitioning the BN statistics are computed
over the GLOBAL batch (sync-BN). The reference trains per-device BN
(README.md:10) purely to avoid NCCL sync cost; global statistics are a
quality superset. (A shard_map per-device-BN variant was measured at
17-20s/step on this backend — shard_map + grad aux outputs hit a
pathological lowering — vs 0.6s for the auto-partitioned step, so
auto-partitioning is the shipped path.)
"""

from __future__ import annotations

import functools
from collections.abc import Mapping
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from sniper_tpu.models.losses import total_loss


def _collect_sown(tree, name):
    """All values sown under ``name`` anywhere in an intermediates
    tree (each sow stores a tuple of values per module path)."""
    vals = []
    for k, v in tree.items():
        if k == name:
            vals.extend(v)
        elif isinstance(v, Mapping):
            vals.extend(_collect_sown(v, name))
    return vals


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
    data = sample_batch["data"]
    if data.dtype == jnp.uint8:
        # init only needs shapes/dtypes — a plain cast stands in for the
        # on-device normalization the real step applies
        data = data.astype(jnp.float32)
    variables = model.init(
        rngs,
        data,
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
                    ohem_rois: int = 0, axis: str = "data",
                    pixel_means=None):
    """Build the jitted data-parallel train step.

    Returns step(state, batch, key) -> (state, metrics). ``batch``
    arrays are sharded along dim 0 (see shard_batch); loss
    normalizations use the GLOBAL batch size (equivalent to the
    reference's per-GPU loss + kvstore averaging).

    uint8 batches (ChipLoader's default — 4x fewer host->device bytes)
    are mean-subtracted on device over each chip's ``data_extent``
    content dims; fp32 batches pass through untouched.
    """
    from sniper_tpu.infer.tester import device_normalize

    n_dev = mesh.devices.size
    batch_images_global = batch_images_per_device * n_dev

    def loss_fn(params, batch_stats, batch, key):
        data = batch["data"]
        if data.dtype == jnp.uint8:
            if pixel_means is None:
                # fail at trace time: zero means would silently train on
                # un-normalized images
                raise ValueError(
                    "uint8 batch but make_train_step got no pixel_means "
                    "— pass cfg.network.PIXEL_MEANS (or use "
                    "ChipLoader(uint8_data=False))"
                )
            data = device_normalize(data, batch["data_extent"], pixel_means)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            data, batch["im_info"], batch["gt_boxes"],
            batch["valid_ranges"], gt_masks=batch.get("gt_masks"),
            train=True, rngs={"sampling": key},
            mutable=["batch_stats", "intermediates"],
        )
        loss, metrics = total_loss(
            out, batch, batch_images=batch_images_global,
            rpn_batch_size=rpn_batch_size, with_autofocus=with_autofocus,
            with_mask=with_mask, rpn_only=rpn_only, ohem_rois=ohem_rois,
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
            metrics["rcnn_fg_frac"] = fg.sum() / jnp.maximum(valid.sum(), 1)
            # HEAD_MARGIN_BINS clamp telemetry sown by RCNNHead: max
            # |trans| the offset FC produced and the fraction at/over
            # the stencil's margin clamp (a silent quality failure if
            # it ever becomes non-negligible on a real run)
            rcnn_inter = mutated.get("intermediates", {}).get("rcnn", {})
            for k in ("offset_max", "offset_clamp_frac",
                      "offset_clamp_thr"):
                if k in rcnn_inter:
                    metrics[k] = rcnn_inter[k][0]
        # trunk DCN offset telemetry (one sow per deformable unit,
        # nested under the unit's module path — walk the whole tree)
        dcn_max = _collect_sown(
            mutated.get("intermediates", {}), "dcn_offset_max"
        )
        if dcn_max:
            metrics["dcn_offset_max"] = jnp.max(jnp.stack(dcn_max))
        dcn_cf = _collect_sown(
            mutated.get("intermediates", {}), "dcn_offset_clamp_frac"
        )
        if dcn_cf:
            metrics["dcn_offset_clamp_frac"] = jnp.mean(jnp.stack(dcn_cf))
        return loss, (metrics, mutated["batch_stats"])

    # NOTE: no in-graph with_sharding_constraint — the committed input
    # shardings from shard_batch() already carry the data-parallel
    # layout, and an explicit constraint forces an SPMD-partitioner
    # path that lowers this graph catastrophically on the current
    # backend (measured 22.1s vs 0.35s per step on one chip).
    del axis

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1, params=params,
                batch_stats=new_bs, opt_state=opt_state,
            ),
            metrics,
        )

    return step


def make_eval_step(model, mesh: Mesh, axis: str = "data"):
    """Jitted data-parallel inference step: batch in, detections out.
    Shardings come from the committed inputs (shard_batch), not in-graph
    constraints (see make_train_step note)."""
    del mesh, axis

    @jax.jit
    def step(params, batch_stats, data, im_info):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            data, im_info, train=False,
        )

    return step
