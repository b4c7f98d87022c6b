"""Pallas TPU kernel for greedy NMS.

Alternative to ops.nms.nms_jax with the whole select-max/suppress loop
in one on-core kernel (boxes+scores resident in VMEM). Measured on v5e
with 6000 boxes -> 300 keeps: 41.6ms vs 5.3ms for the lax.fori_loop
version — XLA's loop codegen wins here (this kernel's per-iteration
argmax/tie-break does several full-row reductions), so nms_jax remains
the default; this kernel is kept as the starting point for a future
fused proposal-top-k+NMS kernel and as Pallas infrastructure.

Semantics match nms_jax exactly: greedy by descending score, suppression
at ``iou >= thresh``, padded entries carry score <= NEG_INF/2 and are
never selected; emits keep indices [max_out] (-1 padded) + validity.

The kernel requires N (boxes) to be a multiple of 128 (lane width); the
wrapper pads with NEG_INF scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sniper_tpu.ops.nms import NEG_INF


def _nms_kernel(boxes_ref, scores_ref, keep_ref, valid_ref, live_ref,
                *, max_out: int, thresh: float):
    n = scores_ref.shape[1]
    live_ref[:] = scores_ref[:]  # [1, N] mutable working scores

    x1 = boxes_ref[0, :]
    y1 = boxes_ref[1, :]
    x2 = boxes_ref[2, :]
    y2 = boxes_ref[3, :]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_idx = jax.lax.broadcasted_iota(jnp.int32, keep_ref.shape, 1)
    keep_ref[:] = jnp.full(keep_ref.shape, -1, jnp.int32)
    valid_ref[:] = jnp.zeros(valid_ref.shape, jnp.int32)

    def body(k, _):
        s = live_ref[0, :]
        best = jnp.max(s)
        # first index achieving the max (argmax semantics)
        is_best = (s == best) & (idx[0] == jnp.min(
            jnp.where(s == best, idx[0], n)
        ))
        i = jnp.min(jnp.where(is_best, idx[0], n))
        ok = best > NEG_INF / 2

        bx1 = jnp.sum(jnp.where(is_best, x1, 0.0))
        by1 = jnp.sum(jnp.where(is_best, y1, 0.0))
        bx2 = jnp.sum(jnp.where(is_best, x2, 0.0))
        by2 = jnp.sum(jnp.where(is_best, y2, 0.0))
        barea = jnp.sum(jnp.where(is_best, areas, 0.0))

        iw = jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1) + 1.0
        ih = jnp.minimum(by2, y2) - jnp.maximum(by1, y1) + 1.0
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        iou = inter / (barea + areas - inter)
        sup = (iou >= thresh) | is_best
        live_ref[0, :] = jnp.where(ok & sup, NEG_INF, s)

        # scalar stores are unsupported in VMEM: masked row writes
        at_k = out_idx == k
        keep_ref[:] = jnp.where(
            at_k, jnp.where(ok, i, -1).astype(jnp.int32), keep_ref[:]
        )
        valid_ref[:] = jnp.where(
            at_k, jnp.where(ok, 1, 0).astype(jnp.int32), valid_ref[:]
        )
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


@functools.partial(jax.jit, static_argnames=("max_out", "thresh"))
def nms_pallas(boxes: jax.Array, scores: jax.Array, max_out: int,
               thresh: float):
    """boxes [N,4], scores [N] -> (keep [max_out] int32, valid [max_out]
    bool). Drop-in for ops.nms.nms_jax."""
    n = boxes.shape[0]
    n_pad = (n + 127) // 128 * 128
    b = jnp.full((4, n_pad), -1e8, jnp.float32)
    b = b.at[:, :n].set(boxes.T.astype(jnp.float32))
    s = jnp.full((1, n_pad), NEG_INF, jnp.float32)
    s = s.at[0, :n].set(scores.astype(jnp.float32))

    m_pad = (max_out + 127) // 128 * 128
    keep, valid = pl.pallas_call(
        functools.partial(_nms_kernel, max_out=max_out, thresh=thresh),
        out_shape=(
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
    )(b, s)
    return keep[0, :max_out], valid[0, :max_out] > 0
