"""Box geometry: IoU, coverage overlaps, clipping, box<->delta transforms.

Single-source, dual-backend pure functions: every function works on both
NumPy arrays (host plane: data pipeline, eval) and JAX arrays / tracers
(device plane: inside jitted steps). Backend is picked per call from the
input type, so host code never triggers a TPU transfer.

Semantics match the reference detector conventions so checkpoints and mAP
numbers are comparable (legacy +1 box widths, center = x1 + 0.5*(w-1),
1e-7 eps in encode denominators):
- IoU:            /root/reference/lib/bbox/bbox.pyx:17-58
- ignore overlap: /root/reference/lib/bbox/bbox.pyx:60-95
  (intersection / query-box area; ==1 means the query box is fully
  contained — used for chip coverage)
- clip/filter:    /root/reference/lib/bbox/bbox_transform.py:35-62
- encode/decode:  /root/reference/lib/bbox/bbox_transform.py:64-130

All functions are vectorized (no Python loops over boxes) and, on the JAX
backend, shape-polymorphic only in the static sense — fixed N/K per trace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _xp(*arrays):
    """Pick numpy or jax.numpy based on the inputs."""
    for a in arrays:
        if isinstance(a, jax.Array):
            return jnp
    return np


def box_area(boxes, xp=None):
    """Legacy (+1) area of [..., 4] xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0] + 1.0) * (
        boxes[..., 3] - boxes[..., 1] + 1.0
    )


def bbox_overlaps(boxes, query_boxes):
    """IoU matrix. boxes [N,4], query_boxes [K,4] -> [N,K]."""
    xp = _xp(boxes, query_boxes)
    b = boxes[:, None, :]  # [N,1,4]
    q = query_boxes[None, :, :]  # [1,K,4]
    iw = xp.minimum(b[..., 2], q[..., 2]) - xp.maximum(b[..., 0], q[..., 0]) + 1.0
    ih = xp.minimum(b[..., 3], q[..., 3]) - xp.maximum(b[..., 1], q[..., 1]) + 1.0
    iw = xp.maximum(iw, 0.0)
    ih = xp.maximum(ih, 0.0)
    inter = iw * ih
    union = box_area(boxes)[:, None] + box_area(query_boxes)[None, :] - inter
    return xp.where(inter > 0.0, inter / union, xp.zeros_like(inter))


def ignore_overlaps(boxes, query_boxes):
    """Intersection area / query-box area. boxes [N,4], query [K,4] -> [N,K].

    ==1.0 iff the query box is fully inside box n. This is the chip
    'coverage' measure in the SNIPER sampler.
    """
    xp = _xp(boxes, query_boxes)
    b = boxes[:, None, :]
    q = query_boxes[None, :, :]
    iw = xp.minimum(b[..., 2], q[..., 2]) - xp.maximum(b[..., 0], q[..., 0]) + 1.0
    ih = xp.minimum(b[..., 3], q[..., 3]) - xp.maximum(b[..., 1], q[..., 1]) + 1.0
    iw = xp.maximum(iw, 0.0)
    ih = xp.maximum(ih, 0.0)
    inter = iw * ih
    return inter / box_area(query_boxes)[None, :]


def clip_boxes(boxes, im_shape):
    """Clip [..., 4k] xyxy boxes to [0, H-1] x [0, W-1]. im_shape=(H, W).

    Functional (returns a new array) unlike the reference's in-place clip.
    """
    xp = _xp(boxes)
    h, w = im_shape[0], im_shape[1]
    x_like = boxes[..., 0::4]
    lo = xp.zeros_like(x_like)
    xs = xp.clip(boxes[..., 0::4], lo, w - 1.0)
    ys = xp.clip(boxes[..., 1::4], lo, h - 1.0)
    x2 = xp.clip(boxes[..., 2::4], lo, w - 1.0)
    y2 = xp.clip(boxes[..., 3::4], lo, h - 1.0)
    out = xp.stack([xs, ys, x2, y2], axis=-1)  # [..., k, 4]
    return out.reshape(boxes.shape)


def filter_boxes_mask(boxes, min_size):
    """Boolean mask of boxes with both sides >= min_size (static shape)."""
    ws = boxes[..., 2] - boxes[..., 0] + 1.0
    hs = boxes[..., 3] - boxes[..., 1] + 1.0
    return (ws >= min_size) & (hs >= min_size)


def bbox_transform(ex_rois, gt_rois, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode gt boxes relative to example rois -> deltas [N,4]."""
    xp = _xp(ex_rois, gt_rois)
    ew = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    eh = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex = ex_rois[..., 0] + 0.5 * (ew - 1.0)
    ey = ex_rois[..., 1] + 0.5 * (eh - 1.0)
    gw = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gh = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gx = gt_rois[..., 0] + 0.5 * (gw - 1.0)
    gy = gt_rois[..., 1] + 0.5 * (gh - 1.0)
    dx = weights[0] * (gx - ex) / (ew + 1e-7)
    dy = weights[1] * (gy - ey) / (eh + 1e-7)
    dw = weights[2] * xp.log(gw / (ew + 1e-7))
    dh = weights[3] * xp.log(gh / (eh + 1e-7))
    return xp.stack([dx, dy, dw, dh], axis=-1)


def bbox_pred(boxes, box_deltas):
    """Decode deltas on boxes. boxes [...,4], deltas [...,4k] -> [...,4k]."""
    xp = _xp(boxes, box_deltas)
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * (widths - 1.0)
    ctr_y = boxes[..., 1] + 0.5 * (heights - 1.0)

    dx = box_deltas[..., 0::4]
    dy = box_deltas[..., 1::4]
    dw = box_deltas[..., 2::4]
    dh = box_deltas[..., 3::4]

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = xp.exp(dw) * widths[..., None]
    pred_h = xp.exp(dh) * heights[..., None]

    out = xp.stack(
        [
            pred_ctr_x - 0.5 * (pred_w - 1.0),
            pred_ctr_y - 0.5 * (pred_h - 1.0),
            pred_ctr_x + 0.5 * (pred_w - 1.0),
            pred_ctr_y + 0.5 * (pred_h - 1.0),
        ],
        axis=-1,
    )  # [..., k, 4]
    return out.reshape(box_deltas.shape)
