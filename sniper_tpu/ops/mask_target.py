"""Per-roi mask target generation (TPU-native MaskRcnnTarget).

The reference's fork op MaskRcnnTarget rasterizes encoded GT polygons per
roi into 28x28 targets on the GPU
(/root/reference/symbols/faster/resnet_mx_101_e2e_mask.py:392-394;
contract in SURVEY.md §2.9). Polygon rasterization is hostile to XLA, so
the pipeline is split: the host rasterizes each GT's polygons once into a
box-normalized dense grid (data/mask_utils.rasterize_gt_masks, default
112^2 = 4x target resolution), and this op crop-resizes the matched GT's
dense mask into every sampled roi's 28x28 grid with bilinear gathers —
functionally equivalent up to resampling, fully jittable.

Targets: 1 inside the object, 0 elsewhere, -1 everywhere for invalid
rois (ignored by the valid-normalized mask CE, like the reference's
SoftmaxOutput ignore_label=-1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_targets_from_dense(
    mask_rois: jax.Array,     # [B, M, 5] (batch idx + xyxy, chip coords)
    matched_gt: jax.Array,    # [B, M] gt index, -1 invalid
    gt_boxes: jax.Array,      # [B, G, 5]
    gt_masks_dense: jax.Array,  # [B, G, D, D] {0,1}
    mask_size: int = 28,
    thresh: float = 0.5,
):
    """Returns (targets [B, M, S, S] in {-1, 0, 1}, class_ids [B, M])."""
    D = gt_masks_dense.shape[-1]
    S = mask_size

    def one(rois, gids, gtb, masks):
        valid = gids >= 0
        g = jnp.maximum(gids, 0)
        boxes = gtb[g, :4]  # [M,4]
        cls = gtb[g, 4]
        m = masks[g]  # [M,D,D]

        x1, y1 = rois[:, 1], rois[:, 2]
        x2, y2 = rois[:, 3], rois[:, 4]
        # roi sample grid (pixel centers of the S x S target cells)
        fy = (jnp.arange(S) + 0.5) / S
        fx = (jnp.arange(S) + 0.5) / S
        py = y1[:, None] + fy[None, :] * (y2 - y1)[:, None]  # [M,S]
        px = x1[:, None] + fx[None, :] * (x2 - x1)[:, None]
        # into gt-box-normalized dense-grid coords
        gw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-3)
        gh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-3)
        uy = (py - boxes[:, 1][:, None]) / gh[:, None] * D - 0.5  # [M,S]
        ux = (px - boxes[:, 0][:, None]) / gw[:, None] * D - 0.5

        inside = (
            (uy[:, :, None] > -1.0) & (uy[:, :, None] < D)
            & (ux[:, None, :] > -1.0) & (ux[:, None, :] < D)
        )  # [M,S,S]
        yc = jnp.clip(uy, 0.0, D - 1.0)
        xc = jnp.clip(ux, 0.0, D - 1.0)
        y0 = jnp.floor(yc).astype(jnp.int32)
        x0 = jnp.floor(xc).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, D - 1)
        x1i = jnp.minimum(x0 + 1, D - 1)
        ly = (yc - y0)[:, :, None]  # [M,S,1]
        lx = (xc - x0)[:, None, :]  # [M,1,S]

        def take(mm, yy, xx):
            # mm [D,D]; yy [S], xx [S] -> [S,S]
            return mm[yy][:, xx]

        v00 = jax.vmap(take)(m, y0, x0)
        v01 = jax.vmap(take)(m, y0, x1i)
        v10 = jax.vmap(take)(m, y1i, x0)
        v11 = jax.vmap(take)(m, y1i, x1i)
        val = (
            v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
            + v10 * ly * (1 - lx) + v11 * ly * lx
        )
        tgt = jnp.where(inside & (val >= thresh), 1.0, 0.0)
        tgt = jnp.where(valid[:, None, None], tgt, -1.0)
        cls_ids = jnp.where(valid, cls.astype(jnp.int32), 0)
        return tgt, cls_ids

    return jax.vmap(one)(mask_rois, matched_gt, gt_boxes, gt_masks_dense)
