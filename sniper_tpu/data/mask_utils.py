"""Mask utilities: polygon crop/encode (reference parity) + dense
rasterization for the TPU mask-target path.

crop_polys / poly_encoder mirror the reference host utilities
(/root/reference/lib/data_utils/mask_utils.py:8-46): polygons shifted
into chip coords, scaled, and packed into a fixed [max_n_gts,
max_poly_len] float encoding (cat, n_segs, seg lens, coords; -1 pad).

rasterize_gt_masks is the TPU-first replacement for the fork's in-graph
MaskRcnnTarget polygon rasterizer (SURVEY.md §2.9): each GT's polygons
are rasterized ONCE on the host into a fixed box-normalized grid
(default 112^2 = 4x the 28^2 target resolution); the device side then
crop-resizes these dense masks per sampled roi (ops/mask_target.py) —
pure gathers, no polygon math in-graph.
"""

from __future__ import annotations

import numpy as np


def crop_polys(polys, crop, im_scale):
    """Shift polygons into chip coords and scale (reference :8-19)."""
    out = []
    for poly in polys:
        segs = []
        for seg in poly:
            s = np.array(seg, dtype=np.float32).copy()
            s[0::2] -= crop[0]
            s[1::2] -= crop[1]
            s *= im_scale
            segs.append(s)
        out.append(segs)
    return out


def poly_encoder(polys, cats, max_poly_len=500, max_n_gts=100):
    """Fixed-size ragged-polygon encoding (reference :22-46)."""
    enc = -np.ones((max_n_gts, max_poly_len), dtype=np.float32)
    for i, (poly, cat) in enumerate(zip(polys, cats)):
        if i >= max_n_gts:
            break
        head = [float(cat)]
        cum = 2 + len(poly)
        lens = []
        kept = 0
        for seg in poly:
            if cum + len(seg) > max_poly_len:
                break
            kept += 1
            cum += len(seg)
            lens.append(float(len(seg)))
        row = head + [float(kept)] + lens
        for j in range(kept):
            row += [float(v) for v in poly[j]]
        enc[i, : len(row)] = row
    return enc


def poly_decoder(enc_row):
    """Inverse of poly_encoder for one row -> (cat, [segs])."""
    if enc_row[0] < 0:
        return None, []
    cat = float(enc_row[0])
    n = int(enc_row[1])
    lens = [int(v) for v in enc_row[2 : 2 + n]]
    segs = []
    off = 2 + n
    for ln in lens:
        segs.append(np.array(enc_row[off : off + ln], np.float32))
        off += ln
    return cat, segs


def rasterize_gt_masks(polys_per_gt, gt_boxes, grid=112, max_n_gts=100):
    """Rasterize each GT's polygons into a box-normalized [grid, grid]
    binary mask. polys_per_gt: list (per GT) of segment arrays in the
    same coordinate frame as gt_boxes [N,4]. Returns
    [max_n_gts, grid, grid] uint8 in {0, 1} (zeros for missing GTs) —
    uint8 keeps the host->device mask payload 4x smaller; the detector
    casts to float at the crop-resize (ops/mask_target.py).
    """
    import cv2

    out = np.zeros((max_n_gts, grid, grid), np.uint8)
    for i, (segs, box) in enumerate(zip(polys_per_gt, gt_boxes)):
        if i >= max_n_gts or not segs:
            continue
        x1, y1, x2, y2 = box[:4]
        w = max(x2 - x1, 1e-3)
        h = max(y2 - y1, 1e-3)
        canvas = np.zeros((grid, grid), np.uint8)
        pts = []
        for seg in segs:
            p = np.asarray(seg, np.float64).reshape(-1, 2).copy()
            p[:, 0] = (p[:, 0] - x1) / w * grid
            p[:, 1] = (p[:, 1] - y1) / h * grid
            pts.append(np.round(p).astype(np.int32))
        cv2.fillPoly(canvas, pts, 1)
        out[i] = canvas
    return out
