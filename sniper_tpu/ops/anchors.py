"""Anchor generation: ratio/scale enumeration + dense grid shifting.

Matches the classic py-faster-rcnn enumeration used by the reference
(/root/reference/lib/data_utils/generate_anchor.py:8-77): a base
``base_size`` square at the origin is warped to each aspect ratio with
*rounded* widths/heights (the rounding matters for checkpoint parity),
then scaled; anchors are xyxy in the legacy +1 convention.

Vectorized end-to-end (no per-anchor Python loops); results are NumPy
(anchors are static per config and get baked into jitted functions as
constants).
"""

from __future__ import annotations

import numpy as np


def _mkanchors(ws, hs, x_ctr, y_ctr):
    """Build xyxy anchors around a center from widths/heights [K]."""
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        [
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        ]
    )


def generate_anchors(base_size=16, ratios=(0.5, 1, 2), scales=(8, 16, 32)):
    """[len(ratios)*len(scales), 4] anchors centered on the base cell.

    Ordering is ratio-major (all scales for ratio 0, then ratio 1, ...),
    matching the reference's ``scales`` loop inside ``_ratio_enum`` output.
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    base = np.array([1, 1, base_size, base_size], dtype=np.float64) - 1
    w = base[2] - base[0] + 1
    h = base[3] - base[1] + 1
    x_ctr = base[0] + 0.5 * (w - 1)
    y_ctr = base[1] + 0.5 * (h - 1)

    size = w * h
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))  # [R]
    hs = np.round(ws * ratios)  # [R]

    # scale enumeration per ratio anchor
    ws_s = (ws[:, None] * scales[None, :]).reshape(-1)  # [R*S]
    hs_s = (hs[:, None] * scales[None, :]).reshape(-1)
    return _mkanchors(ws_s, hs_s, x_ctr, y_ctr)


def shift_anchors(base_anchors, feat_height, feat_width, feat_stride):
    """Dense grid of anchors.

    Returns [feat_height * feat_width * A, 4], ordered position-major with
    A anchors contiguous per position (matches the reference anchor worker
    layout, /root/reference/lib/data_utils/data_workers.py:145-158:
    ``all_anchors = anchors.reshape(K*A, 4)`` after [K,A,4] broadcast).
    """
    a = np.asarray(base_anchors, dtype=np.float64)
    shift_x = np.arange(feat_width) * feat_stride
    shift_y = np.arange(feat_height) * feat_stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    all_anchors = a[None, :, :] + shifts[:, None, :]  # [K, A, 4]
    return all_anchors.reshape(-1, 4)
