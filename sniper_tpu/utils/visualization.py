"""Detection visualization (reference lib/data_utils/visualization.py).

cv2-based box rendering instead of matplotlib (headless-friendly).
"""

from __future__ import annotations

import numpy as np


def draw_detections(im_rgb, all_cls_dets, class_names=None, threshold=0.5):
    """im_rgb uint8 [H,W,3]; all_cls_dets: list over classes (index 0 =
    background, ignored) of [N,5] dets. Returns annotated copy."""
    import cv2

    out = np.ascontiguousarray(im_rgb).copy()
    rng = np.random.RandomState(7)
    colors = rng.randint(0, 255, (max(len(all_cls_dets), 2), 3))
    for j, dets in enumerate(all_cls_dets):
        if j == 0 or dets is None or len(dets) == 0:
            continue
        color = tuple(int(c) for c in colors[j])
        for d in dets:
            if d[4] < threshold:
                continue
            x1, y1, x2, y2 = (int(v) for v in d[:4])
            cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
            name = class_names[j] if class_names else str(j)
            cv2.putText(
                out, f"{name} {d[4]:.2f}", (x1, max(y1 - 4, 10)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA,
            )
    return out
