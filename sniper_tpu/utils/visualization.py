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


def save_training_chip(sample, pixel_means, path):
    """Render one ChipLoader training sample: the chip with its gt boxes
    (reference MNIteratorE2E.visualize, MNIteratorE2E.py:222-243 —
    matplotlib there, cv2 here; enabled via TRAIN.VISUALIZE).

    ``sample``: a ChipLoader._build_sample dict — uint8 RGB data (the
    default path) is drawn as-is; fp32 data gets the pixel means added
    back. gt_boxes rows are [x1, y1, x2, y2, class] with -1 padding.
    """
    import os

    import cv2

    data = np.asarray(sample["data"])
    if data.dtype == np.uint8:
        im = data.copy()
    else:
        # fp32 chips are RGB with the BGR-ordered cfg PIXEL_MEANS
        # subtracted reversed (loader._build_sample); undo with the
        # same per-channel reversal or R/B get each other's mean
        im = np.clip(
            data + np.asarray(pixel_means, np.float32)[::-1], 0, 255
        ).astype(np.uint8)
    boxes = np.asarray(sample["gt_boxes"])
    valid = boxes[:, 4] >= 0
    for x1, y1, x2, y2, c in boxes[valid]:
        cv2.rectangle(im, (int(x1), int(y1)), (int(x2), int(y2)),
                      (0, 255, 0), 2)
        cv2.putText(im, str(int(c)), (int(x1), max(int(y1) - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
                    cv2.LINE_AA)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
    return path
