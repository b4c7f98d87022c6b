"""bbox_regression: roidb-level targets + empirical normalization.

Oracle: a direct transliteration of the reference per-class loops
(/root/reference/lib/bbox/bbox_regression.py:56-113), checked against
the vectorized implementation.
"""

import numpy as np

from sniper_tpu.config import default_config
from sniper_tpu.data.bbox_regression import (
    add_bbox_regression_targets,
    compute_bbox_regression_targets,
    expand_bbox_regression_targets,
)
from sniper_tpu.ops.boxes import bbox_overlaps, bbox_transform


def make_roidb(rng, n_images=3, n_gt=3, n_prop=10):
    roidb = []
    for _ in range(n_images):
        gts = np.zeros((n_gt, 4))
        gts[:, 0] = rng.uniform(0, 300, n_gt)
        gts[:, 1] = rng.uniform(0, 300, n_gt)
        gts[:, 2] = gts[:, 0] + rng.uniform(40, 120, n_gt)
        gts[:, 3] = gts[:, 1] + rng.uniform(40, 120, n_gt)
        # proposals jittered off the gts so some clear the 0.5 threshold
        props = gts[rng.randint(0, n_gt, n_prop)] + rng.uniform(
            -15, 15, (n_prop, 4)
        )
        boxes = np.vstack([gts, props]).astype(np.float32)
        ov = bbox_overlaps(boxes, gts)
        roidb.append({
            "boxes": boxes,
            "max_overlaps": np.concatenate(
                [np.ones(n_gt), ov[n_gt:].max(axis=1)]
            ),
            "max_classes": np.concatenate(
                [rng.randint(1, 4, n_gt), ov[n_gt:].argmax(axis=1) + 1]
            ),
        })
    return roidb


def oracle_stats(roidb, agnostic=True, num_classes=2):
    """Reference empirical mean/std accumulation (labeled oracle)."""
    counts = np.zeros((num_classes, 1)) + 1e-14
    sums = np.zeros((num_classes, 4))
    sq = np.zeros((num_classes, 4))
    for r in roidb:
        t = r["_raw_targets"]
        for cls in range(1, num_classes):
            idx = (
                np.where(t[:, 0] > 0)[0] if agnostic
                else np.where(t[:, 0] == cls)[0]
            )
            if idx.size:
                counts[cls] += idx.size
                sums[cls] += t[idx, 1:].sum(axis=0)
                sq[cls] += (t[idx, 1:] ** 2).sum(axis=0)
    means = sums / counts
    stds = np.sqrt(sq / counts - means**2)
    return means, stds


def test_targets_gt_rows_and_threshold(rng):
    gt = np.array([[10, 10, 100, 100], [200, 200, 300, 310]], np.float64)
    near = np.array([[12, 8, 103, 98]], np.float64)   # high IoU with gt0
    far = np.array([[400, 400, 420, 420]], np.float64)  # no overlap
    boxes = np.vstack([gt, near, far])
    ov = bbox_overlaps(boxes, gt)
    overlaps = np.concatenate([np.ones(2), ov[2:].max(axis=1)])
    labels = np.array([1, 2, 1, 0])
    t = compute_bbox_regression_targets(boxes, overlaps, labels, 0.5)
    # GT rows regress to themselves: zero deltas, own class
    np.testing.assert_allclose(t[0], [1, 0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(t[1], [2, 0, 0, 0, 0], atol=1e-6)
    # near roi regresses toward gt0
    expected = bbox_transform(near, gt[:1])[0]
    np.testing.assert_allclose(t[2, 1:], expected, atol=1e-6)
    assert t[2, 0] == 1
    # below-threshold roi: all-zero row
    np.testing.assert_allclose(t[3], 0)


def test_empirical_stats_match_oracle(rng):
    roidb = make_roidb(rng)
    cfg = default_config()
    cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED = False
    # stash raw targets for the oracle before in-place normalization
    for r in roidb:
        r["_raw_targets"] = compute_bbox_regression_targets(
            r["boxes"], r["max_overlaps"], r["max_classes"],
            cfg.TRAIN.BBOX_REGRESSION_THRESH,
        )
    means, stds = add_bbox_regression_targets(roidb, cfg)
    o_means, o_stds = oracle_stats(roidb)
    np.testing.assert_allclose(means, o_means.ravel(), atol=1e-9)
    np.testing.assert_allclose(stds, o_stds.ravel(), atol=1e-9)
    # normalized fg targets: (raw - mean)/std
    for r in roidb:
        fg = r["_raw_targets"][:, 0] > 0
        want = (r["_raw_targets"][fg, 1:] - means[4:8]) / stds[4:8]
        np.testing.assert_allclose(r["bbox_targets"][fg, 1:], want,
                                   atol=1e-5)


def test_precomputed_passthrough(rng):
    roidb = make_roidb(rng, n_images=1)
    cfg = default_config()
    cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED = True
    means, stds = add_bbox_regression_targets(roidb, cfg)
    np.testing.assert_allclose(means, np.tile(cfg.TRAIN.BBOX_MEANS, 2))
    np.testing.assert_allclose(stds, np.tile(cfg.TRAIN.BBOX_STDS, 2))


def test_expand_targets():
    data = np.array([[0, 9, 9, 9, 9], [2, 1, 2, 3, 4]], np.float32)
    t, w = expand_bbox_regression_targets(data)
    assert t.shape == (2, 8) and w.shape == (2, 8)
    np.testing.assert_allclose(t[0], 0)
    np.testing.assert_allclose(t[1, 4:8], [1, 2, 3, 4])
    np.testing.assert_allclose(w[1, 4:8], 1.0)
    np.testing.assert_allclose(w[0], 0)
