"""Geometry core tests: loop-based oracles + numpy/jax backend parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from sniper_tpu.ops import boxes as B
from tests.conftest import random_boxes


def iou_oracle(boxes, query):
    """Straight loop transliteration of the classic IoU definition."""
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k))
    for j in range(k):
        qa = (query[j, 2] - query[j, 0] + 1) * (query[j, 3] - query[j, 1] + 1)
        for i in range(n):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
            if iw > 0 and ih > 0:
                ba = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
                out[i, j] = iw * ih / float(ba + qa - iw * ih)
    return out


def ignore_oracle(boxes, query):
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k))
    for j in range(k):
        qa = (query[j, 2] - query[j, 0] + 1) * (query[j, 3] - query[j, 1] + 1)
        for i in range(n):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
            if iw > 0 and ih > 0:
                out[i, j] = iw * ih / float(qa)
    return out


def test_bbox_overlaps_matches_oracle(rng):
    b = random_boxes(rng, 40)[:, :4].astype(np.float64)
    q = random_boxes(rng, 23)[:, :4].astype(np.float64)
    np.testing.assert_allclose(B.bbox_overlaps(b, q), iou_oracle(b, q), rtol=1e-12)


def test_ignore_overlaps_matches_oracle(rng):
    b = random_boxes(rng, 31)[:, :4].astype(np.float64)
    q = random_boxes(rng, 17)[:, :4].astype(np.float64)
    np.testing.assert_allclose(B.ignore_overlaps(b, q), ignore_oracle(b, q), rtol=1e-12)


def test_ignore_overlap_full_containment():
    big = np.array([[0.0, 0.0, 99.0, 99.0]])
    small = np.array([[10.0, 10.0, 20.0, 20.0]])
    assert B.ignore_overlaps(big, small)[0, 0] == pytest.approx(1.0)


def test_backend_parity_overlaps(rng):
    b = random_boxes(rng, 16)[:, :4]
    q = random_boxes(rng, 8)[:, :4]
    np_res = B.bbox_overlaps(b.astype(np.float64), q.astype(np.float64))
    jx_res = B.bbox_overlaps(jnp.asarray(b), jnp.asarray(q))
    assert isinstance(np_res, np.ndarray)
    np.testing.assert_allclose(np.asarray(jx_res), np_res, rtol=1e-5)


def test_transform_pred_roundtrip(rng):
    ex = random_boxes(rng, 50)[:, :4].astype(np.float64)
    gt = random_boxes(rng, 50)[:, :4].astype(np.float64)
    deltas = B.bbox_transform(ex, gt)
    rec = B.bbox_pred(ex, deltas)
    # 1e-7 eps in encode makes the roundtrip approximate
    np.testing.assert_allclose(rec, gt, rtol=1e-5, atol=1e-3)


def test_transform_pred_roundtrip_jax(rng):
    ex = jnp.asarray(random_boxes(rng, 20)[:, :4])
    gt = jnp.asarray(random_boxes(rng, 20)[:, :4])
    rec = B.bbox_pred(ex, B.bbox_transform(ex, gt))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), rtol=1e-3, atol=0.5)


def test_bbox_pred_multiclass_layout(rng):
    """[N, 4k] deltas decode per class like the reference column slicing."""
    bx = random_boxes(rng, 10)[:, :4].astype(np.float64)
    d = rng.uniform(-0.2, 0.2, (10, 8))
    full = B.bbox_pred(bx, d)
    for c in range(2):
        single = B.bbox_pred(bx, d[:, 4 * c : 4 * c + 4])
        np.testing.assert_allclose(full[:, 4 * c : 4 * c + 4], single, rtol=1e-12)


def test_clip_boxes(rng):
    bx = (random_boxes(rng, 30)[:, :4] * 3 - 200).astype(np.float64)
    clipped = B.clip_boxes(bx, (512, 640))
    assert clipped[:, 0::2].min() >= 0 and clipped[:, 0::2].max() <= 639
    assert clipped[:, 1::2].min() >= 0 and clipped[:, 1::2].max() <= 511
    inside = B.clip_boxes(np.array([[5.0, 6.0, 10.0, 11.0]]), (512, 640))
    np.testing.assert_array_equal(inside, [[5, 6, 10, 11]])


def test_filter_boxes_mask():
    bx = np.array([[0, 0, 3, 3], [0, 0, 10, 2], [0, 0, 10, 10.0]])
    mask = B.filter_boxes_mask(bx, 5)
    np.testing.assert_array_equal(mask, [False, False, True])
