"""Anchor-target assigner vs a literal transliteration of the reference
anchor_worker (data_workers.py:132-371), sharing the RNG stream."""

import numpy as np
import pytest

from sniper_tpu.data.anchor_targets import (
    AnchorTargetAssigner,
    AutoFocusParams,
)
from sniper_tpu.ops.anchors import generate_anchors, shift_anchors
from sniper_tpu.ops.boxes import bbox_overlaps, bbox_transform, clip_boxes


def oracle_worker(asn, cur_crop, im_scale, nids, gtids, boxes, classes, rng):
    """Literal port of the reference worker's logic (sparse outputs)."""
    im_info = (asn.chip_size, asn.chip_size)
    anchors_all = asn.all_anchors.copy()
    inds_inside = np.where(
        (anchors_all[:, 0] >= -32)
        & (anchors_all[:, 1] >= -32)
        & (anchors_all[:, 2] < im_info[0] + 32)
        & (anchors_all[:, 3] < im_info[1] + 32)
    )[0]
    anchors = anchors_all[inds_inside]
    labels = np.full(len(inds_inside), -1.0)
    total = anchors_all.shape[0]

    gt_boxes = boxes[gtids].astype(float).copy()
    for c in (0, 2):
        gt_boxes[:, c] -= cur_crop[0]
    for c in (1, 3):
        gt_boxes[:, c] -= cur_crop[1]
    vgt_boxes = boxes[np.intersect1d(gtids, nids)].astype(float).copy()
    for c in (0, 2):
        vgt_boxes[:, c] -= cur_crop[0]
    for c in (1, 3):
        vgt_boxes[:, c] -= cur_crop[1]

    gt_boxes = clip_boxes(np.round(gt_boxes * im_scale), im_info)
    vgt_boxes = clip_boxes(np.round(vgt_boxes * im_scale), im_info)

    def filt(b):
        ws = b[:, 2] - b[:, 0] + 1
        hs = b[:, 3] - b[:, 1] + 1
        return np.where((ws >= 10) & (hs >= 10))[0]

    ids = filt(gt_boxes)
    cls = np.asarray(classes, float).reshape(-1)
    if len(ids) > 0:
        gt_boxes = gt_boxes[ids]
        cls = cls[ids]
    else:
        gt_boxes = np.zeros((0, 4))
        cls = np.zeros((0,))
    agt_boxes = gt_boxes.copy()
    ids = filt(vgt_boxes)
    vgt_boxes = vgt_boxes[ids] if len(ids) > 0 else np.zeros((0, 4))

    if len(vgt_boxes) > 0 and len(gt_boxes) > 0:
        mov = bbox_overlaps(gt_boxes, vgt_boxes).max(axis=1)
    else:
        mov = np.zeros(len(gt_boxes))
    invalid_boxes = gt_boxes[mov < 1]
    gt_boxes = gt_boxes[mov == 1]

    argmax_overlaps = np.zeros(len(inds_inside), dtype=int)
    if gt_boxes.size > 0:
        overlaps = bbox_overlaps(anchors, gt_boxes)
        argmax_overlaps = overlaps.argmax(axis=1)
        max_overlaps = overlaps[np.arange(len(inds_inside)), argmax_overlaps]
        gt_argmax = np.where(overlaps == overlaps.max(axis=0))[0]
        labels[max_overlaps < asn.neg_thresh] = 0
        labels[gt_argmax] = 1
        labels[max_overlaps >= asn.pos_thresh] = 1
        if len(invalid_boxes) > 0:
            movn = bbox_overlaps(anchors, invalid_boxes).max(axis=1)
            labels[movn > 0.3] = -1
    else:
        labels[:] = 0
        if len(invalid_boxes) > 0:
            movn = bbox_overlaps(anchors, invalid_boxes).max(axis=1)
            labels[movn > 0.3] = -1

    fg = np.where(labels == 1)[0]
    if len(fg) > asn.num_fg:
        labels[rng.choice(fg, len(fg) - asn.num_fg, replace=False)] = -1
    num_bg = asn.rpn_batch_size - np.sum(labels == 1)
    bg = np.where(labels == 0)[0]
    if len(bg) > num_bg:
        labels[rng.choice(bg, int(len(bg) - num_bg), replace=False)] = -1

    bbox_targets = np.zeros((len(inds_inside), 4))
    if gt_boxes.size > 0:
        bbox_targets[:] = bbox_transform(anchors, gt_boxes[argmax_overlaps])
    bbox_weights = np.zeros((len(inds_inside), 4))
    bbox_weights[labels == 1] = 1.0

    def unmap(d, fill):
        out = np.full((total,) + d.shape[1:], fill, dtype=np.float32)
        out[inds_inside] = d
        return out

    fh, fw, A = asn.feat_h, asn.feat_w, asn.num_anchors
    labels = unmap(labels, -1).reshape(fh, fw, A).transpose(2, 0, 1).reshape(-1)
    t = unmap(bbox_targets, 0).reshape(fh, fw, A * 4).transpose(2, 0, 1)
    w = unmap(bbox_weights, 0).reshape(fh, fw, A * 4).transpose(2, 0, 1)
    fgt = np.full((100, 5), -1.0, dtype=np.float32)
    n = min(len(agt_boxes), 100)
    if n:
        fgt[:n, :4] = agt_boxes[:n]
        fgt[:n, 4] = cls[:n]
    return labels, t, w, fgt


def make_assigner(**kw):
    return AnchorTargetAssigner(
        chip_size=512,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24),
        anchor_ratios=(0.5, 1, 2),
        rpn_batch_size=256,
        fg_fraction=0.5,
        pos_thresh=0.5,
        neg_thresh=0.4,
        **kw,
    )


def make_chip_case(rng, n_gt=8, n_valid=5):
    """A chip at origin-ish with some GTs in and out of range."""
    x1 = rng.uniform(0, 900, n_gt)
    y1 = rng.uniform(0, 900, n_gt)
    s = rng.uniform(12, 300, n_gt)
    boxes = np.stack([x1, y1, x1 + s, y1 + s], 1).astype(np.float32)
    gtids = np.arange(n_gt)
    nids = rng.choice(n_gt, n_valid, replace=False)
    classes = rng.randint(1, 81, n_gt)
    cur_crop = np.array([100.0, 50.0, 611.0, 561.0])
    return cur_crop, 1.0, nids, gtids, boxes, classes


def test_matches_oracle(rng):
    asn = make_assigner()
    for trial in range(8):
        case = make_chip_case(rng, n_gt=3 + trial * 2, n_valid=2 + trial)
        r1 = np.random.RandomState(42 + trial)
        r2 = np.random.RandomState(42 + trial)
        got = asn(*case, rng=r1)
        labels, t, w, fgt = oracle_worker(asn, *case, rng=r2)
        np.testing.assert_array_equal(got.labels, labels)
        np.testing.assert_allclose(got.bbox_targets, t, atol=1e-6)
        np.testing.assert_array_equal(got.bbox_weights, w)
        np.testing.assert_allclose(got.gt_boxes, fgt, atol=1e-6)


def test_sparse_matches_dense(rng):
    """sparse=True emits (pid, value) pairs that densify to exactly the
    dense outputs (same per-chip rng stream -> same sampling)."""
    dense = make_assigner()
    sparse = make_assigner(sparse=True)
    fh, fw, A = dense.feat_h, dense.feat_w, dense.num_anchors
    for trial in range(6):
        case = make_chip_case(rng, n_gt=3 + trial * 2, n_valid=2 + trial)
        d = dense(*case, rng=np.random.RandomState(7 + trial))
        s = sparse(*case, rng=np.random.RandomState(7 + trial))
        assert s.labels is None and s.bbox_targets is None
        # labels
        lab = np.full(A * fh * fw, -1.0, np.float32)
        keep = s.rpn_pids >= 0
        lab[s.rpn_pids[keep]] = s.rpn_label_vals[keep]
        np.testing.assert_array_equal(lab, d.labels)
        # bbox targets at fg anchors only (dense targets elsewhere are
        # never read: weights are zero there)
        kf = s.fg_pids >= 0
        t = np.zeros((A * fh * fw, 4), np.float32)
        w = np.zeros((A * fh * fw, 4), np.float32)
        t[s.fg_pids[kf]] = s.fg_targets[kf]
        w[s.fg_pids[kf]] = 1.0
        # dense layout [4A, fh, fw] -> (A,H,W)-flat rows of 4
        dt = d.bbox_targets.reshape(A, 4, fh, fw).transpose(0, 2, 3, 1)
        dt = dt.reshape(-1, 4)
        dw = d.bbox_weights.reshape(A, 4, fh, fw).transpose(0, 2, 3, 1)
        dw = dw.reshape(-1, 4)
        np.testing.assert_array_equal(w, dw)
        np.testing.assert_allclose(t[w > 0], dt[dw > 0], atol=1e-6)
        np.testing.assert_allclose(s.gt_boxes, d.gt_boxes, atol=1e-6)


def test_scaled_chip(rng):
    asn = make_assigner()
    case = list(make_chip_case(rng))
    case[1] = 2.7  # finest-scale chip: upscaled crop
    case[0] = np.array([10.0, 20.0, 10 + 512 / 2.7, 20 + 512 / 2.7])
    got = asn(*case, rng=np.random.RandomState(0))
    labels, t, w, fgt = oracle_worker(asn, *case, rng=np.random.RandomState(0))
    np.testing.assert_array_equal(got.labels, labels)
    np.testing.assert_allclose(got.bbox_targets, t, atol=1e-6)


def test_no_gts():
    asn = make_assigner()
    boxes = np.zeros((0, 4), np.float32)
    got = asn(
        np.array([0.0, 0, 511, 511]), 1.0,
        np.array([], int), np.array([], int), boxes, np.array([]),
        rng=np.random.RandomState(0),
    )
    assert (got.gt_boxes == -1).all()
    assert (got.bbox_weights == 0).all()
    # all-bg chip: exactly RPN_BATCH_SIZE bg labels survive (rest -1)
    assert np.sum(got.labels == 0) == asn.rpn_batch_size
    assert np.sum(got.labels == 1) == 0


def test_sampling_budget(rng):
    asn = make_assigner()
    case = make_chip_case(rng, n_gt=20, n_valid=20)
    got = asn(*case, rng=np.random.RandomState(0))
    n_fg = np.sum(got.labels == 1)
    n_bg = np.sum(got.labels == 0)
    assert n_fg <= asn.num_fg
    assert n_fg + n_bg <= asn.rpn_batch_size
    # weights exactly at fg anchors
    assert np.sum(got.bbox_weights == 1) == n_fg * 4


def test_invalid_gt_poisoning(rng):
    """Anchors overlapping out-of-range GTs get ignored, not fg/bg."""
    asn = make_assigner()
    # one big in-chip GT that is NOT in nids -> invalid
    boxes = np.array([[50, 50, 350, 350]], np.float32)
    got = asn(
        np.array([0.0, 0, 511, 511]), 1.0,
        np.array([], int), np.array([0]), boxes, np.array([5]),
        rng=np.random.RandomState(0),
    )
    assert np.sum(got.labels == 1) == 0
    # the GT region anchors must be -1 (ignored)
    A, fh, fw = asn.num_anchors, asn.feat_h, asn.feat_w
    lab = got.labels.reshape(A, fh, fw)
    center = lab[:, 12, 12]  # stride16 pos ~ (192,192), inside the GT
    assert (center == -1).all()


def test_focus_map_painting():
    af = AutoFocusParams(small_thresh=64, dc_low=5, dc_high=90)
    asn = AnchorTargetAssigner(chip_size=512, autofocus=af)
    # small GT (area sqrt(40*40)=40 in (5,64)) -> 1; medium 80 -> -1; big 200 -> 0
    boxes = np.array(
        [[0, 0, 40, 40], [160, 160, 240, 240], [300, 100, 500, 300]], np.float32
    )
    got = asn(
        np.array([0.0, 0, 511, 511]), 1.0,
        np.arange(3), np.arange(3), boxes, np.array([1, 2, 3]),
        rng=np.random.RandomState(0),
    )
    fm = got.focus_label.reshape(32, 32)
    assert fm[1, 1] == 1.0  # small box area
    assert fm[12, 12] == -1.0  # medium box = don't care
    assert fm[15, 25] == 0.0  # large box = background for focus
    assert fm[31, 31] == 0.0
