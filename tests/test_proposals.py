"""Fused proposal op tests: decode/NMS parity with a NumPy oracle and
target-sampling semantics (SNIPER valid-range ignore labels)."""

import jax
import jax.numpy as jnp
import numpy as np

from sniper_tpu.ops.boxes import bbox_pred, bbox_transform, clip_boxes
from sniper_tpu.ops.nms import nms_np
from sniper_tpu.ops.proposals import (
    make_anchors_ahw,
    multi_proposal,
    multi_proposal_target,
)

FH = FW = 16  # small grid for tests
STRIDE = 16
RATIOS = (0.5, 1, 2)
SCALES = (2, 4, 7)
A = len(RATIOS) * len(SCALES)
ANCHORS = make_anchors_ahw(FH, FW, STRIDE, RATIOS, SCALES)


def random_rpn_outputs(rng, b=2):
    fg = rng.rand(b, A, FH, FW).astype(np.float32)
    deltas = (rng.randn(b, 4 * A, FH, FW) * 0.1).astype(np.float32)
    im_info = np.tile(
        np.array([[FH * STRIDE, FW * STRIDE, 1.0]], np.float32), (b, 1)
    )
    return fg, deltas, im_info


def proposal_oracle_np(fg, deltas, im_info, pre_nms, post_nms, thresh, min_size):
    """Host-side mirror of the proposal path for one image."""
    scores = fg.reshape(-1).astype(np.float64)
    d = deltas.reshape(A, 4, FH, FW).transpose(0, 2, 3, 1).reshape(-1, 4)
    props = bbox_pred(ANCHORS.astype(np.float64), d.astype(np.float64))
    props = clip_boxes(props, (im_info[0], im_info[1]))
    ws = props[:, 2] - props[:, 0] + 1
    hs = props[:, 3] - props[:, 1] + 1
    ok = (ws >= min_size * im_info[2]) & (hs >= min_size * im_info[2])
    scores = np.where(ok, scores, -1e10)
    order = np.argsort(-scores, kind="stable")[:pre_nms]
    dets = np.concatenate([props[order], scores[order, None]], axis=1)
    keep = nms_np(dets, thresh)[:post_nms]
    return dets[keep, :4], dets[keep, 4]


def test_multi_proposal_matches_oracle(rng):
    fg, deltas, im_info = random_rpn_outputs(rng, b=2)
    rois, scores, valid = multi_proposal(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(im_info),
        jnp.asarray(ANCHORS), pre_nms=800, post_nms=50, thresh=0.7, min_size=4.0,
    )
    rois, scores, valid = map(np.asarray, (rois, scores, valid))
    for b in range(2):
        oracle_boxes, oracle_scores = proposal_oracle_np(
            fg[b], deltas[b], im_info[b], 800, 50, 0.7, 4.0
        )
        n = valid[b].sum()
        assert n == min(50, len(oracle_scores))
        np.testing.assert_allclose(rois[b, :n, 1:], oracle_boxes[:n], atol=2e-2)
        np.testing.assert_allclose(scores[b, :n], oracle_scores[:n], atol=1e-5)
        # batch index column
        assert (rois[b, :, 0] == b).all()


def test_multi_proposal_static_shapes(rng):
    fg, deltas, im_info = random_rpn_outputs(rng, b=3)
    rois, scores, valid = multi_proposal(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(im_info),
        jnp.asarray(ANCHORS), pre_nms=6000, post_nms=300, thresh=0.7,
    )
    assert rois.shape == (3, 300, 5)
    assert scores.shape == (3, 300)


def _gt_tensor(boxes_cls, g=20):
    out = np.full((g, 5), -1.0, np.float32)
    for i, row in enumerate(boxes_cls):
        out[i] = row
    return out


def encode_gt_as_rpn(gt_boxes, noise=0.0, rng=None):
    """RPN output whose top proposals decode near the given GT boxes."""
    fg = np.zeros((A * FH * FW,), np.float32)
    deltas = np.zeros((A * FH * FW, 4), np.float32)
    for b in gt_boxes:
        # find best anchor by IoU
        from sniper_tpu.ops.boxes import bbox_overlaps

        ious = bbox_overlaps(ANCHORS.astype(np.float64), np.array([b[:4]]))
        a = int(ious[:, 0].argmax())
        fg[a] = 0.9
        deltas[a] = bbox_transform(ANCHORS[a : a + 1], np.array([b[:4]]))[0]
        if noise and rng is not None:
            deltas[a] += rng.randn(4).astype(np.float32) * noise
    fg = fg.reshape(A, FH, FW)
    d = deltas.reshape(A, FH, FW, 4).transpose(0, 3, 1, 2).reshape(4 * A, FH, FW)
    return fg, d


def test_multi_proposal_target_labels(rng):
    # two in-range GTs + one out-of-range (too big for the chip's range)
    gts = [
        [40, 40, 90, 90, 7],      # sqrt area ~50 -> in range
        [120, 130, 180, 190, 3],  # ~60 -> in range
        [10, 10, 240, 240, 5],    # ~230 -> out of range
    ]
    fg, deltas = encode_gt_as_rpn(np.array(gts, np.float32))
    im_info = np.array([[FH * STRIDE, FW * STRIDE, 1.0]], np.float32)
    gt_t = _gt_tensor(gts)[None]
    vr = np.array([[0.0, 100.0]], np.float32)

    out = multi_proposal_target(
        jnp.asarray(fg)[None], jnp.asarray(deltas)[None], jnp.asarray(im_info),
        jnp.asarray(gt_t), jnp.asarray(vr), jnp.asarray(ANCHORS),
        jax.random.PRNGKey(0), post_nms=100, num_rois=64,
    )
    rois = np.asarray(out.rois)
    labels = np.asarray(out.labels)
    assert rois.shape == (1, 64, 5) and labels.shape == (1, 64)
    # the two in-range classes appear as fg labels; out-of-range class 5 never
    assert 7 in labels[0] and 3 in labels[0]
    assert 5 not in labels[0]
    # fg rois come first and carry nonzero weights
    w = np.asarray(out.bbox_weights)[0]
    fg_mask = labels[0] > 0
    assert (w[fg_mask] == 1).all()
    assert (w[~fg_mask] == 0).all()


def test_multi_proposal_target_targets_decode_back(rng):
    gts = [[40, 40, 90, 90, 7]]
    fg, deltas = encode_gt_as_rpn(np.array(gts, np.float32))
    im_info = np.array([[FH * STRIDE, FW * STRIDE, 1.0]], np.float32)
    out = multi_proposal_target(
        jnp.asarray(fg)[None], jnp.asarray(deltas)[None], jnp.asarray(im_info),
        jnp.asarray(_gt_tensor(gts))[None], jnp.asarray([[0.0, 512.0]]),
        jnp.asarray(ANCHORS), jax.random.PRNGKey(1), num_rois=32,
    )
    labels = np.asarray(out.labels)[0]
    rois = np.asarray(out.rois)[0, :, 1:]
    tgts = np.asarray(out.bbox_targets)[0]
    stds = np.array([0.1, 0.1, 0.2, 0.2])
    for i in np.where(labels == 7)[0]:
        rec = bbox_pred(rois[i], tgts[i] * stds)
        np.testing.assert_allclose(rec, [40, 40, 90, 90], atol=1.5)


def test_multi_proposal_target_bg_sampling(rng):
    """No GTs at all -> all labels bg or ignore, never fg."""
    fg, deltas, im_info = random_rpn_outputs(rng, b=1)
    gt_t = np.full((1, 20, 5), -1.0, np.float32)
    out = multi_proposal_target(
        jnp.asarray(fg), jnp.asarray(deltas), jnp.asarray(im_info),
        jnp.asarray(gt_t), jnp.asarray([[0.0, 512.0]]), jnp.asarray(ANCHORS),
        jax.random.PRNGKey(2), num_rois=32,
    )
    labels = np.asarray(out.labels)[0]
    assert (labels <= 0).all()
    assert np.asarray(out.bbox_weights).sum() == 0


def test_multi_proposal_target_fg_fraction_cap(rng):
    # many GTs: fg count capped at 25% of rois
    gts = []
    r = np.random.RandomState(3)
    for _ in range(12):
        x, y = r.uniform(0, 180, 2)
        s = r.uniform(30, 60)
        gts.append([x, y, x + s, y + s, int(r.randint(1, 10))])
    fg, deltas = encode_gt_as_rpn(np.array(gts, np.float32))
    im_info = np.array([[FH * STRIDE, FW * STRIDE, 1.0]], np.float32)
    out = multi_proposal_target(
        jnp.asarray(fg)[None], jnp.asarray(deltas)[None], jnp.asarray(im_info),
        jnp.asarray(_gt_tensor(gts))[None], jnp.asarray([[0.0, 512.0]]),
        jnp.asarray(ANCHORS), jax.random.PRNGKey(4), num_rois=16,
    )
    labels = np.asarray(out.labels)[0]
    assert (labels > 0).sum() <= round(16 * 0.25)


def test_anchors_on_device_parity():
    from sniper_tpu.ops.proposals import anchors_ahw_on_device

    dev = np.asarray(anchors_ahw_on_device(FH, FW, STRIDE, RATIOS, SCALES))
    np.testing.assert_allclose(dev, ANCHORS, atol=1e-4)
