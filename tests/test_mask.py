"""Mask branch: dense rasterization, device mask targets, head, loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sniper_tpu.data.mask_utils import (
    crop_polys,
    poly_decoder,
    poly_encoder,
    rasterize_gt_masks,
)
from sniper_tpu.models.losses import mask_loss
from sniper_tpu.ops.mask_target import mask_targets_from_dense


def square_poly(x1, y1, x2, y2):
    return [np.array([x1, y1, x2, y1, x2, y2, x1, y2], np.float32)]


def test_poly_encode_decode_roundtrip():
    polys = [square_poly(10, 10, 50, 50), square_poly(0, 0, 9, 9)]
    enc = poly_encoder(polys, cats=[3, 7])
    assert enc.shape == (100, 500)
    cat, segs = poly_decoder(enc[0])
    assert cat == 3 and len(segs) == 1
    np.testing.assert_allclose(segs[0], polys[0][0])
    assert enc[2][0] == -1  # padding


def test_crop_polys_shift_scale():
    polys = [square_poly(100, 100, 200, 200)]
    out = crop_polys(polys, crop=(50, 60, 0, 0), im_scale=2.0)
    np.testing.assert_allclose(out[0][0][:4], [100, 80, 300, 80])


def test_rasterize_square():
    polys = [square_poly(0, 0, 100, 100)]
    boxes = np.array([[0, 0, 100, 100]], np.float64)
    dense = rasterize_gt_masks(polys, boxes, grid=56)
    assert dense.shape == (100, 56, 56)
    assert dense[0].mean() > 0.9  # the square fills its own box
    assert dense[1].sum() == 0


def test_rasterize_half_box():
    # polygon covers only the left half of its gt box
    polys = [square_poly(0, 0, 50, 100)]
    boxes = np.array([[0, 0, 100, 100]], np.float64)
    dense = rasterize_gt_masks(polys, boxes, grid=56)
    left = dense[0][:, :24].mean()
    right = dense[0][:, 32:].mean()
    assert left > 0.9 and right < 0.1


def test_mask_targets_from_dense_roi_crop():
    # gt mask = left half of the gt box [20,20,120,120]
    dense = np.zeros((1, 4, 112, 112), np.float32)
    dense[0, 0, :, :56] = 1.0
    gt_boxes = np.full((1, 4, 5), -1.0, np.float32)
    gt_boxes[0, 0] = [20, 20, 120, 120, 5]
    # roi exactly the gt box
    rois = np.array([[[0, 20, 20, 120, 120]]], np.float32)
    gids = np.array([[0]], np.int32)
    tgt, cls = mask_targets_from_dense(
        jnp.asarray(rois), jnp.asarray(gids), jnp.asarray(gt_boxes),
        jnp.asarray(dense), mask_size=28,
    )
    tgt = np.asarray(tgt)[0, 0]
    assert np.asarray(cls)[0, 0] == 5
    assert tgt[:, :12].mean() > 0.9
    assert tgt[:, 16:].mean() < 0.1


def test_mask_targets_roi_offset():
    # roi covering only the right half of the gt box -> all background
    dense = np.zeros((1, 4, 112, 112), np.float32)
    dense[0, 0, :, :56] = 1.0
    gt_boxes = np.full((1, 4, 5), -1.0, np.float32)
    gt_boxes[0, 0] = [0, 0, 100, 100, 2]
    rois = np.array([[[0, 50, 0, 100, 100]]], np.float32)
    gids = np.array([[0]], np.int32)
    tgt, _ = mask_targets_from_dense(
        jnp.asarray(rois), jnp.asarray(gids), jnp.asarray(gt_boxes),
        jnp.asarray(dense), mask_size=28,
    )
    assert np.asarray(tgt)[0, 0].mean() < 0.05


def test_mask_targets_invalid_roi_ignored():
    dense = np.zeros((1, 2, 112, 112), np.float32)
    gt_boxes = np.full((1, 2, 5), -1.0, np.float32)
    rois = np.array([[[0, 0, 0, 50, 50]]], np.float32)
    gids = np.array([[-1]], np.int32)
    tgt, _ = mask_targets_from_dense(
        jnp.asarray(rois), jnp.asarray(gids), jnp.asarray(gt_boxes),
        jnp.asarray(dense),
    )
    assert (np.asarray(tgt) == -1).all()


def test_mask_loss_ignores_invalid():
    logits = jnp.zeros((2, 28, 28, 2))
    targets = jnp.full((2, 28, 28), -1.0)
    targets = targets.at[0].set(1.0)
    l = mask_loss(logits, targets)
    # uniform logits -> log(2) over the valid roi only
    assert float(l) == pytest.approx(np.log(2), rel=1e-5)


# slow set: mask train forward (the mask e2e smokes also cover it)
@pytest.mark.slow
def test_mask_detector_train_forward():
    from sniper_tpu.models.detector import SNIPERDetector

    B, H, W = 1, 64, 64
    model = SNIPERDetector(
        num_classes=5, num_anchors=9, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1), with_mask=True,
        num_mask_rois=4, pre_nms_top_n=100, post_nms_top_n=8, num_rois=8,
        dtype=jnp.float32,
    )
    data = jnp.zeros((B, H, W, 3))
    im_info = jnp.asarray([[H, W, 1.0]])
    gt = jnp.full((B, 6, 5), -1.0)
    gt = gt.at[:, 0].set(jnp.asarray([8.0, 8, 40, 40, 2]))
    vr = jnp.asarray([[0.0, 512.0]])
    masks = jnp.zeros((B, 6, 112, 112))
    masks = masks.at[:, 0, :, :56].set(1.0)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, vr, gt_masks=masks, train=True,
    )
    out, _ = model.apply(
        v, data, im_info, gt, vr, gt_masks=masks, train=True,
        rngs={"sampling": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert out["mask_logits"].shape == (4, 28, 28, 2)
    assert out["mask_targets"].shape == (4, 28, 28)
    assert "mask" in v["params"]
    l = mask_loss(out["mask_logits"], out["mask_targets"])
    assert np.isfinite(float(l))


def test_mask_detector_inference_output():
    from sniper_tpu.models.detector import SNIPERDetector

    model = SNIPERDetector(
        num_classes=5, num_anchors=9, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1), with_mask=True,
        num_mask_rois=4, pre_nms_top_n=100, post_nms_top_n=8, num_rois=8,
        dtype=jnp.float32,
    )
    data = jnp.zeros((1, 64, 64, 3))
    im_info = jnp.asarray([[64.0, 64, 1.0]])
    gt = jnp.full((1, 6, 5), -1.0).at[:, 0].set(jnp.asarray([8.0, 8, 40, 40, 2]))
    masks = jnp.zeros((1, 6, 112, 112))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, jnp.asarray([[0.0, 512.0]]), gt_masks=masks,
        train=True,
    )
    out = model.apply(v, data, im_info, train=False)
    assert out["mask_prob"].shape == (1, 8, 28, 28)
    mp = np.asarray(out["mask_prob"])
    assert ((mp >= 0) & (mp <= 1)).all()


def test_paste_and_rle_roundtrip():
    from sniper_tpu.infer.masks import (
        binary_mask_to_rle,
        paste_mask,
        rle_to_binary_mask,
    )

    prob = np.zeros((28, 28), np.float32)
    prob[7:21, 7:21] = 0.9
    full = paste_mask(prob, [10, 20, 65, 75], 100, 120)
    assert full.shape == (100, 120)
    assert full.sum() > 0
    # mask content sits inside the box
    ys, xs = np.nonzero(full)
    assert ys.min() >= 20 and ys.max() <= 75
    assert xs.min() >= 10 and xs.max() <= 65

    rle = binary_mask_to_rle(full)
    rec = rle_to_binary_mask(rle)
    np.testing.assert_array_equal(rec, full)
    assert sum(rle["counts"]) == 100 * 120
    # counts start with the zero run
    assert full.T.reshape(-1)[0] == 0 and rle["counts"][0] > 0


def test_masks_to_results():
    from sniper_tpu.infer.masks import masks_to_results

    roidb = [{"im_id": 9, "height": 50, "width": 60}]
    dets = np.array([[5, 5, 30, 30, 0.8]], np.float32)
    probs = np.ones((1, 28, 28), np.float32)
    abm = [[None], [(dets, probs)]]
    res = masks_to_results(abm, roidb, {1: 18}, num_classes=2)
    assert len(res) == 1
    assert res[0]["category_id"] == 18
    assert res[0]["segmentation"]["size"] == [50, 60]


# slow set: roi-cap desync regression; the mask e2e smokes cover it too
@pytest.mark.slow
def test_mask_detector_train_forward_caps_mask_rois():
    """num_mask_rois > num_rois must not desync shapes: the mask branch
    caps at the sampler's roi count (regression: TypeError reshape in
    the on-device mask smoke with num_rois=32 < default 50)."""
    from sniper_tpu.models.detector import SNIPERDetector

    B, H, W = 1, 64, 64
    model = SNIPERDetector(
        num_classes=5, num_anchors=9, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1), with_mask=True,
        num_mask_rois=50, pre_nms_top_n=100, post_nms_top_n=8, num_rois=8,
        dtype=jnp.float32,
    )
    data = jnp.zeros((B, H, W, 3))
    im_info = jnp.asarray([[H, W, 1.0]])
    gt = jnp.full((B, 6, 5), -1.0)
    gt = gt.at[:, 0].set(jnp.asarray([8.0, 8, 40, 40, 2]))
    vr = jnp.asarray([[0.0, 512.0]])
    masks = jnp.zeros((B, 6, 112, 112))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, vr, gt_masks=masks, train=True,
    )
    out, _ = model.apply(
        v, data, im_info, gt, vr, gt_masks=masks, train=True,
        rngs={"sampling": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    # capped at num_rois=8
    assert out["mask_logits"].shape == (8, 28, 28, 2)
    assert out["mask_targets"].shape == (8, 28, 28)
