"""Tester post-processing tests with a synthetic forward function."""

import numpy as np

from sniper_tpu.config import default_config
from sniper_tpu.infer.tester import Tester, check_valid

C = 4  # classes incl. background
N = 8  # rois per image


def fake_forward(planted):
    """forward_fn emitting rois that decode exactly to planted boxes."""

    def fn(data, im_info):
        b = data.shape[0]
        rois = np.zeros((b, N, 5), np.float32)
        cls_prob = np.zeros((b, N, C), np.float32)
        cls_prob[:, :, 0] = 1.0
        deltas = np.zeros((b, N, 4), np.float32)
        valid = np.zeros((b, N), bool)
        for i in range(b):
            for k, (box, cls, score) in enumerate(planted[i]):
                rois[i, k, 1:] = box
                cls_prob[i, k] = (1 - score) / (C - 1)
                cls_prob[i, k, cls] = score
                valid[i, k] = True
        return {
            "rois": rois, "cls_prob": cls_prob, "bbox_pred": deltas,
            "roi_valid": valid,
        }

    return fn


def make_cfg():
    cfg = default_config()
    cfg.TEST.NMS = -1
    cfg.TEST.NMS_SIGMA = 0.55
    cfg.TEST.MAX_PER_IMAGE = 10
    cfg.TEST.VALID_RANGES = [(-1, 90), (32, 180), (75, -1)]
    return cfg


def batch_for(planted, scale=1.0, hw=(256, 256), im_ids=None, chip_ids=None):
    b = len(planted)
    return {
        "data": np.zeros((b, hw[0], hw[1], 3), np.float32),
        "im_info": np.tile([[hw[0], hw[1], scale]], (b, 1)).astype(np.float32),
        "im_scales": np.full(b, scale, np.float32),
        "im_ids": im_ids if im_ids is not None else np.arange(b),
        "chip_ids": chip_ids if chip_ids is not None else np.zeros(b, int),
        "valid": np.ones(b, bool),
    }


def test_detect_rescales_boxes():
    planted = [[(np.array([20, 20, 60, 60]), 1, 0.9)]]
    t = Tester(fake_forward(planted), make_cfg(), C)
    scores, boxes, _, _ = t.detect(
        np.zeros((1, 128, 128, 3)), np.array([[128, 128, 2.0]]), [2.0]
    )
    # chip coords / 2 -> image coords
    np.testing.assert_allclose(boxes[0][0], [10, 10, 30, 30])
    assert scores[0][0, 1] == np.float32(0.9)


def test_get_detections_layout():
    roidb = [
        {"inference_crops": [[0, 0, 255, 255]], "width": 256, "height": 256},
        {"inference_crops": [[0, 0, 255, 255]], "width": 256, "height": 256},
    ]
    planted = [
        [(np.array([10, 10, 50, 50]), 1, 0.8)],
        [(np.array([30, 30, 90, 90]), 2, 0.7)],
    ]
    t = Tester(fake_forward(planted), make_cfg(), C)
    all_boxes, _ = t.get_detections([batch_for(planted)], roidb, cls_thresh=0.5)
    assert len(all_boxes) == C and len(all_boxes[1]) == 2
    assert all_boxes[1][0][0].shape[0] == 1  # class 1 in image 0
    np.testing.assert_allclose(all_boxes[1][0][0][0, :4], [10, 10, 50, 50])
    assert all_boxes[2][1][0].shape[0] == 1  # class 2 in image 1
    assert all_boxes[2][0][0].shape[0] == 0


def test_get_detections_pipelined_multibatch():
    """The one-deep dispatch-ahead pipeline must place every batch's
    detections at the right (image, chip) slot, same as serial."""
    roidb = [
        {"inference_crops": [[0, 0, 255, 255], [0, 0, 128, 128]],
         "width": 256, "height": 256},
        {"inference_crops": [[0, 0, 255, 255]], "width": 256, "height": 256},
    ]
    planted_by_batch = [
        [[(np.array([10, 10, 50, 50]), 1, 0.8)]],   # im 0 chip 0
        [[(np.array([5, 5, 25, 25]), 2, 0.7)]],     # im 0 chip 1
        [[(np.array([30, 30, 90, 90]), 3, 0.6)]],   # im 1 chip 0
    ]
    coords = [(0, 0), (0, 1), (1, 0)]
    calls = {"n": 0}

    def fn(data, im_info):
        planted = planted_by_batch[calls["n"]]
        calls["n"] += 1
        return fake_forward(planted)(data, im_info)

    t = Tester(fn, make_cfg(), C)
    batches = (
        batch_for(p, im_ids=np.array([im]), chip_ids=np.array([ch]))
        for p, (im, ch) in zip(planted_by_batch, coords)
    )
    all_boxes, _ = t.get_detections(batches, roidb, cls_thresh=0.5)
    assert all_boxes[1][0][0].shape[0] == 1
    assert all_boxes[2][0][1].shape[0] == 1
    assert all_boxes[3][1][0].shape[0] == 1
    np.testing.assert_allclose(all_boxes[2][0][1][0, :4], [5, 5, 25, 25])


def test_pruning_translates_and_filters():
    # chip at (100,100)-(355,355) inside a 600x600 image
    roidb = [{"inference_crops": [[100, 100, 355, 355]], "width": 600, "height": 600}]
    planted = [[
        (np.array([50, 50, 120, 120]), 1, 0.9),   # interior -> kept
        (np.array([2, 50, 60, 120]), 1, 0.8),     # touches left border -> cut
    ]]
    t = Tester(fake_forward(planted), make_cfg(), C)
    all_boxes, _ = t.get_detections(
        [batch_for(planted)], roidb, cls_thresh=0.5, do_pruning=True
    )
    kept = all_boxes[1][0][0]
    assert kept.shape[0] == 1
    np.testing.assert_allclose(kept[0, :4], [150, 150, 220, 220])


def test_check_valid_border_semantics():
    # interior chip: boxes near any chip border are cut
    chip = [100, 100, 355, 355]
    assert check_valid([105, 200, 200, 250, 0.9], chip, 600, 600) is False
    assert check_valid([200, 200, 250, 250, 0.9], chip, 600, 600) is True
    # chip borders flush with the image are NOT interior -> no cut there
    chip0 = [0, 0, 255, 255]
    assert check_valid([2, 50, 60, 120, 0.9], chip0, 256, 256) is True


def test_aggregate_valid_ranges_and_cap():
    cfg = make_cfg()
    t = Tester(lambda *a: None, cfg, C)
    n_images = 1
    small = np.array([[0, 0, 50, 50, 0.9]], np.float32)          # 50^2
    medium = np.array([[500, 500, 600, 600, 0.8]], np.float32)   # 100^2
    large = np.array([[1000, 0, 1300, 300, 0.7]], np.float32)    # 300^2
    def mk(dets):
        boxes = [[[np.zeros((0, 5), np.float32)]] for _ in range(C)]
        boxes[1][0][0] = dets
        return boxes
    out = t.aggregate([mk(small), mk(medium), mk(large)], n_images)
    got = out[1][0]
    # scale0 range (-1,90): small(50) passes; scale1 (32,180): medium(100)
    # passes; scale2 (75,-1): large(300) passes -> all three survive
    assert got.shape[0] == 3
    scores = sorted(got[:, 4].tolist(), reverse=True)
    np.testing.assert_allclose(scores, [0.9, 0.8, 0.7], atol=1e-6)

    # now out-of-range: large box presented at scale0 gets filtered
    out2 = t.aggregate([mk(large), mk(np.zeros((0, 5), np.float32)),
                        mk(np.zeros((0, 5), np.float32))], n_images)
    assert out2[1][0].shape[0] == 0


def test_aggregate_max_per_image():
    cfg = make_cfg()
    cfg.TEST.MAX_PER_IMAGE = 2
    cfg.TEST.VALID_RANGES = [(-1, -1)]
    t = Tester(lambda *a: None, cfg, C)
    dets = np.array(
        [[0, 0, 50, 50, 0.9], [200, 200, 260, 260, 0.5], [400, 0, 460, 60, 0.3]],
        np.float32,
    )
    boxes = [[[np.zeros((0, 5), np.float32)]] for _ in range(C)]
    boxes[1][0][0] = dets
    out = t.aggregate([boxes], 1)
    assert out[1][0].shape[0] == 2
    assert out[1][0][:, 4].min() >= 0.5


def fake_forward_with_masks(planted):
    """fake_forward + per-roi mask_prob planted as solid squares."""
    base = fake_forward(planted)

    def fn(data, im_info):
        out = base(data, im_info)
        b = data.shape[0]
        masks = np.zeros((b, N, 28, 28), np.float32)
        masks[:, :, 4:24, 4:24] = 1.0  # solid interior
        out["mask_prob"] = masks
        return out

    return fn


def test_mask_flow_through_detect_aggregate_and_segm_eval():
    """Masks ride along detections through get_detections -> aggregate
    (soft-NMS index tracking) -> evaluate_segmentations, and a planted
    perfect detection scores segm AP 1.0."""
    from types import SimpleNamespace

    from sniper_tpu.infer.masks import binary_mask_to_rle, paste_mask

    cfg = make_cfg()
    cfg.TEST.VALID_RANGES = [(-1, -1)]
    roidb = [{
        "inference_crops": [[0, 0, 255, 255]], "width": 256, "height": 256,
        "im_id": 7,
    }]
    box = np.array([40, 40, 120, 120])
    planted = [[(box, 1, 0.9)]]
    t = Tester(fake_forward_with_masks(planted), cfg, C)
    all_boxes, _, all_masks = t.get_detections(
        [batch_for(planted)], roidb, cls_thresh=0.5, with_masks=True
    )
    assert all_masks[1][0][0].shape == (1, 28, 28)
    final, final_masks = t.aggregate(
        [all_boxes], 1, scale_cls_masks=[all_masks]
    )
    assert final[1][0].shape[0] == 1
    dets, masks = final_masks[1][0]
    assert masks.shape == (1, 28, 28)

    # GT = exactly the pasted planted mask -> segm AP must be 1.0
    gt_mask = paste_mask(masks[0], dets[0, :4], 256, 256)
    ds = SimpleNamespace(
        num_classes=C,
        classes=["__background__", "a", "b", "c"],
        cat_id_to_class={11: 1, 12: 2, 13: 3},
        class_to_cat_id={1: 11, 2: 12, 3: 13},
        anns_by_image={7: [{
            "image_id": 7, "category_id": 11,
            "bbox": [float(box[0]), float(box[1]),
                     float(box[2] - box[0]), float(box[3] - box[1])],
            "area": float(gt_mask.sum()), "iscrowd": 0,
            "segmentation": binary_mask_to_rle(gt_mask),
        }]},
    )
    from sniper_tpu.data.coco_eval import COCOEvaluator
    from sniper_tpu.infer.masks import masks_to_results

    results = masks_to_results(final_masks, roidb, ds.class_to_cat_id, C)
    ev = COCOEvaluator(ds, roidb, iou_type="segm")
    stats = ev.evaluate(results)
    assert stats["AP"] == 1.0 and stats["AP75"] == 1.0


def test_soft_nms_index_tracking():
    """return_indices keeps payload rows aligned with survivors."""
    from sniper_tpu.ops.nms import soft_nms_np

    rng = np.random.RandomState(3)
    dets = np.zeros((12, 5), np.float32)
    dets[:, 0] = rng.uniform(0, 200, 12)
    dets[:, 1] = rng.uniform(0, 200, 12)
    dets[:, 2] = dets[:, 0] + rng.uniform(20, 80, 12)
    dets[:, 3] = dets[:, 1] + rng.uniform(20, 80, 12)
    dets[:, 4] = rng.uniform(0.01, 1.0, 12)
    plain = soft_nms_np(dets, sigma=0.55, method=2)
    kept, idx = soft_nms_np(dets, sigma=0.55, method=2, return_indices=True)
    np.testing.assert_allclose(kept, plain)
    # surviving rows' geometry matches the original rows they point to
    np.testing.assert_allclose(kept[:, :4], dets[idx, :4])
