"""mask+AutoFocus end to end: the last of the 7 shipped configs.

configs/sniper_res101_e2e_mask_autofocus.yml combines the mask branch
(TRAIN.WITH_MASK) with AutoFocus training supervision and coarse-to-
fine chip-iterating inference (reference
configs/faster/sniper_res101_e2e_mask_autofocus.yml). The interaction
under test is exactly where the round-3 roi-cap bug class lived: the
mask-roi fg-prefix ordering x the chip-iterating inference path x the
FocusPixel scale head all in one model. A tiny detector overfits 4
real-photo crops with L-SHAPED GT polygons (5/8 box coverage — segm
IoU genuinely diverges from bbox IoU) through the full main_train CLI
(mask + scale losses), then the full main_test CLI runs the 2-scale
AutoFocus pipeline (coarse FocusPixel maps -> gmask FocusChips ->
fine-scale chip detection with border pruning -> aggregate) and must
report bbox AP > 0 AND segm AP > 0 with the AutoFocus chips actually
engaged — plus the round-5 discrimination: with box-like predicted
masks (the reference-faithful mask init's measured burn-in behavior at
smoke scale) segm AP must trail bbox AP exactly as the 5/8 coverage
dictates (AP75 dies, AP50 survives), and re-scoring the SAME
detections with GT-shaped masks must recover AP — the RLE -> cocoeval
chain responds to mask content inside identical boxes.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO = "/root/reference/data/demo/demo.jpg"

pytestmark = pytest.mark.slow


def make_real_coco_with_masks(tmp_path):
    import cv2

    im = cv2.imread(DEMO, cv2.IMREAD_COLOR)
    h0, w0 = im.shape[:2]
    crops = [(0, 0), (w0 - 320, 0), (0, h0 - 256), (w0 - 320, h0 - 256)]
    images, anns = [], []
    aid = 1
    os.makedirs(tmp_path / "coco" / "real_tiny", exist_ok=True)
    boxes = [
        [(40, 40, 120, 110, 7), (180, 120, 280, 210, 21)],
        [(30, 60, 140, 170, 21), (200, 30, 290, 120, 7)],
        [(60, 30, 150, 140, 7), (170, 140, 290, 230, 21)],
        [(20, 20, 130, 130, 21), (160, 100, 300, 220, 7)],
    ]
    for i, ((cx, cy), bxs) in enumerate(zip(crops, boxes), start=1):
        crop = im[cy : cy + 256, cx : cx + 320]
        cv2.imwrite(str(tmp_path / "coco" / "real_tiny" / f"im{i}.jpg"), crop)
        images.append({"id": i, "width": 320, "height": 256,
                       "file_name": f"im{i}.jpg"})
        for x1, y1, x2, y2, cat in bxs:
            # L-SHAPED polygon covering 5/8 of the box (full-width top
            # quarter + left-half bottom): segm IoU genuinely diverges
            # from bbox IoU (a filled box scores IoU 0.625 against this
            # GT), so the rasterize -> crop-resize -> RLE -> segm-eval
            # chain is DISCRIMINATED from the bbox path end to end —
            # rectangle polys made segm AP equal bbox AP by
            # construction. Reference polygon handling:
            # /root/reference/lib/data_utils/data_workers.py:231-257.
            xm = (x1 + x2) / 2
            yq = y1 + (y2 - y1) / 4
            anns.append({
                "id": aid, "image_id": i, "category_id": cat, "iscrowd": 0,
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": float((x2 - x1) * (y2 - y1)),
                "segmentation": [
                    [x1, y1, x2, y1, x2, yq, xm, yq, xm, y2, x1, y2]
                ],
            })
            aid += 1
    ann = {
        "images": images, "annotations": anns,
        "categories": [{"id": 7, "name": "cat"}, {"id": 21, "name": "dog"}],
    }
    os.makedirs(tmp_path / "coco" / "annotations", exist_ok=True)
    with open(tmp_path / "coco" / "annotations" /
              "instances_real_tiny.json", "w") as f:
        json.dump(ann, f)


def write_cfg(tmp_path, end_epoch):
    # planted boxes are ~70-140px on a side (sqrt(area) ~75-120): the
    # AutoFocus thresholds below make every GT a positive FocusPixel at
    # the 256 training chip (DC_LOW 5 < sqrt < SMALL_THRESH 150)
    cfg_yml = f"""---
output_path: "{tmp_path}/output"
symbol: resnet_mx_101_e2e_mask
proposal_path: "{tmp_path}/props"
parallel:
  num_devices: 1
network:
  PIXEL_MEANS: [103.9, 116.8, 123.7]
  RPN_FEAT_STRIDE: 16
  FIXED_PARAMS: []
  ANCHOR_RATIOS: [0.5, 1, 2]
  ANCHOR_SCALES: [2, 4, 7]
  NUM_ANCHORS: 9
dataset:
  NUM_CLASSES: 3
  dataset: coco
  dataset_path: "{tmp_path}/coco"
  image_set: real_tiny
  root_path: "{tmp_path}"
  test_image_set: real_tiny
TRAIN:
  WITH_MASK: true
  AUTO_FOCUS: true
  AUTO_FOCUS_SMALL_THRESH: 150
  AUTO_FOCUS_DC_LOW: 5
  AUTO_FOCUS_DC_HIGH: 200
  CPP_CHIPS: false
  USE_NEG_CHIPS: false
  SCALES: [[-1, 256]]
  VALID_RANGES: [[-1, -1]]
  CHIP_SIZE: 256
  lr: 0.01
  lr_step: ''
  warmup: false
  end_epoch: {end_epoch}
  FLIP: false
  SHUFFLE: true
  BATCH_IMAGES: 2
  RPN_BATCH_SIZE: 64
  RPN_POSITIVE_OVERLAP: 0.5
  RPN_NEGATIVE_OVERLAP: 0.4
  RPN_PRE_NMS_TOP_N: 200
  RPN_POST_NMS_TOP_N: 32
TEST:
  AUTO_FOCUS: true
  MAX_PER_IMAGE: 20
  SCALES: [[128, 160], [-1, 320]]
  BATCH_IMAGES: [2, 2]
  VALID_RANGES: [[-1, -1], [-1, -1]]
  DO_PRUNING: [false, true]
  CHIP_HYPERPARAMS: [[2, 0.3, 6], [-1, -1, -1]]
  RPN_PRE_NMS_TOP_N: 200
  RPN_POST_NMS_TOP_N: 32
  NMS: 0.45
  NMS_SIGMA: -1
  TEST_EPOCH: {end_epoch}
  USE_CACHE: [false, false]
"""
    p = tmp_path / "mask_af_tiny.yml"
    p.write_text(cfg_yml)
    return str(p)


def tiny_mask_af_model(cfg, **overrides):
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector

    kw = dict(
        num_classes=cfg.dataset.NUM_CLASSES,
        num_anchors=cfg.network.NUM_ANCHORS,
        anchor_ratios=tuple(cfg.network.ANCHOR_RATIOS),
        anchor_scales=tuple(cfg.network.ANCHOR_SCALES),
        units=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_top_n=200, post_nms_top_n=32, num_rois=32,
        autofocus=True, with_mask=True, num_mask_rois=8,
        # reference-faithful normal(0.01) mask init: measured (round 5,
        # heads.MaskHead.kernel_init) it predicts ~all-foreground for
        # 300+ steps (constant-majority CE plateau), so at this smoke's
        # scale predicted masks are box-LIKE — which is exactly what
        # the L-shape assertions below exploit. (A He-init head learns
        # the L in <100 steps in isolation, but its early gradients
        # into the shared tiny trunk collapse bbox AP at 24 steps —
        # measured both ways.)
    )
    kw.update(overrides)
    return SNIPERDetector(**kw)


@pytest.mark.skipif(not os.path.exists(DEMO), reason="demo.jpg unavailable")
def test_mask_autofocus_config_end_to_end(tmp_path, monkeypatch, capsys):
    import main_test
    import main_train
    import sniper_tpu.models.registry as registry
    from sniper_tpu.chips import autofocus as af_mod

    make_real_coco_with_masks(tmp_path)
    cfg_path = write_cfg(tmp_path, end_epoch=12)
    monkeypatch.setitem(
        registry._REGISTRY, "resnet_mx_101_e2e_mask", tiny_mask_af_model
    )

    monkeypatch.setattr(sys, "argv", ["main_train.py", "--cfg", cfg_path])
    main_train.main()

    # spy on add_chips so the test fails loudly if the AutoFocus path
    # silently degenerates (no FocusChips -> fine scale sees nothing)
    chip_counts = []
    orig_add = af_mod.add_chips

    def spy_add(roidb, maps, s, cfg):
        out = orig_add(roidb, maps, s, cfg)
        chip_counts.append(sum(
            0 if r.get("inference_crops") is None
            else len(r["inference_crops"]) for r in roidb
        ))
        return out

    monkeypatch.setattr(af_mod, "add_chips", spy_add)
    monkeypatch.setattr(main_test, "add_chips", spy_add, raising=False)

    stats = {}
    orig = main_test.run_detection

    def spy(cfg, model, variables, roidb, dataset, out_dir):
        out = orig(cfg, model, variables, roidb, dataset, out_dir)
        stats.update(out if isinstance(out, dict) else {})
        return out

    monkeypatch.setattr(main_test, "run_detection", spy)
    # capture the aggregated (dets, mask_probs) pairs + dataset/roidb so
    # the L-shape discrimination below can re-score modified masks
    captured = {}
    from sniper_tpu.data.coco import COCODataset

    orig_segm = COCODataset.evaluate_segmentations

    def spy_segm(self, all_masks, roidb_, save_json=True):
        captured["dataset"] = self
        captured["masks"] = all_masks
        captured["roidb"] = roidb_
        return orig_segm(self, all_masks, roidb_, save_json)

    monkeypatch.setattr(COCODataset, "evaluate_segmentations", spy_segm)
    monkeypatch.setattr(sys, "argv", ["main_test.py", "--cfg", cfg_path])
    main_test.main()

    # AutoFocus engaged: the coarse scale minted FocusChips for scale 1
    assert chip_counts and chip_counts[0] > 0, (
        "AutoFocus produced no FocusChips — the fine scale ran on "
        f"nothing (counts={chip_counts})"
    )
    assert "bbox" in stats and "segm" in stats, stats
    bbox_ap = stats["bbox"]["AP"]
    segm_ap = stats["segm"]["AP"]
    assert np.isfinite(bbox_ap) and bbox_ap > 0.0, stats
    assert np.isfinite(segm_ap) and segm_ap > 0.0, stats

    # ---- L-shape discrimination of the mask chain ------------------
    # GT polys cover 5/8 of each box, so segm IoU genuinely diverges
    # from bbox IoU. At this smoke's scale the reference-faithful
    # normal(0.01) mask head predicts ~box-filling masks (see
    # tiny_mask_af_model), so:
    # (a) VERDICT's expected gap: a box-like mask scores IoU ~0.625
    #     against the 5/8 GT — every eval threshold above 0.625 fails,
    #     so segm AP must sit BELOW bbox AP with segm AP75 == 0 while
    #     bbox AP50 survives. Rectangle GT made segm == bbox by
    #     construction; this is the divergence that was never tested.
    assert segm_ap < bbox_ap, (
        f"segm AP {segm_ap:.3f} should trail bbox AP {bbox_ap:.3f} on "
        "L-shaped GT with box-like predicted masks"
    )
    assert stats["segm"]["AP75"] == 0.0 and stats["bbox"]["AP50"] > 0, (
        stats
    )
    # (b) inject the TRUE L shape into the SAME detections (crop each
    #     image's rasterized GT mask to the detection box via the real
    #     target op) and re-run the segm evaluator: AP must JUMP well
    #     above the box-like masks' — end-to-end proof that the
    #     RLE -> cocoeval chain responds to mask CONTENT inside
    #     identical boxes, not just to the boxes.
    from sniper_tpu.data.mask_utils import rasterize_gt_masks
    from sniper_tpu.ops.boxes import bbox_overlaps
    from sniper_tpu.ops.mask_target import mask_targets_from_dense

    roidb_c = captured["roidb"]
    dense_by_img = []
    for r in roidb_c:
        dense_by_img.append(rasterize_gt_masks(
            r["gt_masks"], r["boxes"], grid=112,
            max_n_gts=max(len(r["gt_masks"]), 1),
        ).astype(np.float32))
    shaped = []
    for j, cls_masks in enumerate(captured["masks"]):
        row = []
        for i, pair in enumerate(cls_masks):
            if pair is None or len(pair[0]) == 0:
                row.append(pair)
                continue
            dets = np.asarray(pair[0])
            r = roidb_c[i]
            gtb = np.concatenate(
                [r["boxes"], np.ones((len(r["boxes"]), 1), np.float32)],
                axis=1,
            )
            ious = np.asarray(bbox_overlaps(dets[:, :4], r["boxes"]))
            gids = ious.argmax(1).astype(np.int32)
            rois = np.concatenate(
                [np.zeros((len(dets), 1), np.float32), dets[:, :4]], 1)
            t, _ = mask_targets_from_dense(
                rois[None], gids[None], gtb[None].astype(np.float32),
                dense_by_img[i][None],
            )
            row.append((dets, (np.asarray(t)[0] == 1).astype(np.float32)))
        shaped.append(row)
    shaped_stats = orig_segm(
        captured["dataset"], shaped, roidb_c, save_json=False)
    assert shaped_stats["AP"] > segm_ap + 0.05, (
        f"GT-shaped masks in the same boxes should recover AP well "
        f"above box-like masks: {shaped_stats['AP']:.3f} vs {segm_ap:.3f}"
    )
    assert shaped_stats["AP75"] > 0.0, shaped_stats
