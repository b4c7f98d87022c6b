"""mask+AutoFocus end to end: the last of the 7 shipped configs.

configs/sniper_res101_e2e_mask_autofocus.yml combines the mask branch
(TRAIN.WITH_MASK) with AutoFocus training supervision and coarse-to-
fine chip-iterating inference (reference
configs/faster/sniper_res101_e2e_mask_autofocus.yml). The interaction
under test is exactly where the round-3 roi-cap bug class lived: the
mask-roi fg-prefix ordering x the chip-iterating inference path x the
FocusPixel scale head all in one model. A tiny detector overfits 4
real-photo crops with rectangle GT polygons through the full
main_train CLI (mask + scale losses), then the full main_test CLI runs
the 2-scale AutoFocus pipeline (coarse FocusPixel maps -> gmask
FocusChips -> fine-scale chip detection with border pruning ->
aggregate) and must report bbox AP > 0 AND segm AP > 0 with the
AutoFocus chips actually engaged.
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
            anns.append({
                "id": aid, "image_id": i, "category_id": cat, "iscrowd": 0,
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": float((x2 - x1) * (y2 - y1)),
                # rectangle polygon = the full box, so a perfect mask
                # equals the box and segm AP can match bbox AP
                "segmentation": [
                    [x1, y1, x2, y1, x2, y2, x1, y2]
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
