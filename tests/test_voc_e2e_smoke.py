"""PascalVOC end-to-end through the real CLIs.

The VOC dataset class is unit-tested (XML roidb, 07/12 AP,
selective-search roidb, SDS — tests/test_pascal_voc.py) but until
round 5 was never DRIVEN through main_train/main_test the way a user
runs it (configs/sniper_res101_e2e_pascal_voc.yml). This smoke builds
a real VOC devkit tree (XML annotations + real-photo JPEGs with
planted boxes), overfits a tiny detector through the full main_train
CLI, then runs the full main_test CLI (detect -> aggregate -> VOC AP
with the 07 metric) and requires mAP > 0 — the devkit parse, roidb
cache, chip pipeline, and VOC evaluator working together.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO = "/root/reference/data/demo/demo.jpg"

pytestmark = pytest.mark.slow


def make_voc_devkit(tmp_path):
    import cv2

    im = cv2.imread(DEMO, cv2.IMREAD_COLOR)
    h0, w0 = im.shape[:2]  # 426 x 640
    base = tmp_path / "VOCdevkit" / "VOC2007"
    (base / "ImageSets" / "Main").mkdir(parents=True)
    (base / "Annotations").mkdir()
    (base / "JPEGImages").mkdir()

    crops = [(0, 0), (w0 - 320, 0), (0, h0 - 256), (w0 - 320, h0 - 256)]
    boxes = [
        [("dog", (40, 40, 120, 110)), ("cat", (180, 120, 280, 210))],
        [("cat", (30, 60, 140, 170)), ("dog", (200, 30, 290, 120))],
        [("dog", (60, 30, 150, 140)), ("cat", (170, 140, 290, 230))],
        [("cat", (20, 20, 130, 130)), ("dog", (160, 100, 300, 220))],
    ]
    ids = []
    for i, ((cx, cy), bxs) in enumerate(zip(crops, boxes), start=1):
        im_id = f"{i:06d}"
        ids.append(im_id)
        crop = im[cy:cy + 256, cx:cx + 320]
        cv2.imwrite(str(base / "JPEGImages" / f"{im_id}.jpg"), crop)
        objs = "".join(
            f"<object><name>{n}</name><difficult>0</difficult>"
            # VOC XML is 1-based inclusive
            f"<bndbox><xmin>{b[0] + 1}</xmin><ymin>{b[1] + 1}</ymin>"
            f"<xmax>{b[2] + 1}</xmax><ymax>{b[3] + 1}</ymax></bndbox>"
            "</object>"
            for n, b in bxs
        )
        (base / "Annotations" / f"{im_id}.xml").write_text(
            "<annotation><size><width>320</width><height>256</height>"
            f"<depth>3</depth></size>{objs}</annotation>"
        )
    (base / "ImageSets" / "Main" / "train.txt").write_text(
        "\n".join(ids) + "\n")
    return str(tmp_path / "VOCdevkit")


def write_cfg(tmp_path, devkit, end_epoch):
    cfg_yml = f"""---
output_path: "{tmp_path}/output"
symbol: resnet_mx_50_e2e
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
  NUM_CLASSES: 21
  dataset: PascalVOC
  dataset_path: "{devkit}"
  image_set: 2007_train
  root_path: "{tmp_path}"
  test_image_set: 2007_train
TRAIN:
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
  MAX_PER_IMAGE: 20
  SCALES: [[-1, 256]]
  BATCH_IMAGES: [2]
  VALID_RANGES: [[-1, -1]]
  RPN_PRE_NMS_TOP_N: 200
  RPN_POST_NMS_TOP_N: 32
  NMS: 0.45
  NMS_SIGMA: -1
  TEST_EPOCH: {end_epoch}
  USE_CACHE: [false]
"""
    p = tmp_path / "voc_tiny.yml"
    p.write_text(cfg_yml)
    return str(p)


def tiny_model(cfg, **overrides):
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector

    kw = dict(
        num_classes=cfg.dataset.NUM_CLASSES,
        num_anchors=cfg.network.NUM_ANCHORS,
        anchor_ratios=tuple(cfg.network.ANCHOR_RATIOS),
        anchor_scales=tuple(cfg.network.ANCHOR_SCALES),
        units=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_top_n=200, post_nms_top_n=32, num_rois=32,
        train_pre_nms=200, train_post_nms=32,
    )
    kw.update(overrides)
    return SNIPERDetector(**kw)


@pytest.mark.skipif(not os.path.exists(DEMO), reason="demo.jpg unavailable")
def test_voc_train_test_eval_cli(tmp_path, monkeypatch):
    import main_test
    import main_train
    import sniper_tpu.models.registry as registry

    devkit = make_voc_devkit(tmp_path)
    cfg_path = write_cfg(tmp_path, devkit, end_epoch=12)
    monkeypatch.setitem(registry._REGISTRY, "resnet_mx_50_e2e", tiny_model)

    monkeypatch.setattr(sys, "argv", ["main_train.py", "--cfg", cfg_path])
    main_train.main()

    stats = {}
    orig = main_test.run_detection

    def spy(cfg, model, variables, roidb, dataset, out_dir):
        out = orig(cfg, model, variables, roidb, dataset, out_dir)
        stats.update(out if isinstance(out, dict) else {})
        return out

    monkeypatch.setattr(main_test, "run_detection", spy)
    monkeypatch.setattr(sys, "argv", ["main_test.py", "--cfg", cfg_path])
    main_test.main()

    assert "mAP" in stats, stats
    assert np.isfinite(stats["mAP"]) and stats["mAP"] > 0.0, stats
    # the overfit classes score; absent classes contribute no AP rows
    assert stats["per_class"].get("dog", 0) > 0 or \
        stats["per_class"].get("cat", 0) > 0, stats["per_class"]