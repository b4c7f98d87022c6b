"""Real-data mAP smoke: overfit on real photographs, assert AP > 0.

The reference's only QC is golden-number COCO evaluation on real data
(SURVEY.md §4). This is the minimal analog available offline: crops of
the SNIPER demo photograph (/root/reference/data/demo/demo.jpg — a real
street scene, real JPEG statistics) become a 4-image COCO dataset with
planted GT boxes; a tiny detector is trained through the full
main_train CLI until it overfits, then the full main_test CLI
(multi-scale detect -> aggregate -> native COCO eval) must report
AP > 0. Exercises real imread/resize/chip pipelines end to end, unlike
the synthetic-noise integration test.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO = "/root/reference/data/demo/demo.jpg"

pytestmark = pytest.mark.slow


def make_real_coco(tmp_path):
    import cv2

    im = cv2.imread(DEMO, cv2.IMREAD_COLOR)
    h0, w0 = im.shape[:2]  # 426 x 640
    crops = [(0, 0), (w0 - 320, 0), (0, h0 - 256), (w0 - 320, h0 - 256)]
    images, anns = [], []
    aid = 1
    os.makedirs(tmp_path / "coco" / "real_tiny", exist_ok=True)
    # fixed planted boxes; the net overfits to them regardless of content
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
  NUM_CLASSES: 3
  dataset: coco
  dataset_path: "{tmp_path}/coco"
  image_set: real_tiny
  root_path: "{tmp_path}"
  test_image_set: real_tiny
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
    p = tmp_path / "real_tiny.yml"
    p.write_text(cfg_yml)
    return str(p)


def tiny_model(cfg, **overrides):
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector

    return SNIPERDetector(
        num_classes=cfg.dataset.NUM_CLASSES,
        num_anchors=cfg.network.NUM_ANCHORS,
        anchor_ratios=tuple(cfg.network.ANCHOR_RATIOS),
        anchor_scales=tuple(cfg.network.ANCHOR_SCALES),
        units=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_top_n=200, post_nms_top_n=32, num_rois=32,
    )


@pytest.mark.skipif(not os.path.exists(DEMO), reason="demo.jpg unavailable")
def test_real_image_overfit_ap_positive(tmp_path, monkeypatch, capsys):
    import main_test
    import main_train
    import sniper_tpu.models.registry as registry

    make_real_coco(tmp_path)
    cfg_path = write_cfg(tmp_path, end_epoch=10)
    monkeypatch.setitem(registry._REGISTRY, "resnet_mx_50_e2e", tiny_model)

    monkeypatch.setattr(sys, "argv", ["main_train.py", "--cfg", cfg_path])
    main_train.main()

    stats = {}

    # capture the eval stats main_test computes
    orig = main_test.run_detection

    def spy(cfg, model, variables, roidb, dataset, out_dir):
        out = orig(cfg, model, variables, roidb, dataset, out_dir)
        stats.update(out if isinstance(out, dict) else {})
        return out

    monkeypatch.setattr(main_test, "run_detection", spy)
    monkeypatch.setattr(sys, "argv", ["main_test.py", "--cfg", cfg_path])
    main_test.main()

    assert stats, "run_detection returned no stats"
    ap = stats.get("AP", stats.get("bbox", {}).get("AP"))
    assert ap is not None and np.isfinite(ap)
    assert ap > 0.0, f"overfit on real images must yield AP > 0, got {ap}"

    # per-scale roi-count mAP-neutrality (list-valued
    # TEST.N_PROPOSAL_PER_SCALE, main_test._scale_post_nms): evaluating
    # 2-scale with the coarse scale capped at 12 rois must score the
    # same AP as the uncapped 2-scale run — the planted objects are
    # found by the top handful of proposals either way
    def eval_with(extra):
        got = {}

        def spy2(cfg, model, variables, roidb, dataset, out_dir):
            out = orig(cfg, model, variables, roidb, dataset, out_dir)
            got.update(out if isinstance(out, dict) else {})
            return out

        monkeypatch.setattr(main_test, "run_detection", spy2)
        monkeypatch.setattr(sys, "argv", [
            "main_test.py", "--cfg", cfg_path, "--set",
            "TEST.SCALES", "[[-1, 256], [-1, 192]]",
            "TEST.BATCH_IMAGES", "[2, 2]",
            "TEST.VALID_RANGES", "[[-1, -1], [-1, -1]]",
            "TEST.USE_CACHE", "[False, False]",
            *extra,
        ])
        main_test.main()
        return got["AP"]

    ap_full = eval_with([])
    ap_capped = eval_with(["TEST.N_PROPOSAL_PER_SCALE", "[32, 12]"])
    assert ap_full > 0.0
    assert abs(ap_full - ap_capped) < 0.02, (ap_full, ap_capped)


@pytest.mark.skipif(not os.path.exists(DEMO), reason="demo.jpg unavailable")
def test_demo_cli_writes_visualization(tmp_path, monkeypatch):
    """demo.py end to end on the real photograph (random-init weights:
    exercises the multi-scale detect -> aggregate -> draw path)."""
    import demo
    import sniper_tpu.models.registry as registry

    cfg_path = write_cfg(tmp_path, end_epoch=1)
    monkeypatch.setitem(registry._REGISTRY, "resnet_mx_50_e2e", tiny_model)
    out = str(tmp_path / "demo_out.jpg")
    monkeypatch.setattr(
        sys, "argv",
        ["demo.py", "--cfg", cfg_path, "--im_path", DEMO,
         "--out_path", out],
    )
    demo.main()
    assert os.path.exists(out) and os.path.getsize(out) > 1000
