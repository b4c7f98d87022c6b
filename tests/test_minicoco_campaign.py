"""Shrunken mini-dataset campaign: the full 5-phase workflow on CPU.

scripts/run_minicoco_campaign.py is the 300-image TPU campaign (RPN
train -> proposal extraction -> SNIPER+neg-chip+AutoFocus train with a
real checkpoint RESUME -> full-pyramid eval -> AutoFocus eval). This
drives the IDENTICAL phase flow — same script, same resumability
checks, same summary artifact — shrunk to 16 composite images, a
2-scale pyramid at 256^2 chips and a tiny detector, so the phase
plumbing (proposal pkl -> roidb merge -> neg chips -> begin_epoch
restore -> aggregation -> native eval -> FocusChip tap) is regression-
tested offline every round while the full-size numbers live in
ARCHITECTURE.md.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

pytestmark = pytest.mark.slow

DEMO = "/root/reference/data/demo/demo.jpg"


def small_write_cfg(workdir):
    """CPU-sized twin of the campaign yml: 2 scales, 256^2 chips."""
    cfg_yml = f"""---
output_path: "{workdir}/output"
symbol: resnet_mx_50_e2e
proposal_path: "{workdir}/props"
CLASS_AGNOSTIC: true
parallel:
  num_devices: 1
network:
  PIXEL_MEANS: [103.939, 116.779, 123.68]
  RPN_FEAT_STRIDE: 16
  FIXED_PARAMS: []
  ANCHOR_RATIOS: [0.5, 1, 2]
  ANCHOR_SCALES: [2, 4, 7]
  NUM_ANCHORS: 9
dataset:
  NUM_CLASSES: 5
  dataset: coco
  dataset_path: "{workdir}/coco"
  image_set: minicoco
  root_path: "{workdir}"
  test_image_set: minicoco
TRAIN:
  CPP_CHIPS: true
  USE_NEG_CHIPS: false
  AUTO_FOCUS: false
  AUTO_FOCUS_SMALL_THRESH: 64
  AUTO_FOCUS_DC_LOW: 5
  AUTO_FOCUS_DC_HIGH: 90
  SCALES: [[512, 800], [-1, 256]]
  VALID_RANGES: [[-1, 80], [56, -1]]
  CHIP_SIZE: 256
  lr: 0.01
  lr_step: ''
  warmup: false
  wd: 0.0
  begin_epoch: 0
  end_epoch: 5
  FLIP: false
  SHUFFLE: true
  BATCH_IMAGES: 4
  RPN_BATCH_SIZE: 64
  RPN_POSITIVE_OVERLAP: 0.5
  RPN_NEGATIVE_OVERLAP: 0.4
  RPN_PRE_NMS_TOP_N: 300
  RPN_POST_NMS_TOP_N: 32
TEST:
  MAX_PER_IMAGE: 20
  SCALES: [[512, 800], [256, 320]]
  BATCH_IMAGES: [4, 4]
  VALID_RANGES: [[-1, 80], [56, -1]]
  RPN_PRE_NMS_TOP_N: 300
  RPN_POST_NMS_TOP_N: 32
  N_PROPOSAL_PER_SCALE: [32, 32]
  NMS: 0.45
  NMS_SIGMA: -1
  TEST_EPOCH: 5
  USE_CACHE: [false, false]
"""
    p = os.path.join(workdir, "minicoco_campaign.yml")
    with open(p, "w") as f:
        f.write(cfg_yml)
    return p


SMALL_AF_TEST = [
    "TEST.SCALES", "[[256, 320], [512, 800]]",
    "TEST.BATCH_IMAGES", "[4, 4]",
    "TEST.VALID_RANGES", "[[56, -1], [-1, 80]]",
    "TEST.N_PROPOSAL_PER_SCALE", "[32, 32]",
    "TEST.AUTO_FOCUS", "True",
    "TEST.DO_PRUNING", "[False, True]",
    "TEST.CHIP_HYPERPARAMS", "[[2, 0.1, 6], [-1, -1, -1]]",
]


def tiny_model(cfg, **overrides):
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector

    kw = dict(
        num_classes=cfg.dataset.NUM_CLASSES,
        num_anchors=cfg.network.NUM_ANCHORS,
        anchor_ratios=tuple(cfg.network.ANCHOR_RATIOS),
        anchor_scales=tuple(cfg.network.ANCHOR_SCALES),
        units=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_top_n=300, post_nms_top_n=32, num_rois=32,
        train_pre_nms=300, train_post_nms=32,
        autofocus=bool(cfg.TRAIN.AUTO_FOCUS or cfg.TEST.AUTO_FOCUS),
        rpn_only=bool(cfg.TRAIN.ONLY_PROPOSAL),
    )
    kw.update(overrides)
    return SNIPERDetector(**kw)


@pytest.mark.skipif(not os.path.exists(DEMO), reason="demo.jpg unavailable")
def test_campaign_flow_shrunken(tmp_path, monkeypatch):
    import run_minicoco_campaign as camp
    import sniper_tpu.models.registry as registry

    workdir = str(tmp_path / "camp")
    monkeypatch.setattr(camp, "END_EPOCH", 5)
    # RESUME_AT must exceed phase 1's 2 RPN epochs: at 2, the
    # resume-detection glob matched the RPN-only checkpoint and
    # phase 3b restored the wrong topology (campaign asserts this)
    monkeypatch.setattr(camp, "RESUME_AT", 3)
    monkeypatch.setattr(camp, "write_cfg", small_write_cfg)
    monkeypatch.setattr(camp, "AF_TEST", SMALL_AF_TEST)
    monkeypatch.setitem(registry._REGISTRY, "resnet_mx_50_e2e", tiny_model)
    monkeypatch.setattr(sys, "argv", ["run_minicoco_campaign.py",
                                      workdir, "16"])
    camp.main()

    with open(os.path.join(workdir, "campaign_summary.json")) as f:
        s = json.load(f)
    # every phase ran and was timed
    for tag in ("0_dataset", "1_rpn_train", "2_extract_props",
                "3a_sniper_train_to_4", "3b_resume_4_to_8",
                "4_test_full_pyramid", "5_test_autofocus"):
        assert tag in s["phase_seconds"], s["phase_seconds"]
    assert s["n_images"] == 16  # FLIP off in the shrunken cfg
    # 16 images, not fewer: at 12 the composite draw left every
    # valid-range proposal chip-covered and neg mining found no
    # candidates (the 300-image campaign mines thousands)
    assert s["props_per_img_p50"] >= 16
    assert s["chips_per_epoch"] > 16
    assert s["neg_chips_total"] > 0
    ap = s["ap_full_pyramid"]["AP"]
    assert np.isfinite(ap) and ap > 0.0, s["ap_full_pyramid"]
    ap_af = s["ap_autofocus"]["AP"]
    assert np.isfinite(ap_af) and ap_af >= 0.0, s["ap_autofocus"]
    # the AutoFocus pass actually pruned: learned FocusChips covered a
    # measured fraction of the fine scale
    assert s["autofocus_pct_pixels"], s
    assert s["peak_rss_mb"] > 0