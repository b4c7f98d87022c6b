"""On-device neg-chip 3-phase chain: RPN-only train -> proposal
extraction -> SNIPER train with mined negative chips, on the real TPU
with the real ResNet-50 (reference recipe:
scripts/train_neg_props_and_sniper.sh:45-70).

Runs on the 4-real-photo COCO set the realdata smoke test builds (crops
of the reference demo street scene with planted GT), so it works
offline; asserts at each phase boundary that the artifact the next
phase needs actually exists and is consumed (proposal pkl -> roidb
merge -> r['neg_chips'] non-empty -> phase-3 epochs complete). Record
the printed summary in ARCHITECTURE.md.

  python scripts/run_negchip_smoke_tpu.py [workdir]
"""

import glob
import os
import pickle
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def write_cfg(tmp_path, **kw):
    cfg_yml = f"""---
output_path: "{tmp_path}/output"
symbol: resnet_mx_50_e2e
proposal_path: "{tmp_path}/props"
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
  CPP_CHIPS: true
  USE_NEG_CHIPS: false
  SCALES: [[-1, 256]]
  VALID_RANGES: [[-1, -1]]
  CHIP_SIZE: 256
  bf16: true
  lr: 0.005
  lr_step: ''
  warmup: false
  end_epoch: {kw.get('end_epoch', 3)}
  FLIP: false
  SHUFFLE: true
  BATCH_IMAGES: 4
  RPN_BATCH_SIZE: 64
  RPN_POSITIVE_OVERLAP: 0.5
  RPN_NEGATIVE_OVERLAP: 0.4
  RPN_PRE_NMS_TOP_N: 600
  RPN_POST_NMS_TOP_N: 32
TEST:
  MAX_PER_IMAGE: 20
  SCALES: [[-1, 256]]
  BATCH_IMAGES: [4]
  VALID_RANGES: [[-1, -1]]
  RPN_PRE_NMS_TOP_N: 600
  RPN_POST_NMS_TOP_N: 300
  NMS: 0.45
  NMS_SIGMA: -1
  TEST_EPOCH: {kw.get('end_epoch', 3)}
  USE_CACHE: [false]
"""
    p = os.path.join(tmp_path, "negchip_tpu.yml")
    with open(p, "w") as f:
        f.write(cfg_yml)
    return p


def run(argv):
    import main_test
    import main_train

    old = sys.argv
    sys.argv = argv
    try:
        if argv[0] == "main_train.py":
            main_train.main()
        else:
            main_test.main()
    finally:
        sys.argv = old


def main():
    import pathlib

    import main_train

    from test_realdata_smoke import make_real_coco

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="negchip_tpu_")
    tmp_path = pathlib.Path(workdir)
    os.makedirs(tmp_path, exist_ok=True)
    make_real_coco(tmp_path)
    cfg_path = write_cfg(str(tmp_path), end_epoch=3)
    props_dir = str(tmp_path / "props")

    # idempotent: a killed run resumes after the last completed phase
    if glob.glob(os.path.join(props_dir, "*_rpn.pkl")):
        print("== phases 1-2 artifacts present; skipping to phase 3 ==",
              flush=True)
    else:
        print("== phase 1: RPN-only training (TRAIN.ONLY_PROPOSAL) ==",
              flush=True)
        run(["main_train.py", "--cfg", cfg_path, "--set",
             "TRAIN.ONLY_PROPOSAL", "True"])

        print("== phase 2: proposal extraction (TEST.EXTRACT_PROPOSALS) ==",
              flush=True)
        run(["main_test.py", "--cfg", cfg_path, "--set",
             "TEST.EXTRACT_PROPOSALS", "True", "TRAIN.ONLY_PROPOSAL", "True",
             "TEST.PROPOSAL_SAVE_PATH", props_dir])
    pkls = glob.glob(os.path.join(props_dir, "*_rpn.pkl"))
    assert pkls, "phase 2 must write the proposal pkl"
    with open(pkls[0], "rb") as f:
        props = pickle.load(f)["boxes"]
    n_props = [int(p.shape[0]) for p in props]
    print(f"proposal pkl: {pkls[0]} images={len(props)} "
          f"props/img={n_props}", flush=True)
    assert min(n_props) >= 100

    print("== phase 3: SNIPER training with neg chips ==", flush=True)
    # res-based scale + small chips leave uncovered proposals to mine
    neg_overrides = [
        "TRAIN.USE_NEG_CHIPS", "True",
        "TRAIN.SCALES", "[[256, 400]]",
        "TRAIN.VALID_RANGES", "[[-1, -1]]",
        "TRAIN.CHIP_SIZE", "128",
        "TRAIN.BATCH_IMAGES", "4",
    ]
    # assert the mining step actually produced neg chips before training
    from sniper_tpu.config import load_config
    from sniper_tpu.data.loader import ChipLoader
    from sniper_tpu.utils.logger import create_logger

    cfg3 = load_config(cfg_path, neg_overrides)
    logger, _ = create_logger(str(tmp_path / "output"), "negchip_tpu",
                              "probe")
    roidb = main_train.build_roidb(cfg3, logger)
    assert all(len(r["boxes"]) > 2 for r in roidb), "proposals not merged"
    loader = ChipLoader(roidb, cfg3, batch_size=4, seed=0)
    n_chips = loader.reset()
    neg_counts = [len(r.get("neg_chips", [])) for r in roidb]
    print(f"chips={n_chips} neg_chips/img={neg_counts}", flush=True)
    assert sum(neg_counts) > 0, "no neg chips mined from proposals"

    import time

    t3 = time.time()
    run(["main_train.py", "--cfg", cfg_path, "--set", *neg_overrides])
    # phase 1 shares output_path, so bare existence would be satisfied
    # by ITS checkpoints — require one written after phase 3 started
    ckpts = [p for p in glob.glob(
        str(tmp_path / "output" / "**" / "checkpoints" / "*"),
        recursive=True) if os.path.getmtime(p) >= t3]
    assert ckpts, "phase 3 must write its own checkpoints"
    print(f"== chain complete: workdir={workdir} "
          f"total_neg_chips={sum(neg_counts)} ==", flush=True)


if __name__ == "__main__":
    main()
