"""Mini-dataset campaign: the full SNIPER workflow at 300-image scale
on the real TPU.

Every prior e2e proof ran on <= 4 images; this campaign exercises epoch
scheduling, roidb/proposal caches, neg-chip mining, checkpoint/RESUME,
multi-scale aggregation and native COCO eval TOGETHER at the largest
scale this offline box allows — the closest available analog of the
reference's golden-number eval workflow
(/root/reference/lib/inference.py:439-529, coco.py:323-375):

  0. dataset: 300 COCO-format composite images (real-photo backgrounds
     and object prototypes cut from /root/reference/data/demo/demo.jpg,
     4 classes x 2 prototypes, object sizes log-uniform 16-340 px so
     all three SNIPER scale ranges are populated)
  1. RPN-only training (TRAIN.ONLY_PROPOSAL), 2 epochs
  2. proposal extraction (TEST.EXTRACT_PROPOSALS) -> *_rpn.pkl
  3. SNIPER training: USE_NEG_CHIPS on the phase-2 proposals +
     AutoFocus FocusPixel head, flagship 3-scale pyramid, 512^2 chips,
     b16 — run to epoch 4, then RESUMED from the epoch-4 checkpoint in
     a fresh in-process run to epoch 8 (exercises begin_epoch restore)
  4. full-pyramid 3-scale inference -> aggregate -> native COCO eval
  5. AutoFocus coarse-to-fine inference (learned FocusPixel maps,
     chip pruning) -> AP + learned percent-of-pixels

Per-phase wall-clock, peak RSS, chips/epoch and APs land in
<workdir>/campaign_summary.json (quote them in ARCHITECTURE.md).
Resumable: each phase is skipped when its artifact exists.

  python scripts/run_minicoco_campaign.py [workdir] [n_images] [--mask]

--mask additionally trains/evals the mask branch against the datagen's
L-shaped polygons (segm AP at scale; use a fresh workdir — the mask
checkpoint topology differs).

Memory note: the phases are idempotent and individually skipped once
their artifacts exist, and that is also the memory-isolation story —
one process running ALL phases keeps the training phases' high-water
mapped (glibc does not return freed arenas; the 300-image --mask run
measured 66 GB after phase 3 and OOM-killed at 130 GB in phase 5).
When a run dies or RSS is a concern, simply re-invoke the script: the
fresh process resumes at the first incomplete phase with an eval-only
footprint (~10-15 GB).
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO = "/root/reference/data/demo/demo.jpg"
N_IMAGES = 300
END_EPOCH = 8
RESUME_AT = 4
CLASSES = [(1, "alpha"), (2, "bravo"), (3, "charlie"), (4, "delta")]


def make_minicoco(workdir, n_images=N_IMAGES, seed=0):
    """300 composite images with a COCO-like size distribution.

    Backgrounds: random crops/resizes of the demo street scene (real
    JPEG statistics), mildly jittered. Objects: 8 fixed prototype
    patches cut from distinct regions of the same photo (2 per class —
    classes are visually separable the way COCO categories are),
    pasted at log-uniform target sizes spanning [16, 340] px so the
    flagship VALID_RANGES [(-1,80),(32,150),(120,-1)] all see
    training signal. Deterministic in ``seed``.
    """
    import cv2

    ann_path = os.path.join(workdir, "coco", "annotations",
                            "instances_minicoco.json")
    if os.path.exists(ann_path):
        return ann_path
    im = cv2.imread(DEMO, cv2.IMREAD_COLOR)
    h0, w0 = im.shape[:2]  # 426 x 640
    rng = np.random.RandomState(seed)

    # 8 prototype patches, 2 per class, from fixed photo regions with
    # distinct content; a per-class hue shift makes classes separable
    protos = []
    regions = [(20, 20, 140, 140), (300, 40, 430, 170),
               (480, 60, 600, 180), (60, 220, 190, 350),
               (240, 180, 370, 310), (420, 240, 560, 380),
               (150, 90, 280, 220), (500, 200, 620, 320)]
    for k, (x1, y1, x2, y2) in enumerate(regions):
        patch = im[y1:y2, x1:x2].copy()
        cls = k % 4 + 1
        hsv = cv2.cvtColor(patch, cv2.COLOR_BGR2HSV).astype(np.int32)
        hsv[..., 0] = (hsv[..., 0] + 40 * (cls - 1)) % 180
        patch = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
        protos.append((cls, patch))

    img_dir = os.path.join(workdir, "coco", "minicoco")
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(1, n_images + 1):
        if i % 3 == 0:
            w, h = 480, 640
        else:
            w, h = 640, 480
        # background: random sub-crop of the photo, resized up
        cw = rng.randint(w0 // 2, w0)
        chh = rng.randint(h0 // 2, h0)
        cx = rng.randint(0, w0 - cw)
        cy = rng.randint(0, h0 - chh)
        bg = cv2.resize(im[cy:cy + chh, cx:cx + cw], (w, h))
        bg = cv2.convertScaleAbs(bg, alpha=rng.uniform(0.8, 1.1),
                                 beta=rng.uniform(-15, 15))
        n_obj = rng.randint(3, 8)
        placed = []
        for _ in range(n_obj):
            cls, patch = protos[rng.randint(len(protos))]
            # log-uniform sizes 16..340: ~half the mass under 80px like
            # COCO's small-object-heavy distribution
            size = int(np.exp(rng.uniform(np.log(16), np.log(340))))
            size = min(size, min(w, h) - 8)
            ph, pw = patch.shape[:2]
            sw = size
            sh = max(8, int(size * ph / pw))
            sh = min(sh, h - 4)
            x = rng.randint(0, w - sw)
            y = rng.randint(0, h - sh)
            # reject >60%-area overlap with an existing object (keeps
            # GT boxes mostly visible, like real scenes)
            box = (x, y, x + sw, y + sh)
            ok = True
            for (px1, py1, px2, py2, _) in placed:
                ix = max(0, min(box[2], px2) - max(box[0], px1))
                iy = max(0, min(box[3], py2) - max(box[1], py1))
                if ix * iy > 0.6 * sw * sh:
                    ok = False
                    break
            if not ok:
                continue
            bg[y:y + sh, x:x + sw] = cv2.resize(patch, (sw, sh))
            placed.append((x, y, x + sw, y + sh, cls))
        cv2.imwrite(os.path.join(img_dir, f"im{i}.jpg"), bg)
        images.append({"id": i, "width": w, "height": h,
                       "file_name": f"im{i}.jpg"})
        for x1, y1, x2, y2, cls in placed:
            # L-shaped polygon covering 5/8 of the box (full-width top
            # quarter + left-half bottom): used only by the --mask
            # campaign variant, where segm IoU must genuinely diverge
            # from bbox IoU (tests/test_mask_autofocus_smoke.py is the
            # 4-image version of the same discrimination)
            xm = (x1 + x2) / 2.0
            yq = y1 + (y2 - y1) / 4.0
            anns.append({
                "id": aid, "image_id": i, "category_id": cls,
                "iscrowd": 0, "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": float((x2 - x1) * (y2 - y1)),
                "segmentation": [[float(v) for v in
                                  (x1, y1, x2, y1, x2, yq, xm, yq,
                                   xm, y2, x1, y2)]],
            })
            aid += 1
    os.makedirs(os.path.dirname(ann_path), exist_ok=True)
    with open(ann_path, "w") as f:
        json.dump({
            "images": images, "annotations": anns,
            "categories": [{"id": c, "name": n} for c, n in CLASSES],
        }, f)
    sizes = [np.sqrt(a["area"]) for a in anns]
    print(f"minicoco: {len(images)} images, {len(anns)} objects, "
          f"sqrt-area p10/p50/p90 = "
          f"{np.percentile(sizes, [10, 50, 90]).round(1).tolist()}",
          flush=True)
    return ann_path


def write_cfg(workdir):
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
  ANCHOR_SCALES: [2, 4, 7, 10, 13, 16, 24]
  NUM_ANCHORS: 21
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
  SCALES: [[1400, 2000], [800, 1280], [-1, 512]]
  VALID_RANGES: [[-1, 80], [32, 150], [120, -1]]
  CHIP_SIZE: 512
  bf16: true
  lr: 0.01
  lr_step: '6'
  warmup: true
  warmup_lr: 0.001
  warmup_step: 100
  wd: 0.0001
  begin_epoch: 0
  end_epoch: {END_EPOCH}
  FLIP: true
  SHUFFLE: true
  BATCH_IMAGES: 16
  RPN_BATCH_SIZE: 256
  RPN_POSITIVE_OVERLAP: 0.5
  RPN_NEGATIVE_OVERLAP: 0.4
  RPN_PRE_NMS_TOP_N: 6000
  RPN_POST_NMS_TOP_N: 300
TEST:
  MAX_PER_IMAGE: 50
  SCALES: [[1400, 2000], [800, 1280], [480, 512]]
  BATCH_IMAGES: [4, 8, 8]
  VALID_RANGES: [[-1, 90], [32, 180], [75, -1]]
  RPN_PRE_NMS_TOP_N: 6000
  RPN_POST_NMS_TOP_N: 300
  N_PROPOSAL_PER_SCALE: [300, 200, 100]
  NMS: -1
  NMS_SIGMA: 0.55
  TEST_EPOCH: {END_EPOCH}
  USE_CACHE: [false, false, false]
"""
    p = os.path.join(workdir, "minicoco_campaign.yml")
    with open(p, "w") as f:
        f.write(cfg_yml)
    return p


# AutoFocus test-time overrides: coarse -> fine scale order with
# map-driven chip pruning (mirrors configs/sniper_res101_e2e_autofocus)
AF_TEST = [
    "TEST.SCALES", "[[480, 512], [800, 1280], [1400, 2000]]",
    "TEST.BATCH_IMAGES", "[8, 8, 4]",
    "TEST.VALID_RANGES", "[[75, -1], [32, 180], [-1, 90]]",
    "TEST.N_PROPOSAL_PER_SCALE", "[100, 200, 300]",
    "TEST.AUTO_FOCUS", "True",
    "TEST.DO_PRUNING", "[False, True, True]",
    "TEST.CHIP_HYPERPARAMS", "[[3, 0.02, 16], [3, 0.2, 20], [-1, -1, -1]]",
]


# extra --set overrides appended to EVERY CLI call — the shrunken slow
# test (tests/test_minicoco_campaign.py) uses this to scale the pyramid
# down to CPU-sized canvases while driving the identical phase flow
EXTRA_SET: list = []


def run(argv):
    import main_test
    import main_train

    argv = list(argv)
    if EXTRA_SET:
        argv += EXTRA_SET if "--set" in argv else ["--set", *EXTRA_SET]
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
    import resource

    import main_test

    # --mask: train/eval the mask branch too (TRAIN.WITH_MASK; the
    # datagen's L-shaped polygons become live GT) — phases 4/5 then
    # also report segm AP through evaluate_segmentations
    argv = [a for a in sys.argv if a != "--mask"]
    with_mask = len(argv) != len(sys.argv)
    workdir = argv[1] if len(argv) > 1 else "/tmp/minicoco"
    n_images = int(argv[2]) if len(argv) > 2 else N_IMAGES
    os.makedirs(workdir, exist_ok=True)
    summary_path = os.path.join(workdir, "campaign_summary.json")
    summary = (json.load(open(summary_path))
               if os.path.exists(summary_path) else {})
    timings = summary.setdefault("phase_seconds", {})

    def phase(tag, fn, skip_if=False):
        if skip_if:
            print(f"== {tag}: artifact present, skipped ==", flush=True)
            return
        print(f"== {tag} ==", flush=True)
        t0 = time.time()
        fn()
        timings[tag] = round(time.time() - t0, 1)
        # ru_maxrss is monotonic per process; max() keeps the campaign-
        # wide peak across resumed runs in fresh processes
        summary["peak_rss_mb"] = max(
            summary.get("peak_rss_mb", 0.0),
            round(resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
        )
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=1, default=float)
        print(f"== {tag}: {timings[tag]}s (peak RSS "
              f"{summary['peak_rss_mb']} MB) ==", flush=True)

    phase("0_dataset", lambda: make_minicoco(workdir, n_images))
    cfg_path = write_cfg(workdir)
    props_dir = os.path.join(workdir, "props")

    have_props = bool(glob.glob(os.path.join(props_dir, "*_rpn.pkl")))
    phase("1_rpn_train", lambda: run(
        ["main_train.py", "--cfg", cfg_path, "--set",
         "TRAIN.ONLY_PROPOSAL", "True", "TRAIN.end_epoch", "2",
         "TEST.TEST_EPOCH", "2"]), skip_if=have_props)
    phase("2_extract_props", lambda: run(
        ["main_test.py", "--cfg", cfg_path, "--set",
         "TEST.EXTRACT_PROPOSALS", "True", "TRAIN.ONLY_PROPOSAL", "True",
         "TRAIN.end_epoch", "2", "TEST.TEST_EPOCH", "2",
         "TEST.PROPOSAL_SAVE_PATH", props_dir]), skip_if=have_props)
    pkls = glob.glob(os.path.join(props_dir, "*_rpn.pkl"))
    assert pkls, "phase 2 must write the proposal pkl"
    with open(pkls[0], "rb") as f:
        props = pickle.load(f)["boxes"]
    summary["n_images"] = len(props)
    summary["props_per_img_p50"] = float(
        np.median([p.shape[0] for p in props]))

    # phase 3: SNIPER + neg chips + AutoFocus head, with a REAL resume:
    # first run stops at epoch 4; a fresh run restores its checkpoint
    sniper = ["TRAIN.USE_NEG_CHIPS", "True", "TRAIN.AUTO_FOCUS", "True"]
    if with_mask:
        sniper += ["TRAIN.WITH_MASK", "True"]
    # phase 1 (RPN-only) saves checkpoints up to epoch 2 into the SAME
    # output tree; a resume point <= 2 would make the globs below match
    # the RPN-only checkpoint and phase 3b would restore the wrong
    # topology (found by the shrunken campaign test at RESUME_AT=2)
    assert RESUME_AT > 2, "RESUME_AT must exceed phase 1's 2 epochs"
    done = glob.glob(os.path.join(workdir, "output", "**", "checkpoints",
                                  str(END_EPOCH)), recursive=True)
    mid = glob.glob(os.path.join(workdir, "output", "**", "checkpoints",
                                 str(RESUME_AT)), recursive=True)
    phase("3a_sniper_train_to_4", lambda: run(
        ["main_train.py", "--cfg", cfg_path, "--set", *sniper,
         "TRAIN.end_epoch", str(RESUME_AT)]),
        skip_if=bool(done or mid))
    phase("3b_resume_4_to_8", lambda: run(
        ["main_train.py", "--cfg", cfg_path, "--set", *sniper,
         "TRAIN.begin_epoch", str(RESUME_AT)]),
        skip_if=bool(done))
    done = glob.glob(os.path.join(workdir, "output", "**", "checkpoints",
                                  str(END_EPOCH)), recursive=True)
    assert done, f"phase 3 must leave an epoch-{END_EPOCH} checkpoint"

    # chips/epoch (instrumentation, not part of phase timing)
    if "chips_per_epoch" not in summary:
        import main_train

        from sniper_tpu.config import load_config
        from sniper_tpu.data.loader import ChipLoader
        from sniper_tpu.utils.logger import create_logger

        cfg3 = load_config(cfg_path, sniper + EXTRA_SET)
        lg, _ = create_logger(os.path.join(workdir, "output"),
                              "minicoco_campaign", "probe")
        roidb = main_train.build_roidb(cfg3, lg)
        t0 = time.time()
        loader = ChipLoader(roidb, cfg3,
                            batch_size=int(cfg3.TRAIN.BATCH_IMAGES), seed=0)
        n_chips = loader.reset()
        summary["chips_per_epoch"] = int(n_chips)
        summary["reroll_seconds"] = round(time.time() - t0, 1)
        summary["neg_chips_total"] = int(
            sum(len(r.get("neg_chips", [])) for r in roidb))
        assert summary["neg_chips_total"] > 0, "no neg chips mined"
        del loader, roidb

    # phases 4/5: eval. Capture run_detection's stats return.
    caught = {}
    orig_det = main_test.run_detection

    def det(*a, **kw):
        caught["stats"] = orig_det(*a, **kw)
        return caught["stats"]

    main_test.run_detection = det

    # learned %-pixels tap (reference chips_inference.py:171-172 proxy)
    from sniper_tpu.chips import autofocus as af_mod

    pct = {}
    orig_add = af_mod.add_chips

    def tap_add(roidb, maps, scale_idx, cfg):
        out = orig_add(roidb, maps, scale_idx, cfg)
        if out is not None:  # [chip_area, total_area] in Mpx
            pct[scale_idx] = 100.0 * out[0] / max(out[1], 1e-9)
        return out

    try:
        if "ap_full_pyramid" not in summary:
            # TRAIN.AUTO_FOCUS=True (+WITH_MASK for the mask variant)
            # so the test-mode model is built with every head the
            # phase-3 checkpoint trained (TEST.AUTO_FOCUS stays false:
            # no pruning, maps unused)
            heads_on = ["TRAIN.AUTO_FOCUS", "True"] + (
                ["TRAIN.WITH_MASK", "True"] if with_mask else [])
            phase("4_test_full_pyramid", lambda: run(
                ["main_test.py", "--cfg", cfg_path, "--set", *heads_on]))
            summary["ap_full_pyramid"] = caught["stats"]
            # persist NOW: phase() only dumps at phase end, and losing
            # this to a later-phase crash forces an 8-minute re-eval
            # (learned from the --mask run's phase-5 OOM)
            with open(summary_path, "w") as f:
                json.dump(summary, f, indent=1, default=float)
        af_mod.add_chips = tap_add
        heads_on = ["TRAIN.AUTO_FOCUS", "True"] + (
            ["TRAIN.WITH_MASK", "True"] if with_mask else [])
        phase("5_test_autofocus", lambda: run(
            ["main_test.py", "--cfg", cfg_path, "--set",
             *heads_on, *AF_TEST]))
        summary["ap_autofocus"] = caught["stats"]
        summary["autofocus_pct_pixels"] = {
            str(k): round(v, 1) for k, v in pct.items()}
    finally:
        main_test.run_detection = orig_det
        af_mod.add_chips = orig_add

    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1, default=float)
    print("== campaign summary ==", flush=True)
    print(json.dumps(summary, indent=1, default=float), flush=True)


if __name__ == "__main__":
    main()
