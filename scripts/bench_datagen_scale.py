"""Datagen at dataset scale: epoch re-roll + loader on a synthetic
100k-image roidb (BASELINE config #5, OpenImages-scale streaming).

The per-epoch ChipLoader.reset() re-extracts chips for the FULL roidb
in memory (the reference does the same with a Pool(64),
MNIteratorE2E.py:47-69); this measures whether that design survives
dataset scale on one host:

  - reset() wall-clock + chips/s over N synthetic images,
  - peak RSS (ru_maxrss) after roidb build and after reset,
  - marginal per-image roidb + chip-state memory (so 1.7M-image
    OpenImages RAM needs can be extrapolated),
  - sample-assembly throughput on a slice of the epoch (synthetic
    in-memory "images": isolates chip crop/resize + anchor targets
    from JPEG decode, which bench_loader.py measures with real files).

  python scripts/bench_datagen_scale.py [--images 100000] [--threads 8]

Prints one JSON line; record the result in ARCHITECTURE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def make_roidb(n, rng):
    """COCO-shaped synthetic roidb: ~7 gts/image, mixed orientations.
    No image files — reset() never touches pixels."""
    roidb = []
    for i in range(n):
        w, h = (640, 480) if i % 3 else (480, 640)
        n_gt = 4 + int(rng.poisson(3))
        x1 = rng.uniform(0, w - 200, n_gt)
        y1 = rng.uniform(0, h - 200, n_gt)
        s = rng.uniform(8, 300, n_gt)
        boxes = np.stack(
            [x1, y1, np.minimum(x1 + s, w - 1), np.minimum(y1 + s, h - 1)], 1
        ).astype(np.float32)
        roidb.append({
            "image": f"synthetic_{i}.jpg", "width": w, "height": h,
            "boxes": boxes, "max_overlaps": np.ones(n_gt, np.float32),
            "max_classes": rng.randint(1, 81, n_gt).astype(np.float32),
            "flipped": False,
        })
    return roidb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=100_000)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--processes", type=int, default=0,
                    help="TRAIN.NUM_PROCESS for the re-roll (reference "
                         "Pool(64) analog; 0 = in-process)")
    ap.add_argument("--assembly-slots", type=int, default=256)
    args = ap.parse_args()

    from sniper_tpu.config import default_config
    from sniper_tpu.data.loader import ChipLoader

    rng = np.random.RandomState(0)
    rss0 = rss_mb()
    t0 = time.perf_counter()
    roidb = make_roidb(args.images, rng)
    t_roidb = time.perf_counter() - t0
    rss_roidb = rss_mb()

    cfg = default_config()
    cfg.TRAIN.SCALES = [(1400, 2000), (800, 1280), (-1, 512)]
    cfg.TRAIN.VALID_RANGES = [(-1, 80), (32, 150), (120, -1)]
    cfg.TRAIN.CHIP_SIZE = 512
    cfg.TRAIN.USE_NEG_CHIPS = False
    cfg.TRAIN.NUM_THREAD = args.threads
    cfg.TRAIN.NUM_PROCESS = args.processes

    # synthetic in-memory image: assembly cost without JPEG decode
    fake = rng.randint(0, 255, (640, 640, 3), dtype=np.uint8)

    def image_loader(path):
        return fake

    loader = ChipLoader(roidb, cfg, batch_size=16,
                        image_loader=image_loader, seed=0)
    t0 = time.perf_counter()
    n_chips = loader.reset()
    t_reset = time.perf_counter() - t0
    rss_reset = rss_mb()
    # steady-state epoch: with TRAIN.NUM_PROCESS the spawn pool now
    # persists across resets, so epoch 2+ skips interpreter startup
    t0 = time.perf_counter()
    loader.reset()
    t_reset2 = time.perf_counter() - t0

    n_slots = min(args.assembly_slots, len(loader.schedule))
    t0 = time.perf_counter()
    for pos in range(n_slots):
        loader._sample(pos)
    t_asm = time.perf_counter() - t0

    out = {
        "metric": "datagen_scale",
        "images": args.images,
        "threads": args.threads,
        "processes": args.processes,
        "roidb_build_s": round(t_roidb, 1),
        "reset_s": round(t_reset, 1),
        "reset2_s": round(t_reset2, 1),
        "chips": n_chips,
        "reset_chips_per_s": round(n_chips / t_reset, 1),
        "reset_images_per_s": round(args.images / t_reset, 1),
        "rss_base_mb": round(rss0, 1),
        "rss_roidb_mb": round(rss_roidb, 1),
        "rss_after_reset_mb": round(rss_reset, 1),
        "kb_per_image_roidb": round(
            (rss_roidb - rss0) * 1024 / args.images, 2),
        "kb_per_image_chipstate": round(
            (rss_reset - rss_roidb) * 1024 / args.images, 2),
        "assembly_chips_per_s": round(n_slots / t_asm, 1),
        "extrapolated_1p7m_rss_gb": round(
            (rss0 + (rss_reset - rss0) * 1.7e6 / args.images) / 1024, 1),
        "extrapolated_1p7m_reset_min": round(
            t_reset * 1.7e6 / args.images / 60, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
