"""Host input-pipeline throughput bench: ChipLoader chips/sec, standalone.

The device train step consumes ~35 chips/s (16-chip batch, see
ARCHITECTURE.md); the loader must sustain >=2x that or training is
host-bound. This times full ChipLoader epochs over real JPEG files
(written once to a temp dir, so cv2.imread/decode cost is real) at
several TRAIN.NUM_THREAD settings and prints chips/s for each.

Reference analog: MNIteratorE2E's Pool(64) anchor workers +
ThreadPool(8) imread (/root/reference/lib/iterators/MNIteratorE2E.py:139,173).

  python scripts/bench_loader.py [--images 64] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_image_files(tmpdir, n, rng):
    import cv2

    paths = []
    for i in range(n):
        # COCO-ish sizes; mix orientations
        w, h = (640, 480) if i % 3 else (480, 640)
        im = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        # smooth a bit so JPEG decode cost is realistic (noise inflates it)
        im = cv2.GaussianBlur(im, (11, 11), 5)
        p = os.path.join(tmpdir, f"im{i}.jpg")
        cv2.imwrite(p, im)
        paths.append((p, w, h))
    return paths


def make_roidb(paths, rng):
    roidb = []
    for p, w, h in paths:
        n_gt = 8
        x1 = rng.uniform(0, w - 200, n_gt)
        y1 = rng.uniform(0, h - 200, n_gt)
        s = rng.uniform(16, 180, n_gt)
        boxes = np.stack(
            [x1, y1, np.minimum(x1 + s, w - 1), np.minimum(y1 + s, h - 1)], 1
        ).astype(np.float32)
        roidb.append({
            "image": p, "width": w, "height": h, "boxes": boxes,
            "max_overlaps": np.ones(n_gt), "max_classes": rng.randint(1, 81, n_gt),
            "flipped": False,
        })
    return roidb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--threads", type=int, nargs="*", default=[1, 4, 8, 16])
    args = ap.parse_args()

    from sniper_tpu.config import default_config
    from sniper_tpu.data.loader import ChipLoader

    rng = np.random.RandomState(0)
    results = {}
    with tempfile.TemporaryDirectory() as td:
        paths = make_image_files(td, args.images, rng)
        roidb = make_roidb(paths, rng)
        for nt in args.threads:
            cfg = default_config()
            cfg.TRAIN.SCALES = [(1400, 2000), (800, 1280), (-1, 512)]
            cfg.TRAIN.VALID_RANGES = [(-1, 80), (32, 150), (120, -1)]
            cfg.TRAIN.USE_NEG_CHIPS = False
            cfg.TRAIN.NUM_THREAD = nt
            loader = ChipLoader(roidb, cfg, batch_size=args.batch, seed=0)
            t_reset0 = time.perf_counter()
            loader.reset()
            t_reset = time.perf_counter() - t_reset0
            # warm epoch (page cache, pool spin-up)
            for _ in loader:
                pass
            t0 = time.perf_counter()
            n = 0
            for batch in loader:
                n += batch["data"].shape[0]
            dt = time.perf_counter() - t0
            results[nt] = {
                "chips_per_s": round(n / dt, 2),
                "reset_s": round(t_reset, 3),
                "chips": n,
            }
            print(f"NUM_THREAD={nt:3d}: {n / dt:8.2f} chips/s "
                  f"(epoch {dt:.2f}s, reset {t_reset:.3f}s, {n} chips)")
    print(json.dumps({"loader_bench": results}))


if __name__ == "__main__":
    main()
