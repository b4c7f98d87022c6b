"""Host-only bench of Tester.aggregate: multi-scale merge + soft-NMS.

Synthesizes the worst-case detection structure a random-init network
produces (every class ~full candidate lists at every scale) and times
the final aggregation — the step the reference hands to a Pool(32)
(/root/reference/lib/inference.py:159). No TPU needed.

  python scripts/bench_aggregate.py [--images 32] [--per-chip 300]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLASSES = 81
N_SCALES = 3


def synth_scale_dets(rng, num_images, per_chip, num_classes=N_CLASSES):
    """all_boxes[cls][img][chip] -> [N,5], the get_detections layout."""
    scale_dets = []
    for s in range(N_SCALES):
        all_boxes = [
            [
                [None]
                for _ in range(num_images)
            ]
            for _ in range(num_classes)
        ]
        for i in range(num_images):
            for j in range(1, num_classes):
                n = rng.randint(per_chip // 2, per_chip)
                c = rng.uniform(60, 420, (4, 2))[rng.randint(4, size=n)]
                wh = rng.uniform(15, 90, (n, 2)).astype(np.float32)
                d = np.zeros((n, 5), np.float32)
                d[:, 0] = c[:, 0] - wh[:, 0] / 2
                d[:, 1] = c[:, 1] - wh[:, 1] / 2
                d[:, 2] = c[:, 0] + wh[:, 0] / 2
                d[:, 3] = c[:, 1] + wh[:, 1] / 2
                d[:, 4] = rng.uniform(0.001, 0.05, n)
                all_boxes[j][i] = [d]
        scale_dets.append(all_boxes)
    return scale_dets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--per-chip", type=int, default=100)
    args = ap.parse_args()

    from sniper_tpu.config import default_config
    from sniper_tpu.infer.tester import Tester

    cfg = default_config()
    cfg.TEST.SCALES = [(480, 512), (800, 1280), (1400, 2000)]
    cfg.TEST.VALID_RANGES = [(75, -1), (32, 180), (-1, 75)]
    cfg.TEST.NMS = -1
    cfg.TEST.NMS_SIGMA = 0.55
    cfg.TEST.MAX_PER_IMAGE = 200

    rng = np.random.RandomState(0)
    scale_dets = synth_scale_dets(rng, args.images, args.per_chip)
    tester = Tester(None, cfg, N_CLASSES)

    tester.aggregate(scale_dets, args.images)  # warm
    t0 = time.perf_counter()
    out = tester.aggregate(scale_dets, args.images)
    dt = time.perf_counter() - t0
    kept = sum(
        out[j][i].shape[0]
        for j in range(1, N_CLASSES) for i in range(args.images)
    )
    print(json.dumps({
        "metric": "aggregate_s",
        "images": args.images, "per_chip": args.per_chip,
        "seconds": round(dt, 3),
        "ms_per_image": round(dt / args.images * 1e3, 1),
        "kept": kept,
    }))


if __name__ == "__main__":
    main()
