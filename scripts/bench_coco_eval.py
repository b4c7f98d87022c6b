"""COCO-eval wall-clock at dataset scale (synthetic 5k x 80 classes).

The matching stage (_match_greedy) was the last scalar hot loop of the
eval path; this measures the end-to-end evaluate() wall-clock on a
synthetic COCO-sized workload: 5000 images, 80 classes, ~7 gts and
~20 detections per image (COCO val2017-ish densities).

  python scripts/bench_coco_eval.py [--images 5000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _FakeDS:
    def __init__(self, num_classes, anns_by_image):
        self.num_classes = num_classes
        self.classes = ["__background__"] + [
            f"c{i}" for i in range(1, num_classes)
        ]
        self.class_to_cat_id = {c: c for c in range(1, num_classes)}
        self.cat_id_to_class = {c: c for c in range(1, num_classes)}
        self.anns_by_image = anns_by_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5000)
    ap.add_argument("--classes", type=int, default=81)
    args = ap.parse_args()

    from sniper_tpu.data.coco_eval import COCOEvaluator

    rng = np.random.RandomState(0)
    N, K = args.images, args.classes
    anns, results, roidb = {}, [], []
    for im in range(N):
        roidb.append({"im_id": im, "height": 480, "width": 640})
        ims = []
        for _ in range(rng.poisson(7)):
            w, h = rng.uniform(8, 300, 2)
            x, y = rng.uniform(0, 600), rng.uniform(0, 440)
            ims.append({
                "category_id": int(rng.randint(1, K)),
                "bbox": [x, y, w, h], "area": w * h,
                "iscrowd": int(rng.rand() < 0.03),
            })
        anns[im] = ims
        # detections: jittered copies of gts + noise dets
        for g in ims:
            for _ in range(2):
                x, y, w, h = g["bbox"]
                j = rng.uniform(-8, 8, 4)
                results.append({
                    "image_id": im, "category_id": g["category_id"],
                    "bbox": [x + j[0], y + j[1], max(4, w + j[2]),
                             max(4, h + j[3])],
                    "score": float(rng.rand()),
                })
        for _ in range(rng.poisson(6)):
            w, h = rng.uniform(8, 200, 2)
            results.append({
                "image_id": im, "category_id": int(rng.randint(1, K)),
                "bbox": [rng.uniform(0, 600), rng.uniform(0, 440), w, h],
                "score": float(rng.rand() * 0.4),
            })

    ev = COCOEvaluator(_FakeDS(K, anns), roidb)
    t0 = time.perf_counter()
    stats = ev.evaluate(results)
    dt = time.perf_counter() - t0
    print(f"images={N} classes={K - 1} dets={len(results)} "
          f"eval wall-clock: {dt:.1f}s  (AP={stats['AP']:.3f})")


if __name__ == "__main__":
    main()
