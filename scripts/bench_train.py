"""Train-step throughput on the real TPU: flagship R101, 16 chips/step.

Thin CLI over bench._bench_train_step — the SAME workload the driver
bench captures as train_* fields in BENCH_r*.json, so the two can't
drift apart.

  python scripts/bench_train.py [--batch 16] [--chip 512]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chip", type=int, default=512)
    args = ap.parse_args()

    import jax

    import bench

    peak = bench.resolve_peak(jax.devices()[0].device_kind, 197e12)
    out = bench._bench_train_step(peak, b=args.batch, chip=args.chip)
    print(json.dumps({"metric": "train_step_r101", **out}))


if __name__ == "__main__":
    main()
