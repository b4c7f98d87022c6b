"""A/B the train step INCLUDING host->device batch transfer: fp32 vs
uint8 data canvases (ChipLoader's two modes), on the real TPU.

scripts/bench_train.py pre-stages the batch on device, so its step time
excludes the per-step transfer a real training run pays. This drives
the same flagship step with a FRESH host batch shipped every iteration
(shard_batch -> device_put), comparing the fp32 pipeline (50.3 MB/step
data at batch 16) against the uint8 pipeline (12.6 MB + on-device
normalization). Same process, scalar-forced timing (relay discipline).

  python scripts/profile_transfer.py [--batch 16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chip", type=int, default=512)
    ap.add_argument("--sparse_only", action="store_true")
    ap.add_argument("--sync_metrics", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from sniper_tpu.config import default_config
    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.parallel.mesh import make_mesh, shard_batch
    from sniper_tpu.train.optimizer import make_optimizer
    from sniper_tpu.train.trainer import create_train_state, make_train_step

    b, chip = args.batch, args.chip
    A = 21
    fh = fw = chip // 16
    rng = np.random.RandomState(0)
    gt = np.full((b, 100, 5), -1.0, np.float32)
    gt[:, 0] = [40, 40, 200, 200, 2]
    gt[:, 1] = [250, 250, 400, 420, 7]

    def host_batch(uint8, sparse=False):
        base = {
            "im_info": np.tile([[chip, chip, 1.0]], (b, 1)).astype(np.float32),
            "gt_boxes": gt,
            "valid_ranges": np.tile([[0.0, float(chip)]], (b, 1)).astype(
                np.float32),
        }
        if sparse:
            pids = np.sort(rng.choice(A * fh * fw, (b, 256), replace=False
                                      if A * fh * fw >= 256 else True), axis=1)
            base["rpn_pids"] = pids.astype(np.int32)
            base["rpn_label_vals"] = rng.choice(
                [0.0, 1.0], (b, 256), p=[0.6, 0.4]).astype(np.float32)
            base["fg_pids"] = pids[:, :128].astype(np.int32)
            base["fg_targets"] = (rng.randn(b, 128, 4) * 0.1).astype(
                np.float32)
        else:
            base["label"] = rng.choice(
                [-1.0, 0.0, 1.0], (b, A * fh * fw),
                p=[0.9, 0.08, 0.02]).astype(np.float32)
            base["bbox_target"] = (rng.randn(b, 4 * A, fh, fw) * 0.1).astype(
                np.float32)
            base["bbox_weight"] = np.zeros((b, 4 * A, fh, fw), np.float32)
        if uint8:
            base["data"] = rng.randint(0, 255, (b, chip, chip, 3)).astype(
                np.uint8)
            base["data_extent"] = np.tile([[chip, chip]], (b, 1)).astype(
                np.float32)
        else:
            base["data"] = rng.randn(b, chip, chip, 3).astype(np.float32)
        return base

    cfg = default_config()
    cfg.TRAIN.lr = 0.015
    cfg.TRAIN.warmup = False
    cfg.TRAIN.lr_step = ""
    cfg.network.FIXED_PARAMS = ["conv0", "bn0", "stage1", "bn_data"]
    model = SNIPERDetector(
        num_classes=81, num_anchors=A,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24), anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3), dtype=jnp.bfloat16,
        train_pre_nms=6000, train_post_nms=300, num_rois=300,
    )
    mesh = make_mesh(1)
    state = create_train_state(model, cfg, host_batch(False), optax.sgd(0.1))
    tx, _ = make_optimizer(cfg, epoch_size=1000, params=state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, mesh, batch_images_per_device=b,
                           pixel_means=(103.939, 116.779, 123.68))

    key = jax.random.PRNGKey(0)
    results = {}
    variants = (
        ("fp32", False, False, False),
        ("uint8", True, False, False),
        ("uint8_sparse", True, True, False),
        # main_train.py's shipped pipeline: transfers issued from a
        # producer thread so the copy of batch N+1 overlaps step N
        ("uint8_sparse_staged", True, True, True),
    )
    if args.sparse_only:
        # one compile signature instead of three (each costs minutes
        # through the relay): A/B just inline vs thread-staged transfer
        variants = variants[2:]
    if args.sync_metrics:
        # the pre-round-2 main_train loop: float(metrics) EVERY step —
        # blocks the host on step N before batch N+1's transfer even
        # dispatches
        variants = (("uint8_sparse_syncmetrics", True, True, False),)
    for name, uint8, sparse, staged in variants:
        # compile for this input signature
        state, metrics = step(
            state, shard_batch(mesh, host_batch(uint8, sparse)), key
        )
        print(f"{name} warmup loss={float(metrics['loss']):.3f}",
              file=sys.stderr, flush=True)
        n = 6
        best = 1e9
        for rep in range(3):
            batches = [host_batch(uint8, sparse) for _ in range(n)]
            if staged:
                import queue
                import threading

                q: queue.Queue = queue.Queue(maxsize=2)

                def _produce(bs=batches, q=q):
                    for hb in bs:
                        q.put(shard_batch(mesh, hb))
                    q.put(None)

                t = threading.Thread(target=_produce, daemon=True)
                t0 = time.perf_counter()
                t.start()
                while True:
                    db = q.get()
                    if db is None:
                        break
                    key, sub = jax.random.split(key)
                    state, metrics = step(state, db, sub)
            else:
                t0 = time.perf_counter()
                for hb in batches:
                    key, sub = jax.random.split(key)
                    state, metrics = step(state, shard_batch(mesh, hb), sub)
                    if args.sync_metrics:
                        float(metrics["loss"])
            float(metrics["loss"])
            best = min(best, (time.perf_counter() - t0) / n)
        results[name] = round(best * 1e3, 1)
    if "fp32" in results:
        results["speedup"] = round(
            results["fp32"] / results["uint8_sparse"], 3)
    if "uint8_sparse_staged" in results:
        results["staging_speedup"] = round(
            results["uint8_sparse"] / results["uint8_sparse_staged"], 3)
    print(json.dumps({"metric": "train_step_with_transfer_ms",
                      "batch": b, **results}))


if __name__ == "__main__":
    main()
