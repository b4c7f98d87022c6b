"""Train-step throughput on the real TPU: flagship R101, 16 chips/step.

  python scripts/bench_train.py [--batch 16] [--chip 512]
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
    batch = {
        "data": rng.randn(b, chip, chip, 3).astype(np.float32),
        "im_info": np.tile([[chip, chip, 1.0]], (b, 1)).astype(np.float32),
        "gt_boxes": gt,
        "valid_ranges": np.tile([[0.0, float(chip)]], (b, 1)).astype(np.float32),
        "label": rng.choice([-1.0, 0.0, 1.0], (b, A * fh * fw),
                            p=[0.9, 0.08, 0.02]).astype(np.float32),
        "bbox_target": (rng.randn(b, 4 * A, fh, fw) * 0.1).astype(np.float32),
        "bbox_weight": np.zeros((b, 4 * A, fh, fw), np.float32),
    }

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
        # the registry's "auto" resolution for single-TPU training: the
        # fused Pallas pool + hand-written VJP (237 -> 173.8 ms/step)
        pool_kernel=(
            "fused" if jax.default_backend() in ("tpu", "axon")
            else "einsum"
        ),
    )
    mesh = make_mesh(1)
    state = create_train_state(model, cfg, batch, optax.sgd(0.1))
    tx, _ = make_optimizer(cfg, epoch_size=1000, params=state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, mesh, batch_images_per_device=b)

    sharded = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(0)
    state, metrics = step(state, sharded, key)  # compile
    print(f"warmup loss={float(metrics['loss']):.3f}", file=sys.stderr,
          flush=True)

    n = 6
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            state, metrics = step(state, sharded, sub)
        # force completion via a small host fetch
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / n)

    # train MFU anchor: XLA cost analysis of the full fwd+bwd+SGD
    # program vs the chip's dense bf16 peak (same method as bench.py)
    peak_by_kind = {
        "TPU v4": 275e12, "TPU v5 lite": 197e12, "TPU v5e": 197e12,
        "TPU v5": 459e12, "TPU v5p": 459e12, "TPU v6 lite": 918e12,
        "TPU v6e": 918e12,
    }
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peak_by_kind.items() if k in kind), 197e12)
    flops = None
    try:
        cost = step.lower(state, sharded, key).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    out = {
        "metric": "train_step_r101",
        "batch": b, "chip": chip,
        "step_ms": round(best * 1e3, 1),
        "img_per_s": round(b / best, 2),
    }
    if flops:
        out["step_tflops"] = round(flops / 1e12, 2)
        out["train_mfu"] = round(flops / best / peak, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
