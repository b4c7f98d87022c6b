"""Benchmark: multi-scale SNIPER ResNet-101 inference throughput on TPU.

Measures the reference's headline speed metric — images/sec through
multi-scale (3-scale) detection inference (reference: 5 img/s on one
V100, /root/reference/README.md:35) — end to end: jitted device forward
(trunk + RPN + MultiProposal + deformable-ROI head) for every scale,
device->host fetch of the detection outputs, and the host-side box
decode/rescale per image.

Synthetic 640x480 COCO-shaped images; per-scale canvases and batch sizes
follow the flagship config (sniper_res101_e2e.yml TEST section). All
batches of a round are dispatched before any output is fetched so
device work overlaps the (relay-expensive) transfers, mirroring how the
Tester drains batches. Prints one JSON line:
{"metric", "value", "unit", "vs_baseline"}.

The same line also carries the training-step numbers (train_step_ms /
train_img_per_s / train_mfu — flagship R101, 16 chips of 512^2 per
step, same workload as scripts/bench_train.py), so training perf
regressions are machine-visible in BENCH_r*.json, not just in
ARCHITECTURE.md quotes. The train section is best-effort: any failure
is reported in a train_error field without losing the headline metric.
"""

import json
import time

import numpy as np

# dense bf16 peak FLOP/s per chip (public specs) — shared with
# scripts/bench_train.py so the MFU denominators can't drift
PEAK_BF16_BY_KIND = {
    "TPU v4": 275e12, "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v5": 459e12, "TPU v5p": 459e12, "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def resolve_peak(device_kind: str, default=None):
    return next(
        (v for k, v in PEAK_BF16_BY_KIND.items() if k in device_kind),
        default,
    )


def main(trunk: str = "r101", batches=None, reps=None):
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.models.registry import default_pool_kernel
    from sniper_tpu.ops.boxes import bbox_pred, clip_boxes

    # driver runs `python bench.py` -> flagship R101; `python bench.py
    # {r50,mnv2,x101}` covers the other model families
    trunk_kw = {
        "r101": dict(units=(3, 4, 23, 3)),
        "r50": dict(units=(3, 4, 6, 3)),
        "mnv2": dict(trunk_type="mobilenetv2", head_fc_dim=512),
        "x101": dict(trunk_type="resnext", units=(3, 4, 23, 3),
                     num_trunk_groups=64),  # registry's resnext_mx_101
    }[trunk]
    def make_model(post_nms):
        return SNIPERDetector(
            num_classes=81,
            num_anchors=21,
            anchor_scales=(2, 4, 7, 10, 13, 16, 24),
            anchor_ratios=(0.5, 1, 2),
            dtype=jnp.bfloat16,
            pre_nms_top_n=6000,
            post_nms_top_n=post_nms,
            # single-chip inference: the composed-tent Pallas pool (what
            # network.POOL_KERNEL "auto" resolves to here; 1.3-2.0x the
            # einsum path at these canvases)
            pool_kernel=default_pool_kernel(),
            **trunk_kw,
        )

    # Per-scale settings come from the FLAGSHIP YML so the driver bench
    # always measures the shipped configuration (a retune that edits the
    # yml but not this file — or vice versa — would otherwise silently
    # bench something else). Fallbacks keep bench.py standalone.
    #   N_PROPOSAL_PER_SCALE: coarse scales only KEEP large detections
    #   (TEST.VALID_RANGES), so they don't need the finest scale's 300
    #   rois/img — the canvas-independent proposal+head work is the
    #   small-canvas MFU floor (scripts/profile_roi_floor.py sweep).
    #   BATCH_IMAGES: re-swept on v5e at the shipped per-scale roi
    #   counts (scripts/profile_batch_sweep.py).
    import os

    post_nms_per_scale = [300, 200, 100]
    yml_batches = [4, 8, 8]
    scale_ranges = [(1400, 2000), (800, 1280), (480, 512)]
    yml = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "configs", "sniper_res101_e2e.yml")
    if os.path.exists(yml):
        from sniper_tpu.config import load_config

        tcfg = load_config(yml).TEST
        post_nms_per_scale = [int(x) for x in tcfg.N_PROPOSAL_PER_SCALE]
        yml_batches = [int(x) for x in tcfg.BATCH_IMAGES]
        scale_ranges = [(int(lo), int(hi)) for lo, hi in tcfg.SCALES]

    models = [make_model(n) for n in post_nms_per_scale]
    model = models[0]  # init template (params independent of roi count)

    im_w, im_h = 640, 480
    scale_specs = []
    custom_batches = batches is not None
    batches = batches or yml_batches
    for (lo, hi), b in zip(scale_ranges, batches):
        s = lo / min(im_w, im_h)
        if round(s * max(im_w, im_h)) > hi:
            s = hi / max(im_w, im_h)
        h = int(np.round(im_h * s))
        w = int(np.round(im_w * s))
        ch = (h + 63) // 64 * 64
        cw = (w + 63) // 64 * 64
        scale_specs.append((ch, cw, b, s, h, w))

    rng = np.random.RandomState(0)

    from sniper_tpu.infer.tester import pack_detections, unpack_detections

    # variables passed as an argument, NOT closed over: captured arrays
    # would be embedded into the compile payload (HTTP 413 on the relay).
    # Outputs packed into one tensor: each host fetch costs a fixed
    # ~30ms relay round-trip, so 1 fetch/batch instead of 3.
    def make_fn(m):
        @jax.jit
        def fn(variables, data, im_info):
            return pack_detections(
                m.apply(variables, data, im_info, train=False)
            )

        return fn

    fns = [make_fn(m) for m in models]

    # Build device inputs + compile + warm up one scale at a time in
    # ASCENDING canvas size (forced completion via host fetch). Any other
    # ordering — largest program first, or pre-materializing every input
    # before the first run — crashes this TPU worker.
    import sys

    variables = None
    inputs = [None] * len(scale_specs)
    order = sorted(range(len(scale_specs)),
                   key=lambda i: scale_specs[i][0] * scale_specs[i][1])
    for i in order:
        ch, cw, b, s, h, w = scale_specs[i]
        data = jnp.asarray(rng.randn(b, ch, cw, 3).astype(np.float32))
        im_info = jnp.asarray(np.tile([[h, w, s]], (b, 1)).astype(np.float32))
        if variables is None:
            variables = model.init(
                {"params": jax.random.PRNGKey(0)}, data, im_info, train=False
            )
        print(f"warmup {data.shape} ...", file=sys.stderr, flush=True)
        out = fns[i](variables, data, im_info)
        np.asarray(out)
        print(f"warmup {data.shape} done", file=sys.stderr, flush=True)
        inputs[i] = (data, im_info, b, s)

    def host_post(out_np, im_info_np, s):
        rois, cls_prob, deltas = out_np
        for i in range(rois.shape[0]):
            boxes = bbox_pred(rois[i, :, 1:], deltas[i])
            clip_boxes(boxes, im_info_np[i][:2]) / s

    # per round: every image passes through all three scales, so each
    # scale's batch*reps must agree (default: 8 images = 2 batches of 4
    # at scale 0, 1 batch of 8 at scales 1/2). Rounds are
    # double-buffered — round N+1 is dispatched before round N's outputs
    # are fetched — so the fixed ~30ms/fetch relay cost overlaps device
    # compute, as it does in the streaming Tester.
    if reps is None:
        # smallest images/round that every scale's batch divides
        import math

        lcm = 1
        for b in batches:
            lcm = lcm * b // math.gcd(lcm, b)
        reps = [lcm // b for b in batches]
    per_round = {b * r for b, r in zip(batches, reps)}
    assert len(per_round) == 1, (batches, reps)
    images_per_round = per_round.pop()

    def dispatch_round():
        return [
            (fn_i(variables, data, im_info), im_info, s)
            for fn_i, (data, im_info, b, s), rep in zip(fns, inputs, reps)
            for _ in range(rep)
        ]

    def drain(outs):
        for out, im_info, s in outs:
            d = unpack_detections(np.asarray(out), 81)
            host_post((d["rois"], d["cls_prob"], d["bbox_pred"]),
                      np.asarray(im_info), s)

    n_rounds = 8
    t0 = time.perf_counter()
    pending = dispatch_round()
    for _ in range(n_rounds - 1):
        nxt = dispatch_round()
        drain(pending)
        pending = nxt
    drain(pending)
    images = n_rounds * images_per_round
    dt = time.perf_counter() - t0
    ips = images / dt

    # --- per-scale step time + FLOPs/MFU anchor -----------------------
    # XLA's own cost analysis gives the per-program FLOPs; relating the
    # measured time to the chip's bf16 peak quantifies "fast" (13 img/s
    # is meaningless without knowing the ceiling).
    kind = jax.devices()[0].device_kind
    peak = resolve_peak(kind)
    per_scale = []
    total_flops = 0.0
    for fn_i, post_nms, ((data, im_info, b, s), rep) in zip(
            fns, post_nms_per_scale, zip(inputs, reps)):
        flops = None
        try:
            # fn_i is already jitted: lower/compile hits the jit cache
            cost = fn_i.lower(variables, data,
                              im_info).compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        t1 = time.perf_counter()
        n_iter = 4
        for _ in range(n_iter):
            np.asarray(fn_i(variables, data, im_info))
        step_s = (time.perf_counter() - t1) / n_iter
        entry = {
            "canvas": list(data.shape[1:3]), "batch": b,
            "post_nms": post_nms,
            "step_ms": round(step_s * 1e3, 1),
            "img_per_s": round(b / step_s, 2),
        }
        if flops:
            total_flops += flops * rep
            entry["tflops"] = round(flops / 1e12, 2)
            entry["mfu"] = round(flops / step_s / (peak or 197e12), 4)
        per_scale.append(entry)
    mfu = round(total_flops / (dt / n_rounds) / (peak or 197e12), 4) \
        if total_flops else None

    import sys

    print(json.dumps({
        "device": kind, "peak_bf16_flops": peak,
        "per_scale": per_scale,
        "round_flops_T": round(total_flops / 1e12, 2),
        "pipeline_mfu": mfu,
    }), file=sys.stderr)

    result = {
        "metric": f"multiscale_inference_throughput_{trunk}",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / 5.0, 3),
    }
    # driver invocation: also capture training perf (skipped on custom
    # --batches A/B runs, which only compare the inference pipeline)
    if trunk == "r101" and not custom_batches:
        try:
            result.update(_bench_train_step(peak))
        except Exception as e:  # noqa: BLE001 — keep the headline metric
            result["train_error"] = f"{type(e).__name__}: {e}"
        try:
            result.update(_bench_train_pipeline())
        except Exception as e:  # noqa: BLE001 — keep the headline metric
            result["train_pipeline_error"] = f"{type(e).__name__}: {e}"
        try:
            result.update(_bench_autofocus())
        except Exception as e:  # noqa: BLE001 — keep the headline metric
            result["autofocus_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


def _bench_train_step(peak, b=16, chip=512):
    """Flagship R101 train-step numbers for the driver bench line.

    Same workload as scripts/bench_train.py: one jitted fwd+bwd+SGD
    step over ``b`` synthetic 512^2 chips (the flagship TRAIN config's
    batch), single chip. Returns the train_* fields merged into the
    bench JSON. Runs AFTER the inference section so every smaller
    program already exists (TPU-worker warmup-order constraint).
    """
    import sys
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from sniper_tpu.config import default_config
    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.models.registry import default_pool_kernel
    from sniper_tpu.parallel.mesh import make_mesh, shard_batch
    from sniper_tpu.train.optimizer import make_optimizer
    from sniper_tpu.train.trainer import create_train_state, make_train_step

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
        "valid_ranges": np.tile([[0.0, float(chip)]], (b, 1)).astype(
            np.float32),
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
        pool_kernel=default_pool_kernel(),
    )
    mesh = make_mesh(1)
    state = create_train_state(model, cfg, batch, optax.sgd(0.1))
    tx, _ = make_optimizer(cfg, epoch_size=1000, params=state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, mesh, batch_images_per_device=b)

    sharded = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(0)
    print("train warmup ...", file=sys.stderr, flush=True)
    state, metrics = step(state, sharded, key)  # compile
    print(f"train warmup loss={float(metrics['loss']):.3f}",
          file=sys.stderr, flush=True)

    n = 6
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            state, metrics = step(state, sharded, sub)
        float(metrics["loss"])  # force completion via a small host fetch
        best = min(best, (time.perf_counter() - t0) / n)

    out = {
        "train_step_ms": round(best * 1e3, 1),
        "train_img_per_s": round(b / best, 2),
        "train_batch": b, "train_chip": chip,
    }
    try:
        cost = step.lower(state, sharded, key).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) or None
        if flops:
            out["train_step_tflops"] = round(flops / 1e12, 2)
            out["train_mfu"] = round(flops / best / (peak or 197e12), 4)
    except Exception:
        pass
    return out


def _bench_train_pipeline(b=16, n_images=96, loader_process=False):
    """The rate a real training run pays, not the device ceiling.

    Runs the EXACT main_train.py inner loop — ChipLoader over real JPEG
    files (cv2 decode cost included), shard_batch issued from the
    Prefetcher's producer thread (so batch N+1's uint8 host->device
    transfer overlaps step N's compute), donated train step, metric
    scalars only materialized at the end — and reports
    train_pipeline_ms / train_pipeline_img_per_s next to the
    resident-batch train_step_ms numbers. The difference is the
    host+transfer overhead per step (reference analog: Speedometer
    measures the fed pipeline, /root/reference/main_train.py:138).
    """
    import itertools
    import sys
    import tempfile
    import time

    import cv2
    import jax
    import jax.numpy as jnp
    import optax

    from sniper_tpu.config import default_config
    from sniper_tpu.data.loader import ChipLoader, Prefetcher
    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.models.registry import default_pool_kernel
    from sniper_tpu.parallel.mesh import make_mesh, shard_batch
    from sniper_tpu.train.optimizer import make_optimizer
    from sniper_tpu.train.trainer import create_train_state, make_train_step

    rng = np.random.RandomState(0)

    # flagship TRAIN config (same knobs as _bench_train_step's device
    # program, plus the loader's): 512^2 chips, 3 scales, 21 anchors
    cfg = default_config()
    cfg.TRAIN.SCALES = [(1400, 2000), (800, 1280), (-1, 512)]
    cfg.TRAIN.VALID_RANGES = [(-1, 80), (32, 150), (120, -1)]
    cfg.TRAIN.USE_NEG_CHIPS = False  # no proposal pkl in a synthetic run
    cfg.TRAIN.BATCH_IMAGES = b
    cfg.TRAIN.lr = 0.015
    cfg.TRAIN.warmup = False
    cfg.TRAIN.lr_step = ""
    cfg.network.FIXED_PARAMS = ["conv0", "bn0", "stage1", "bn_data"]
    A = 21
    model = SNIPERDetector(
        num_classes=81, num_anchors=A,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24), anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3), dtype=jnp.bfloat16,
        train_pre_nms=6000, train_post_nms=300, num_rois=300,
        pool_kernel=default_pool_kernel(),
    )

    with tempfile.TemporaryDirectory() as td:
        # COCO-ish synthetic JPEGs (mixed orientation, smoothed so the
        # decode cost is realistic); GT sizes span all 3 valid ranges
        roidb = []
        for i in range(n_images):
            w, h = (640, 480) if i % 3 else (480, 640)
            im = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            im = cv2.GaussianBlur(im, (11, 11), 5)
            p = f"{td}/im{i}.jpg"
            cv2.imwrite(p, im)
            n_gt = 8
            x1 = rng.uniform(0, w - 200, n_gt)
            y1 = rng.uniform(0, h - 200, n_gt)
            s = rng.uniform(16, 180, n_gt)
            boxes = np.stack(
                [x1, y1, np.minimum(x1 + s, w - 1),
                 np.minimum(y1 + s, h - 1)], 1,
            ).astype(np.float32)
            roidb.append({
                "image": p, "width": w, "height": h, "boxes": boxes,
                "max_overlaps": np.ones(n_gt),
                "max_classes": rng.randint(1, 81, n_gt),
                "flipped": False,
            })

        if loader_process:
            from sniper_tpu.data.shm_loader import ProcessChipLoader

            loader = ProcessChipLoader(roidb, cfg, batch_size=b, seed=0)
        else:
            loader = ChipLoader(roidb, cfg, batch_size=b, seed=0)
        mesh = make_mesh(1)
        n_chips = loader.reset()
        sample = (loader.sample_batch() if hasattr(loader, "sample_batch")
                  else next(iter(loader)))
        state = create_train_state(model, cfg, sample, optax.sgd(0.1))
        tx, _ = make_optimizer(cfg, epoch_size=max(len(loader), 1),
                               params=state.params)
        state = state.replace(opt_state=tx.init(state.params))
        step_fn = make_train_step(
            model, tx, mesh, batch_images_per_device=b,
            rpn_batch_size=cfg.TRAIN.RPN_BATCH_SIZE,
            pixel_means=cfg.network.PIXEL_MEANS,
        )

        key = jax.random.PRNGKey(0)

        def run_epoch():
            nonlocal state, key
            # two-stage staging exactly like main_train: assembly and
            # upload in separate threads (serial staging measured
            # 934.9 ms/step vs ~420 upload + ~214 assembly + 175 step)
            host_batches = Prefetcher(iter(loader))
            staged = (shard_batch(mesh, bt) for bt in host_batches)
            pending = []
            n = 0
            for batch in Prefetcher(staged):
                key, sub = jax.random.split(key)
                state, metrics = step_fn(state, batch, sub)
                pending.append(metrics)
                n += 1
            # materialize at the epoch boundary (main_train flushes at
            # the log cadence) — this is what forces completion
            for m in pending:
                jax.tree_util.tree_map(float, m)
            return n

        print(f"train pipeline warmup ({n_chips} chips) ...",
              file=sys.stderr, flush=True)
        run_epoch()  # compile + page cache
        print("train pipeline warmup done", file=sys.stderr, flush=True)
        # steady-state per-step rate: the per-epoch chip re-roll is
        # timed separately (scripts/bench_datagen_scale.py), so reset
        # stays OUTSIDE the step timer like the reference Speedometer
        steps, dt = 0, 0.0
        for _ in range(2):
            loader.reset()
            t0 = time.perf_counter()
            steps += run_epoch()
            dt += time.perf_counter() - t0
        out = {
            "train_pipeline_ms": round(dt / steps * 1e3, 1),
            "train_pipeline_img_per_s": round(steps * b / dt, 2),
            "train_pipeline_steps": steps,
        }
        # attribution: who owns the pipeline-vs-device gap (loader CPU
        # on this host vs host->device transfer). Loader-only epoch:
        t0 = time.perf_counter()
        n_l = 0
        for _ in iter(loader):
            n_l += 1
        out["loader_only_ms"] = round((time.perf_counter() - t0) / n_l * 1e3,
                                      1)
        # upload-only: device_put + forced completion of one held batch
        held = (loader.sample_batch() if hasattr(loader, "sample_batch")
                else next(iter(loader)))

        @jax.jit
        def _touch(bt):
            import jax.numpy as _jnp

            return sum(_jnp.sum(v.astype(_jnp.float32))
                       for v in jax.tree_util.tree_leaves(bt))

        float(_touch(shard_batch(mesh, held)))  # compile
        t0 = time.perf_counter()
        for _ in range(5):
            float(_touch(shard_batch(mesh, held)))
        out["upload_only_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 1)
    return out


def _bench_autofocus():
    """AutoFocus coarse-to-fine inference in the driver bench line.

    The reference's AutoFocus contribution is inference efficiency
    (percent of pixels processed at the fine scales,
    /root/reference/lib/chips/chips_inference.py:171-172; README.md:50
    AutoFocus row). Delegates to scripts/bench_autofocus.bench — the
    REAL pipeline (FocusPixel head -> gmask FocusChips -> tier-bucketed
    chip inference -> border pruning -> aggregate) with planted coarse
    maps so the focused fraction is controlled (random-init maps carry
    no signal; the device cost of predicting them is still paid). Runs
    AFTER the main sections so the big canvases already exist on the
    TPU worker. Reports the d=0.05 operating point (~12% of fine-scale
    pixels, the reference's ballpark) as the headline autofocus rate.
    """
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import bench_autofocus

    r = bench_autofocus.bench(densities=(0.05, 0.2))
    full = r["full_pyramid"]["img_per_s"]
    head = r["autofocus_d0.05"]
    return {
        "autofocus_img_per_s": head["img_per_s"],
        "autofocus_pct_pixels": head["pct_pixels"],
        "autofocus_full_pyramid_img_per_s": full,
        "autofocus_speedup": round(head["img_per_s"] / full, 2),
        "autofocus_sweep": r,
    }


if __name__ == "__main__":
    import argparse

    _p = argparse.ArgumentParser(description="multi-scale inference bench")
    _p.add_argument("trunk", nargs="?", default="r101",
                    choices=["r101", "r50", "mnv2", "x101"])
    _p.add_argument("--batches", default=None,
                    help="per-scale batches finest->coarsest, e.g. 8,12,24"
                         " (default: the flagship ymls' TEST.BATCH_IMAGES)")
    _p.add_argument("--reps", default=None,
                    help="batches per scale per round, e.g. 3,2,1; "
                         "batch*reps must agree across scales")
    _a = _p.parse_args()
    main(_a.trunk,
         batches=[int(x) for x in _a.batches.split(",")] if _a.batches
         else None,
         reps=[int(x) for x in _a.reps.split(",")] if _a.reps else None)
