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
"""

import json
import time

import numpy as np


def main(trunk: str = "r101"):
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.ops.boxes import bbox_pred, clip_boxes

    # driver runs `python bench.py` -> flagship R101; --trunk covers the
    # other model families (scripts/bench_variants invokes these)
    trunk_kw = {
        "r101": dict(units=(3, 4, 23, 3)),
        "r50": dict(units=(3, 4, 6, 3)),
        "mnv2": dict(trunk_type="mobilenetv2", head_fc_dim=512),
        "x101": dict(trunk_type="resnext", units=(3, 4, 23, 3),
                     num_trunk_groups=32),
    }[trunk]
    model = SNIPERDetector(
        num_classes=81,
        num_anchors=21,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24),
        anchor_ratios=(0.5, 1, 2),
        dtype=jnp.bfloat16,
        pre_nms_top_n=6000,
        post_nms_top_n=300,
        # single-chip inference: the composed-tent Pallas pool (what
        # network.POOL_KERNEL "auto" resolves to here; 1.3-2.0x the
        # einsum path at these canvases)
        pool_kernel=(
            "fused" if jax.default_backend() in ("tpu", "axon")
            else "einsum"
        ),
        **trunk_kw,
    )

    im_w, im_h = 640, 480
    scale_specs = []
    # per-scale batch A/B on v5e (vs the reference's V100 [2,2,4]): the
    # mid scale gains +24% img/s going 4 -> 8; the large canvas is
    # batch-flat past 4; the small canvas peaks at 8 (b16 is slower)
    for (lo, hi), b in zip([(1400, 2000), (800, 1280), (480, 512)], [4, 8, 8]):
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
    @jax.jit
    def fn(variables, data, im_info):
        return pack_detections(
            model.apply(variables, data, im_info, train=False)
        )

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
        out = fn(variables, data, im_info)
        np.asarray(out)
        print(f"warmup {data.shape} done", file=sys.stderr, flush=True)
        inputs[i] = (data, im_info, b, s)

    def host_post(out_np, im_info_np, s):
        rois, cls_prob, deltas = out_np
        for i in range(rois.shape[0]):
            boxes = bbox_pred(rois[i, :, 1:], deltas[i])
            clip_boxes(boxes, im_info_np[i][:2]) / s

    # per round: 8 images through all three scales (2 batches of 4 at
    # scale 0, 1 batch of 8 at scales 1/2). Rounds are
    # double-buffered — round N+1 is dispatched before round N's outputs
    # are fetched — so the fixed ~30ms/fetch relay cost overlaps device
    # compute, as it does in the streaming Tester.
    reps = [2, 1, 1]

    def dispatch_round():
        return [
            (fn(variables, data, im_info), im_info, s)
            for (data, im_info, b, s), rep in zip(inputs, reps)
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
    images = n_rounds * 8
    dt = time.perf_counter() - t0
    ips = images / dt

    # --- per-scale step time + FLOPs/MFU anchor -----------------------
    # XLA's own cost analysis gives the per-program FLOPs; relating the
    # measured time to the chip's bf16 peak quantifies "fast" (13 img/s
    # is meaningless without knowing the ceiling).
    peak_by_kind = {  # dense bf16 peak FLOP/s per chip (public specs)
        "TPU v4": 275e12, "TPU v5 lite": 197e12, "TPU v5e": 197e12,
        "TPU v5": 459e12, "TPU v5p": 459e12, "TPU v6 lite": 918e12,
        "TPU v6e": 918e12,
    }
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peak_by_kind.items() if k in kind), None)
    per_scale = []
    total_flops = 0.0
    for (data, im_info, b, s), rep in zip(inputs, reps):
        flops = None
        try:
            # fn is already jitted: lower/compile hits the jit cache
            cost = fn.lower(variables, data, im_info).compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        t1 = time.perf_counter()
        n_iter = 4
        for _ in range(n_iter):
            np.asarray(fn(variables, data, im_info))
        step_s = (time.perf_counter() - t1) / n_iter
        entry = {
            "canvas": list(data.shape[1:3]), "batch": b,
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
    print(json.dumps({
        "metric": f"multiscale_inference_throughput_{trunk}",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / 5.0, 3),
    }))


if __name__ == "__main__":
    import argparse

    _p = argparse.ArgumentParser(description="multi-scale inference bench")
    _p.add_argument("trunk", nargs="?", default="r101",
                    choices=["r101", "r50", "mnv2", "x101"])
    main(_p.parse_args().trunk)
