"""Benchmark: multi-scale SNIPER ResNet-101 inference throughput on TPU.

Measures the reference's headline speed metric — images/sec through
multi-scale (3-scale) detection inference (reference: 5 img/s on one
V100, /root/reference/README.md:35) — end to end: jitted device forward
(trunk + RPN + MultiProposal + deformable-ROI head) for every scale plus
the host-side box decode/rescale per image.

Synthetic 640x480 COCO-shaped images; per-scale canvases and batch sizes
follow the flagship config (sniper_res101_e2e.yml TEST section). Prints
one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector

    model = SNIPERDetector(
        num_classes=81,
        num_anchors=21,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24),
        anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3),
        dtype=jnp.bfloat16,
        pre_nms_top_n=6000,
        post_nms_top_n=300,
    )

    # 640x480 source images; per-scale (canvas_h, canvas_w, batch) from the
    # flagship TEST config: scales (1400,2000), (800,1280), (480,512).
    im_w, im_h = 640, 480
    scale_specs = []
    for (lo, hi), b in zip([(1400, 2000), (800, 1280), (480, 512)], [2, 2, 4]):
        s = lo / min(im_w, im_h)
        if round(s * max(im_w, im_h)) > hi:
            s = hi / max(im_w, im_h)
        h = int(np.round(im_h * s))
        w = int(np.round(im_w * s))
        # pad to a multiple of 64 for clean feature grids
        ch = (h + 63) // 64 * 64
        cw = (w + 63) // 64 * 64
        scale_specs.append((ch, cw, b, s, h, w))

    rng = np.random.RandomState(0)
    variables = None
    fns = []
    for ch, cw, b, s, h, w in scale_specs:
        data = jnp.asarray(rng.randn(b, ch, cw, 3).astype(np.float32))
        im_info = jnp.asarray(
            np.tile([[h, w, s]], (b, 1)).astype(np.float32)
        )
        if variables is None:
            variables = model.init(
                {"params": jax.random.PRNGKey(0)}, data, im_info, train=False
            )

        # variables passed as an argument, NOT closed over: captured
        # arrays get embedded into the compile payload (multi-hundred-MB
        # HLO -> remote-compile transport rejects it)
        @jax.jit
        def fn(variables, data, im_info):
            return model.apply(variables, data, im_info, train=False)

        fns.append((fn, data, im_info, b, s))

    # compile + warmup
    for fn, data, im_info, b, s in fns:
        jax.block_until_ready(fn(variables, data, im_info))

    from sniper_tpu.ops.boxes import bbox_pred, clip_boxes

    def host_post(out, im_info_np, s):
        rois = np.asarray(out["rois"])
        cls_prob = np.asarray(out["cls_prob"])
        deltas = np.asarray(out["bbox_pred"])
        for i in range(rois.shape[0]):
            boxes = bbox_pred(rois[i, :, 1:], deltas[i])
            boxes = clip_boxes(boxes, im_info_np[i][:2]) / s
        return boxes

    # timed: every image passes through all three scales. Per round we
    # process 4 images: 2 batches at scales 0/1 (batch 2) + 1 batch at
    # scale 2 (batch 4), overlapping device steps with host post-proc.
    n_rounds = 6
    reps = [2, 2, 1]
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        outs = []
        for (fn, data, im_info, b, s), rep in zip(fns, reps):
            for _ in range(rep):
                outs.append((fn(variables, data, im_info), np.asarray(im_info), s))
        for out, ii, s in outs:
            jax.tree_util.tree_map(jax.block_until_ready, out)
            host_post(out, ii, s)
    images = n_rounds * 4
    dt = time.perf_counter() - t0
    ips = images / dt

    print(json.dumps({
        "metric": "multiscale_inference_throughput_r101",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / 5.0, 3),
    }))


if __name__ == "__main__":
    main()
