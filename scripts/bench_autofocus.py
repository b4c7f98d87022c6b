"""AutoFocus coarse-to-fine inference throughput on the real TPU.

Drives the FULL AutoFocus pipeline end to end (reference flow
inference.py imdb_detection_wrapper + autofocus chip generation,
SURVEY.md 3.4): coarse-scale detection with FocusPixel maps ->
host gmask FocusChips (chips/autofocus.add_chips) -> tier-bucketed
chip detection at the finer scales (data/test_loader canvas tiers) ->
border pruning -> multi-scale aggregation. Compares against the plain
full-pyramid pipeline on the SAME images.

The network is random-init, so its FocusPixel maps carry no signal;
to control the focused fraction honestly, the coarse maps handed to
add_chips are PLANTED binary blobs at a given density (the device
cost of predicting real maps IS still paid — the coarse pass runs the
real AutoFocus head). Densities bracket the reference's reported
"percent of pixels processed" operating points.

  python scripts/bench_autofocus.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = 32
IM_W, IM_H = 640, 480


def synth_loader(name):
    # content-based seed (hash() is per-process randomized)
    rng = np.random.RandomState(int(name.removeprefix("im")))
    return rng.randint(0, 255, (IM_H, IM_W, 3), np.uint8)


def make_cfg():
    from sniper_tpu.config import default_config

    cfg = default_config()
    cfg.TEST.SCALES = [(480, 512), (800, 1280), (1400, 2000)]
    cfg.TEST.BATCH_IMAGES = [8, 8, 4]
    cfg.TEST.AUTO_FOCUS = True
    cfg.TEST.DO_PRUNING = [False, True, True]
    cfg.TEST.CHIP_HYPERPARAMS = [[3, 0.5, 16], [3, 0.5, 20], [-1, -1, -1]]
    cfg.TEST.VALID_RANGES = [(75, -1), (32, 180), (-1, 75)]
    cfg.TEST.NMS = -1
    cfg.TEST.NMS_SIGMA = 0.55
    cfg.TEST.MAX_PER_IMAGE = 200
    cfg.network.PIXEL_MEANS = np.array([103.939, 116.779, 123.68])
    return cfg


def make_roidb():
    return [
        {"image": f"im{i}", "width": IM_W, "height": IM_H, "flipped": False}
        for i in range(N_IMAGES)
    ]


def planted_maps(all_maps, density):
    """Replace each chip's focus map with a centered blob covering
    ``density`` of its area (binary, so any threshold < 1 keeps it)."""
    out = []
    for per_im in all_maps:
        row = []
        for m in per_im:
            if m is None:
                row.append(None)
                continue
            fh, fw = m.shape
            planted = np.zeros((fh, fw), np.float32)
            side = np.sqrt(density)
            bh = max(1, int(round(fh * side)))
            bw = max(1, int(round(fw * side)))
            y0 = (fh - bh) // 2
            x0 = (fw - bw) // 2
            planted[y0 : y0 + bh, x0 : x0 + bw] = 1.0
            row.append(planted)
        out.append(row)
    return out


def make_fwd(model, cfg):
    """Jit the forward ONCE — a fresh jit per pipeline run would
    recompile every canvas program and poison the timings."""
    import jax

    from sniper_tpu.infer.tester import device_normalize, pack_detections

    @jax.jit
    def fwd(variables, data, im_info):
        data = device_normalize(data, im_info, cfg.network.PIXEL_MEANS)
        out = model.apply(variables, data, im_info, train=False)
        return pack_detections(out), out["focus_prob"]

    return fwd


def run_pipeline(fwd, variables, cfg, autofocus_density=None):
    """One full multi-scale run; returns (seconds, percent_pixels)."""
    from sniper_tpu.chips.autofocus import add_chips
    from sniper_tpu.data.test_loader import TestChipIterator, init_inference_crops
    from sniper_tpu.infer.tester import Tester

    roidb = make_roidb()
    init_inference_crops(roidb)
    tester = Tester(lambda d, i: fwd(variables, d, i), cfg, 81)

    t0 = time.perf_counter()
    scale_dets = []
    pct = 100.0
    n_scales = len(cfg.TEST.SCALES)
    for s in range(n_scales):
        af = autofocus_density is not None and s < n_scales - 1
        batches = TestChipIterator(
            roidb, cfg, s, cfg.TEST.BATCH_IMAGES[s],
            image_loader=synth_loader,
        )
        all_boxes, all_maps = tester.get_detections(
            iter(batches), roidb, do_pruning=bool(cfg.TEST.DO_PRUNING[s]),
            autofocus=af,
        )
        scale_dets.append(all_boxes)
        if af:
            maps = planted_maps(all_maps, autofocus_density)
            area = add_chips(roidb, maps, s, cfg)
            if s == n_scales - 2:
                pct = 100.0 * area[0] / max(area[1], 1e-9)
    tester.aggregate(scale_dets, len(roidb))
    return time.perf_counter() - t0, pct


def bench(densities=(0.05, 0.2, 0.5)):
    """Full AutoFocus vs full-pyramid sweep; returns the results dict.

    Importable by the driver bench (bench.py --> autofocus_* fields in
    BENCH_r*.json) as well as runnable standalone.
    """
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.models.registry import default_pool_kernel

    model = SNIPERDetector(
        num_classes=81, num_anchors=21,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24), anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3), dtype=jnp.bfloat16,
        pre_nms_top_n=6000, post_nms_top_n=300, autofocus=True,
        pool_kernel=default_pool_kernel(),
    )
    cfg = make_cfg()
    data0 = jnp.zeros((1, 512, 512, 3), jnp.float32)
    info0 = jnp.asarray([[512.0, 512.0, 1.0]], jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, data0, info0, train=False
    )

    # warmup pass compiles every canvas program ascending (the iterator
    # orders tiers ascending; scales run coarse -> fine)
    fwd = make_fwd(model, cfg)
    print("warmup (compiles all canvas tiers)...", file=sys.stderr, flush=True)
    run_pipeline(fwd, variables, cfg, autofocus_density=max(densities))
    if min(densities) != max(densities):
        run_pipeline(fwd, variables, cfg, autofocus_density=min(densities))
    run_pipeline(fwd, variables, cfg, autofocus_density=None)

    results = {}
    t_full, _ = run_pipeline(fwd, variables, cfg, autofocus_density=None)
    results["full_pyramid"] = {
        "img_per_s": round(N_IMAGES / t_full, 2), "pct_pixels": 100.0,
    }
    for density in densities:
        t_af, pct = run_pipeline(fwd, variables, cfg,
                                 autofocus_density=density)
        results[f"autofocus_d{density}"] = {
            "img_per_s": round(N_IMAGES / t_af, 2),
            "pct_pixels": round(pct, 1),
        }
    return results


def main():
    import json

    print(json.dumps(bench()))


if __name__ == "__main__":
    main()
