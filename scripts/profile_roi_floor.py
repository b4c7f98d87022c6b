"""Per-scale post-NMS roi-count sweep at the test canvases (TPU A/B).

The canvas-independent proposal+ROI-head work is the small/mid-canvas
MFU floor (BENCH_r02: 4-5% MFU at 384x512). TEST.VALID_RANGES means a
coarse scale only KEEPS large detections, so it may not need the full
300 rois/img. This measures the full jitted inference step at each
canvas for several post_nms_top_n values, same-process (the only
meaningful comparison through the shared-TPU relay).

  python scripts/profile_roi_floor.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.infer.tester import pack_detections
    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.models.registry import default_pool_kernel

    canvases = [(384, 512, 8), (832, 1088, 8), (1408, 1920, 4)]
    counts = [300, 200, 150, 100, 64]
    rng = np.random.RandomState(0)

    def build(post_nms):
        return SNIPERDetector(
            num_classes=81, num_anchors=21,
            anchor_scales=(2, 4, 7, 10, 13, 16, 24),
            anchor_ratios=(0.5, 1, 2), units=(3, 4, 23, 3),
            dtype=jnp.bfloat16, pre_nms_top_n=6000,
            post_nms_top_n=post_nms,
            pool_kernel=default_pool_kernel(),
        )

    variables = None
    results = []
    # ascending canvas size; inputs created per scale (TPU worker rule)
    for ch, cw, b in canvases:
        data = jnp.asarray(rng.randn(b, ch, cw, 3).astype(np.float32))
        im_info = jnp.asarray(
            np.tile([[ch, cw, 1.0]], (b, 1)).astype(np.float32))
        for n in counts:
            model = build(n)
            if variables is None:
                variables = model.init({"params": jax.random.PRNGKey(0)},
                                       data, im_info, train=False)

            @jax.jit
            def fn(variables, data, im_info):
                return pack_detections(
                    model.apply(variables, data, im_info, train=False))

            np.asarray(fn(variables, data, im_info))  # compile+warm
            t0 = time.perf_counter()
            it = 6
            for _ in range(it):
                np.asarray(fn(variables, data, im_info))
            dt = (time.perf_counter() - t0) / it
            row = {"canvas": [ch, cw], "batch": b, "post_nms": n,
                   "step_ms": round(dt * 1e3, 1),
                   "img_per_s": round(b / dt, 2)}
            print(json.dumps(row), flush=True)
            results.append(row)


if __name__ == "__main__":
    main()
