"""Per-scale batch-size re-sweep at the shipped per-scale roi counts.

The [4, 8, 8] batches were tuned with 300 rois/img at every scale; the
per-scale counts [300, 200, 100] lighten the head at the mid/small
canvases, which can shift the optimum. Same-process A/B, ascending
canvas order.

  python scripts/profile_batch_sweep.py

VERDICT (v5e, 2026-08): synchronous per-scale optima DID move up
(small b8 117.5 -> b16 178.5 img/s, mid b8 43.7 -> b12 48.6, large
b4 23.1 -> b8 24.75), but the pipelined multi-scale round got slightly
worse (bench.py --batches 8,8,16 = 19.47, 8,12,24 = 19.36 vs the
shipped [4,8,8] = 19.67): the synchronous wins only amortize the fixed
~30ms/call relay cost the double-buffered rounds already hide, while
bigger batches lengthen the critical-path step. [4, 8, 8] stands.
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

    # (canvas, post_nms, batches to try) — ascending canvas size
    plan = [
        ((384, 512), 100, [8, 16, 24]),
        ((832, 1088), 200, [8, 12, 16]),
        ((1408, 1920), 300, [4, 6, 8]),
    ]
    rng = np.random.RandomState(0)
    variables = None

    for (ch, cw), post_nms, batches in plan:
        model = SNIPERDetector(
            num_classes=81, num_anchors=21,
            anchor_scales=(2, 4, 7, 10, 13, 16, 24),
            anchor_ratios=(0.5, 1, 2), units=(3, 4, 23, 3),
            dtype=jnp.bfloat16, pre_nms_top_n=6000,
            post_nms_top_n=post_nms,
            pool_kernel=default_pool_kernel(),
        )

        @jax.jit
        def fn(variables, data, im_info):
            return pack_detections(
                model.apply(variables, data, im_info, train=False))

        for b in batches:
            data = jnp.asarray(rng.randn(b, ch, cw, 3).astype(np.float32))
            im_info = jnp.asarray(
                np.tile([[ch, cw, 1.0]], (b, 1)).astype(np.float32))
            if variables is None:
                variables = model.init({"params": jax.random.PRNGKey(0)},
                                       data, im_info, train=False)
            try:
                np.asarray(fn(variables, data, im_info))
                t0 = time.perf_counter()
                it = 5
                for _ in range(it):
                    np.asarray(fn(variables, data, im_info))
                dt = (time.perf_counter() - t0) / it
                print(json.dumps({
                    "canvas": [ch, cw], "post_nms": post_nms, "batch": b,
                    "step_ms": round(dt * 1e3, 1),
                    "img_per_s": round(b / dt, 2),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "canvas": [ch, cw], "batch": b,
                    "error": f"{type(e).__name__}: {e}"[:200],
                }), flush=True)
                break  # larger batches of this canvas will also fail


if __name__ == "__main__":
    main()
