"""Profiling round 2: force completion via host transfer (np.asarray).

block_until_ready through the axon relay returns before execution
completes; only a device->host copy gives a true wall-clock.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector

    rng = np.random.RandomState(0)
    im_w, im_h = 640, 480
    model = SNIPERDetector(
        num_classes=81, num_anchors=21,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24), anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3), dtype=jnp.bfloat16,
    )

    @jax.jit
    def full_fn(v, data, im_info):
        return model.apply(v, data, im_info, train=False)

    variables = None
    for (lo, hi), b in zip([(1400, 2000), (800, 1280), (480, 512)], [2, 2, 4]):
        s = lo / min(im_w, im_h)
        if round(s * max(im_w, im_h)) > hi:
            s = hi / max(im_w, im_h)
        h = (int(np.round(im_h * s)) + 63) // 64 * 64
        w = (int(np.round(im_w * s)) + 63) // 64 * 64
        data = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
        im_info = jnp.asarray(np.tile([[h, w, s]], (b, 1)).astype(np.float32))
        if variables is None:
            variables = model.init({"params": jax.random.PRNGKey(0)}, data,
                                   im_info, train=False)
        # warmup + compile
        out = full_fn(variables, data, im_info)
        np.asarray(out["cls_prob"])

        # (a) single dispatch + full sync
        t0 = time.perf_counter()
        out = full_fn(variables, data, im_info)
        np.asarray(out["cls_prob"])
        t_single = time.perf_counter() - t0

        # (b) 5 pipelined dispatches, sync at the end
        t0 = time.perf_counter()
        outs = [full_fn(variables, data, im_info) for _ in range(5)]
        for o in outs:
            np.asarray(o["cls_prob"])
        t_pipe = (time.perf_counter() - t0) / 5

        # (c) transfer-only cost of a ready output
        ready = full_fn(variables, data, im_info)
        np.asarray(ready["cls_prob"])
        t0 = time.perf_counter()
        np.asarray(ready["cls_prob"])
        np.asarray(ready["rois"])
        t_xfer = time.perf_counter() - t0

        print(
            f"canvas {h}x{w} b{b}: single {t_single*1e3:8.1f}ms  "
            f"pipelined {t_pipe*1e3:8.1f}ms/call  xfer {t_xfer*1e3:6.1f}ms  "
            f"-> {b / t_pipe:6.2f} img/s this scale",
            flush=True,
        )


if __name__ == "__main__":
    main()
