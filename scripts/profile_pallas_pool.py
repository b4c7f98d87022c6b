"""A/B the Pallas patch-extraction head against the einsum head on TPU.

Runs fused_offset_pool with extract='einsum' (shipped default, chunked
lax.map) vs extract='pallas' (per-roi sampling kernel) at the three
multi-scale test canvas feature shapes, 300 rois/image (TEST
RPN_POST_NMS_TOP_N). np.asarray forces completion through the relay.

  python scripts/profile_pallas_pool.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=6):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.ops.deform import fused_offset_pool

    rng = np.random.RandomState(0)
    C = 256
    rpi = 300
    results = {}
    # (B, feat_h, feat_w) for the small/mid/large test canvases
    for name, (B, fh, fw) in {
        "small_b4": (4, 24, 32),
        "mid_b8": (8, 52, 68),
        "large_b2": (2, 88, 120),
    }.items():
        feat = jnp.asarray(rng.randn(B, fh, fw, C).astype(np.float32))
        R = B * rpi
        rois = np.zeros((R, 5), np.float32)
        rois[:, 0] = np.repeat(np.arange(B), rpi)
        span_w, span_h = fw * 16, fh * 16
        rois[:, 1] = rng.uniform(0, span_w * 0.8, R)
        rois[:, 2] = rng.uniform(0, span_h * 0.8, R)
        rois[:, 3] = rois[:, 1] + rng.uniform(8, span_w * 0.5, R)
        rois[:, 4] = rois[:, 2] + rng.uniform(8, span_h * 0.5, R)
        rois = jnp.asarray(rois)
        off_k = jnp.asarray(
            (rng.randn(7 * 7 * C, 7 * 7 * 2) * 0.01).astype(np.float32))
        off_b = jnp.zeros((7 * 7 * 2,), jnp.float32)

        from sniper_tpu.ops.pallas.fused_pool import fused_pool_pallas

        for mode in ("einsum", "pallas", "fused"):
            # relay discipline: force a SCALAR output so the timed loop
            # measures device compute, not a 120MB pooled-tensor fetch
            # through the HTTP relay (see profile_margin.py)
            if mode == "fused":
                pool = partial(
                    fused_pool_pallas, rois_per_image=rpi, pooled_size=7,
                    spatial_scale=1.0 / 16, margin_bins=1,
                )
            else:
                pool = partial(
                    fused_offset_pool, rois_per_image=rpi, pooled_size=7,
                    spatial_scale=1.0 / 16, margin_bins=1, roi_chunk=16,
                    extract=mode,
                )
            f = jax.jit(lambda *a: jnp.sum(pool(*a)))
            try:
                ms = timeit(f, feat, rois, off_k, off_b)
                results[f"{name}_{mode}"] = round(ms, 2)
                print(f"{name} {mode}: {ms:.2f} ms", flush=True)
            except Exception as e:
                print(f"{name} {mode}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                results[f"{name}_{mode}"] = None

    print(json.dumps(results))


if __name__ == "__main__":
    main()
