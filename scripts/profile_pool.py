"""Isolate deformable_psroi_pool_fast cost on TPU; test chunk sizes and
a shared-patch two-pass variant.

  python scripts/profile_pool.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=8):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from sniper_tpu.ops.deform import deformable_psroi_pool_fast

    rng = np.random.RandomState(0)
    b, fh, fw, c = 2, 52, 68, 256
    feat = jnp.asarray(rng.randn(b, fh, fw, c).astype(np.float32))
    R = 600
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = np.repeat(np.arange(b), R // b)
    rois[:, 1] = rng.uniform(0, 900, R)
    rois[:, 2] = rng.uniform(0, 700, R)
    rois[:, 3] = rois[:, 1] + rng.uniform(16, 150, R)
    rois[:, 4] = rois[:, 2] + rng.uniform(16, 150, R)
    rois = jnp.asarray(rois)
    trans = jnp.asarray((rng.randn(R, 7, 7, 2) * 0.5).astype(np.float32))

    results = {}
    for chunk in (64, 128, 300):
        f1 = jax.jit(partial(
            deformable_psroi_pool_fast, pooled_size=7,
            spatial_scale=1.0 / 16, roi_chunk=chunk,
        ))
        try:
            ms_nt = timeit(f1, feat, rois, None)
            ms_t = timeit(f1, feat, rois, trans)
            results[f"chunk{chunk}_notrans"] = round(ms_nt, 2)
            results[f"chunk{chunk}_trans"] = round(ms_t, 2)
            print(f"chunk={chunk}: no_trans {ms_nt:.2f} ms, "
                  f"trans {ms_t:.2f} ms", flush=True)
        except Exception as e:
            print(f"chunk={chunk}: FAILED {type(e).__name__}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
