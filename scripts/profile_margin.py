"""A/B margin_bins=2 vs margin_bins=1 for the fused R-CNN head.

margin_bins sets the patch halo the stencil pool can shift into
(E = P*S + 2*margin_bins*S cells per axis: 44 vs 36). Smaller E cuts
the patch-extraction einsums (~E and ~E^2 terms) and the [P^2, E^2]
stencil matmul. The cost is a tighter clamp: per-bin offsets beyond
margin_bins bins past the roi edge saturate (interior shifts are
unaffected — the patch covers the roi itself at full resolution either
way). With trans_std=0.1 and 7x7 bins, 1 margin bin covers
|trans| <= (margin_bins*S*sub)/(trans_std*roi) = margin_bins/(0.1*7)
= 1.43 raw units per margin bin.

Measures, same-process (relay discipline: scalar-forced outputs):
  - head ms at train shape (16x 512^2 chips -> 32x32 feat, 4800 rois)
  - head ms at the large inference scale (4x 1408x1920 -> 88x120, 1200
    rois) and mid scale (8x 832x1088 -> 52x68, 2400 rois)
  - max |out_m1 - out_m2| at several trans magnitudes, plus each vs the
    exact-semantics oracle pool.

  JAX_PLATFORMS=tpu python scripts/profile_margin.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=8):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def make_inputs(rng, b, fh, fw, rpi, c=256):
    feat = jnp_asarray(rng.randn(b, fh, fw, c).astype(np.float32))
    R = b * rpi
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = np.repeat(np.arange(b), rpi)
    rois[:, 1] = rng.uniform(0, fw * 16 * 0.8, R)
    rois[:, 2] = rng.uniform(0, fh * 16 * 0.8, R)
    rois[:, 3] = rois[:, 1] + rng.uniform(16, fw * 16 * 0.3, R)
    rois[:, 4] = rois[:, 2] + rng.uniform(16, fh * 16 * 0.3, R)
    return feat, jnp_asarray(rois)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def head_params(rng, c=256, p=7, fc=1024, ncls=81):
    import jax.numpy as jnp

    ppc = p * p * c

    def a(*s):
        return jnp.asarray((rng.randn(*s) * 0.01).astype(np.float32))

    return (
        a(ppc, p * p * 2) * 0.5, jnp.zeros((p * p * 2,)),
        a(ppc, fc), jnp.zeros((fc,)),
        a(fc, fc), jnp.zeros((fc,)),
        a(fc, ncls), jnp.zeros((ncls,)),
        a(fc, 4), jnp.zeros((4,)),
    )


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.ops.deform import (
        deformable_psroi_pool,
        deformable_psroi_pool_fast,
        rcnn_head_fused,
    )

    rng = np.random.RandomState(0)
    params = head_params(rng)
    results = {}

    shapes = [
        ("train_16x512", 16, 32, 32, 300),
        ("infer_b8_mid", 8, 52, 68, 300),
        ("infer_b4_big", 4, 88, 120, 300),
    ]
    for name, b, fh, fw, rpi in shapes:
        feat, rois = make_inputs(rng, b, fh, fw, rpi)
        for m in (2, 1):
            fn = jax.jit(partial(
                rcnn_head_fused, rois_per_image=rpi, margin_bins=m,
            ))
            ms = timeit(lambda f, r: fn(f, r, params)[0], feat, rois)
            results[f"{name}_m{m}"] = round(ms, 2)
            print(f"{name} margin_bins={m}: {ms:.2f} ms", flush=True)

    # numerics: fast pool m1 vs m2 vs exact oracle at set trans scales
    b, fh, fw, rpi = 2, 52, 68, 100
    feat, rois = make_inputs(rng, b, fh, fw, rpi)
    R = b * rpi
    for tscale in (0.25, 0.5, 1.0, 2.0):
        trans = jnp_asarray(
            (rng.randn(R, 7, 7, 2) * tscale).astype(np.float32)
        )
        outs = {}
        for m in (2, 1):
            f = jax.jit(partial(
                deformable_psroi_pool_fast, pooled_size=7,
                spatial_scale=1.0 / 16, margin_bins=m, rois_per_image=rpi,
            ))
            outs[m] = np.asarray(f(feat, rois, trans))
        exact = np.asarray(jax.jit(partial(
            deformable_psroi_pool, pooled_size=7, spatial_scale=1.0 / 16,
        ))(feat, rois, trans))
        d12 = float(np.abs(outs[1] - outs[2]).max())
        e2 = float(np.abs(outs[2] - exact).max())
        e1 = float(np.abs(outs[1] - exact).max())
        frac = float(np.mean(np.abs(outs[1] - outs[2]) > 1e-5))
        results[f"numerics_t{tscale}"] = {
            "max_m1_vs_m2": round(d12, 5),
            "max_m2_vs_exact": round(e2, 5),
            "max_m1_vs_exact": round(e1, 5),
            "frac_cells_changed": round(frac, 5),
        }
        print(f"trans~N(0,{tscale}): |m1-m2|max {d12:.5f} "
              f"|m2-exact|max {e2:.5f} |m1-exact|max {e1:.5f} "
              f"cells changed {frac:.4f}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
