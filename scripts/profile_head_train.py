"""Train-side R-CNN head profiling on the real TPU.

The 271.8ms/16-chip train step spends ~56% in the fused deformable
head's fwd+bwd (ARCHITECTURE.md breakdown). This measures, in ONE
process (relay drift discipline):

  1. head fwd vs fwd+bwd at the train shape (16 x 512^2 chips,
     300 rois/img -> 4800 rois, feat 32x32x256),
  2. fwd+bwd with jax.checkpoint (remat) around the pool chunk body —
     the lax.map backward otherwise stacks every chunk's [B, chunk_b,
     E, E, C] patch + stencil residuals through HBM,
  3. roi_chunk sweep for the backward (forward measured
     smallest-chunk-wins; backward residual traffic may prefer other).

  python scripts/profile_head_train.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.ops import deform

    rng = np.random.RandomState(0)
    B, FH, FW, C = 16, 32, 32, 256
    rpi = 300
    P, S, NC = 7, 4, 81
    fc = 1024

    feat = jnp.asarray(rng.randn(B, FH, FW, C).astype(np.float32))
    # image-contiguous rois in pixel coords on the 512 chip
    cx = rng.uniform(32, 480, (B * rpi,))
    cy = rng.uniform(32, 480, (B * rpi,))
    w = rng.uniform(16, 256, (B * rpi,))
    h = rng.uniform(16, 256, (B * rpi,))
    bidx = np.repeat(np.arange(B), rpi).astype(np.float32)
    rois = jnp.asarray(np.stack(
        [bidx, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1
    ).astype(np.float32))

    ppc = P * P * C
    params = tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (
            rng.randn(ppc, P * P * 2) * 0.001, np.zeros(P * P * 2),
            rng.randn(ppc, fc) * 0.01, np.zeros(fc),
            rng.randn(fc, fc) * 0.01, np.zeros(fc),
            rng.randn(fc, NC) * 0.01, np.zeros(NC),
            rng.randn(fc, 4) * 0.01, np.zeros(4),
        )
    )

    def head_loss(params, feat, rois, margin_bins, roi_chunk):
        cls, box = deform.rcnn_head_fused(
            feat, rois, params, rois_per_image=rpi,
            margin_bins=margin_bins, roi_chunk=roi_chunk,
        )
        return (cls.astype(jnp.float32) ** 2).mean() \
            + (box.astype(jnp.float32) ** 2).mean()

    for chunk in (32, 64, 128):
        fwd = jax.jit(lambda p, f, r, c=chunk: head_loss(p, f, r, 1, c))
        bwd = jax.jit(
            lambda p, f, r, c=chunk: sum(
                jnp.sum(jnp.abs(x))
                for x in jax.tree_util.tree_leaves(
                    jax.grad(head_loss, argnums=(0, 1))(p, f, r, 1, c)
                )
            )
        )
        tf = timeit(fwd, params, feat, rois)
        tb = timeit(bwd, params, feat, rois)
        print(f"chunk={chunk:4d}: fwd {tf:6.1f}ms  fwd+bwd {tb:6.1f}ms "
              f"(bwd/fwd {tb / tf:.2f}x)", flush=True)

    # remat variant: recompute the chunk body in the backward instead of
    # stacking residuals across lax.map steps
    orig_map = jax.lax.map

    def remat_map(f, xs):
        return orig_map(jax.checkpoint(f), xs)

    for chunk in (32, 64, 128):
        deform.jax.lax = jax.lax  # no-op, keep linters quiet
        try:
            jax.lax.map = remat_map  # type: ignore[assignment]
            bwd = jax.jit(
                lambda p, f, r, c=chunk: sum(
                    jnp.sum(jnp.abs(x))
                    for x in jax.tree_util.tree_leaves(
                        jax.grad(head_loss, argnums=(0, 1))(p, f, r, 1, c)
                    )
                )
            )
            tb = timeit(bwd, params, feat, rois)
        finally:
            jax.lax.map = orig_map  # type: ignore[assignment]
        print(f"chunk={chunk:4d} remat: fwd+bwd {tb:6.1f}ms", flush=True)


if __name__ == "__main__":
    main()
