"""Part-wise deformable-conv backward cost at the train C5 shape.

The 261.9ms train step spends ~129ms in trunk fwd+bwd, ~71ms of it in
the three deformable C5 units. The im2col custom VJP has two parts:
  gx   — input gradient via one-hot tent matmuls ([B,Q,W,cg]
         intermediates, 36 einsums),
  goff — offset gradient, which RE-GATHERS the 36 corner slices.
This measures full fwd, fwd+bwd, and fwd+bwd with each part disabled
(ablated custom VJPs) to see where the backward milliseconds live.

  python scripts/profile_deform_bwd.py
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
    B, H, W, C = 16, 32, 32, 512
    G, K = 4, 3
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.1)
    offs = jnp.asarray(rng.randn(B, H, W, G * K * K * 2).astype(np.float32))
    kern = jnp.asarray(rng.randn(K, K, C, C).astype(np.float32) * 0.01)

    base = deform._make_im2col(G, K, 2)

    def make_ablated(skip_gx=False, skip_goff=False):
        """im2col with parts of the custom backward disabled."""
        import functools

        # re-specialize without the lru cache (fresh closure)
        deform._make_im2col.cache_clear()
        full = deform._make_im2col(G, K, 2)
        deform._make_im2col.cache_clear()

        @jax.custom_vjp
        def col(x, offsets):
            return full(x, offsets)

        def fwd(x, offsets):
            return full(x, offsets), (x, offsets)

        def bwd(res, g):
            x, offsets = res
            _, vjp = jax.vjp(full, x, offsets)
            gx, goff = vjp(g)
            if skip_gx:
                gx = jnp.zeros_like(gx)
            if skip_goff:
                goff = jnp.zeros_like(goff)
            return gx, goff

        col.defvjp(fwd, bwd)
        return col

    def conv_with(col_fn):
        def f(x, offs, kern):
            c = col_fn(x, offs)
            out = jnp.einsum(
                "bhwc,co->bhwo",
                c.reshape(B, H, W, K * K * C),
                kern.reshape(K * K * C, -1),
                preferred_element_type=jnp.float32,
            )
            return (out ** 2).mean()

        return f

    loss = conv_with(base)
    fwd = jax.jit(loss)
    bwd_full = jax.jit(lambda x, o, k: sum(
        jnp.sum(jnp.abs(t)) for t in jax.grad(loss, argnums=(0, 1, 2))(x, o, k)
    ))
    print(f"fwd              {timeit(fwd, x, offs, kern):6.1f}ms", flush=True)
    print(f"fwd+bwd (custom) {timeit(bwd_full, x, offs, kern):6.1f}ms",
          flush=True)

    # NOTE: the ablated variants call jax.vjp(full) inside bwd — that is
    # the SAME custom VJP math (full is the shipped custom-vjp im2col),
    # so "skip" rows only remove the final add of one output, letting
    # XLA DCE that part's computation.
    for tag, kw in [("no goff (DCE'd)", dict(skip_goff=True)),
                    ("no gx (DCE'd)", dict(skip_gx=True))]:
        lossv = conv_with(make_ablated(**kw))
        bwd_v = jax.jit(lambda x, o, k, lv=lossv: sum(
            jnp.sum(jnp.abs(t))
            for t in jax.grad(lv, argnums=(0, 1, 2))(x, o, k)
        ))
        print(f"fwd+bwd {tag:16s} {timeit(bwd_v, x, offs, kern):6.1f}ms",
              flush=True)

    # plain dilated conv baseline (what a non-deformable C5 would cost)
    def plain(x, kern):
        out = jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (out ** 2).mean()

    pb = jax.jit(lambda x, k: sum(
        jnp.sum(jnp.abs(t)) for t in jax.grad(plain, argnums=(0, 1))(x, k)
    ))
    print(f"plain dilated conv fwd+bwd {timeit(pb, x, kern):6.1f}ms",
          flush=True)


if __name__ == "__main__":
    main()
