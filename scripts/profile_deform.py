"""Compare deformable-conv im2col formulations on the real TPU.

Variants (forward only, scalar output so relay transfer doesn't pollute
timing), at the scale-0 C5 feature size where the op dominates:
  A: current 2x2-slice gather per (tap, group)        [36 gathers]
  B: flat jnp.take of 4 corners per (tap, group)      [144 takes]
  C: one gather per tap over a [B,H,W,G,cg] operand   [9 gathers]

  python scripts/profile_deform.py
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

    from sniper_tpu.ops.deform import _make_im2col, deformable_conv

    rng = np.random.RandomState(0)
    B, H, W, Cin = 2, 88, 120, 512
    G, K, dil = 4, 3, 2
    cg = Cin // G
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32)).astype(
        jnp.bfloat16
    )
    offsets = jnp.asarray(
        (rng.randn(B, H, W, G * K * K * 2) * 1.5).astype(np.float32)
    )
    kernel = jnp.asarray(
        (rng.randn(K, K, Cin, Cin) * 0.01).astype(np.float32)
    ).astype(jnp.bfloat16)

    results = {}

    @jax.jit
    def var_a(x, offsets, kernel):
        return deformable_conv(x, offsets, kernel, num_groups=G,
                               dilation=dil).sum()

    ms = timeit(var_a, x, offsets, kernel)
    results["A_slice_gather"] = round(ms, 2)
    print(f"A current slice-gather: {ms:.2f} ms", flush=True)

    half = (K - 1) // 2 * dil

    def geom(off, base_y, base_x, t, ky, kx):
        sy = jnp.clip(base_y + (ky * dil - half) + off[..., t, 0], 0.0, H - 1.0)
        sx = jnp.clip(base_x + (kx * dil - half) + off[..., t, 1], 0.0, W - 1.0)
        y0 = jnp.minimum(jnp.floor(sy).astype(jnp.int32), H - 2)
        x0 = jnp.minimum(jnp.floor(sx).astype(jnp.int32), W - 2)
        return y0, x0, sy - y0, sx - x0

    def im2col_take(x, offsets):
        off = offsets.astype(jnp.float32).reshape(B, H, W, G, K * K, 2)
        base_y = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
        base_x = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
        xf = x.reshape(B, H * W, Cin)
        cols = []
        for ky in range(K):
            for kx in range(K):
                t = ky * K + kx
                per_g = []
                for g in range(G):
                    y0, x0, ly, lx = geom(off[:, :, :, g], base_y, base_x,
                                          t, ky, kx)
                    xg = xf[:, :, g * cg : (g + 1) * cg]
                    i00 = (y0 * W + x0).reshape(B, -1)

                    def take(idx):
                        return jnp.take_along_axis(
                            xg, idx[:, :, None], axis=1
                        ).reshape(B, H, W, cg)

                    v00 = take(i00)
                    v01 = take(i00 + 1)
                    v10 = take(i00 + W)
                    v11 = take(i00 + W + 1)
                    lyc = ly.astype(x.dtype)[..., None]
                    lxc = lx.astype(x.dtype)[..., None]
                    top = v00 * (1 - lxc) + v01 * lxc
                    bot = v10 * (1 - lxc) + v11 * lxc
                    per_g.append(top * (1 - lyc) + bot * lyc)
                cols.append(jnp.concatenate(per_g, axis=-1))
        return jnp.stack(cols, axis=3)

    @jax.jit
    def var_b(x, offsets, kernel):
        col = im2col_take(x, offsets)
        return jnp.einsum(
            "bhwc,co->bhwo", col.reshape(B, H, W, K * K * Cin),
            kernel.reshape(K * K * Cin, -1),
            preferred_element_type=jnp.float32,
        ).sum()

    ms = timeit(var_b, x, offsets, kernel)
    results["B_flat_take"] = round(ms, 2)
    print(f"B flat take: {ms:.2f} ms", flush=True)

    # C: one gather per tap, groups folded into the operand
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(2,),
        start_index_map=(0, 1, 2),
    )

    def im2col_tap(x, offsets):
        off = offsets.astype(jnp.float32).reshape(B, H, W, G, K * K, 2)
        base_y = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
        base_x = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
        xg5 = x.reshape(B, H, W, G, cg)
        cols = []
        for ky in range(K):
            for kx in range(K):
                t = ky * K + kx
                y0s, x0s, lys, lxs = [], [], [], []
                for g in range(G):
                    y0, x0, ly, lx = geom(off[:, :, :, g], base_y, base_x,
                                          t, ky, kx)
                    y0s.append(y0); x0s.append(x0)
                    lys.append(ly); lxs.append(lx)
                y0 = jnp.stack(y0s, axis=-1)  # [B,H,W,G]
                x0 = jnp.stack(x0s, axis=-1)
                ly = jnp.stack(lys, axis=-1)
                lx = jnp.stack(lxs, axis=-1)
                gidx = jax.lax.broadcasted_iota(jnp.int32, (B, H, W, G), 3)

                def one(xi, y0i, x0i, gi):
                    starts = jnp.stack(
                        [y0i.reshape(-1), x0i.reshape(-1), gi.reshape(-1)],
                        axis=1,
                    )
                    return jax.lax.gather(
                        xi, starts, dnums, slice_sizes=(2, 2, 1, cg),
                        mode=jax.lax.GatherScatterMode.CLIP,
                    ).reshape(H, W, G, 2, 2, cg)

                sl = jax.vmap(one)(xg5, y0, x0, gidx)
                lyc = ly.astype(x.dtype)[..., None]
                lxc = lx.astype(x.dtype)[..., None]
                top = sl[..., 0, 0, :] * (1 - lxc) + sl[..., 0, 1, :] * lxc
                bot = sl[..., 1, 0, :] * (1 - lxc) + sl[..., 1, 1, :] * lxc
                v = top * (1 - lyc) + bot * lyc  # [B,H,W,G,cg]
                cols.append(v.reshape(B, H, W, Cin))
        return jnp.stack(cols, axis=3)

    @jax.jit
    def var_c(x, offsets, kernel):
        col = im2col_tap(x, offsets)
        return jnp.einsum(
            "bhwc,co->bhwo", col.reshape(B, H, W, K * K * Cin),
            kernel.reshape(K * K * Cin, -1),
            preferred_element_type=jnp.float32,
        ).sum()

    ms = timeit(var_c, x, offsets, kernel)
    results["C_tap_gather"] = round(ms, 2)
    print(f"C per-tap gather: {ms:.2f} ms", flush=True)

    # numeric agreement A vs B (must match bitwise-ish)
    col_ref = _make_im2col(G, K, dil)(x, offsets)
    col_b = im2col_take(x, offsets)
    err = float(jnp.max(jnp.abs(
        col_ref.astype(jnp.float32) - col_b.astype(jnp.float32))))
    print(f"max |A-B| = {err}", flush=True)
    results["maxerr_AB"] = err

    print(json.dumps(results))


if __name__ == "__main__":
    main()
