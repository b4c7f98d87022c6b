"""Bounded-window deformable-conv formulations vs the gather path, on TPU.

The round-2/3 profiling (ARCHITECTURE.md "Remaining MFU ceiling") measured
the deformable C5's per-pixel bilinear gather at 60.8 ms = 39% of the
large-canvas step (the plain trunk runs ~32% MFU, the deform blocks ~3%),
and concluded the only formulation that avoids per-lane gathers needs
BOUNDED offsets. This script measures that trade on the real chip:

  A: shipped slice-gather im2col (ops.deform._make_im2col)
  B: window/stencil form — offsets clipped to [-r, r]; every bilinear
     sample becomes a dense tent-weighted sum over the (2r+2)^2 static
     shifts of a replicate-padded feature map. No gather anywhere; the
     replicate pad reproduces the gather path's border-clamp values
     exactly, so B == A whenever |offset| <= r.
  C: like B, but the x-axis window sum is a per-row-tile dense matmul
     (tent weights -> [tile, tile+band] matrices) so it rides the MXU.

Parity is asserted in fp32 (bit-comparable math); timing runs bf16.

  python scripts/profile_deform_window.py [r ...]
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


def window_im2col(x, offsets, *, num_groups, kernel_size, dilation, radius):
    """Stencil-form deform im2col: [B,H,W,K*K,Cin], offsets clipped to
    [-radius, radius]. Static slices only — autodiff transposes to pads,
    never scatters."""
    import jax.numpy as jnp

    B, H, W, Cin = x.shape
    G, K, d, r = num_groups, kernel_size, dilation, radius
    cg = Cin // G
    half = (K - 1) // 2 * d
    P = half + r + 1
    xpad = jnp.pad(x, ((0, 0), (P, P), (P, P), (0, 0)), mode="edge")
    off = offsets.astype(jnp.float32).reshape(B, H, W, G, K * K, 2)
    off = jnp.clip(off, -float(r), float(r))
    acc_dtype = jnp.float32
    cols = []
    for ky in range(K):
        for kx in range(K):
            t = ky * K + kx
            sy = (ky * d - half) + off[..., t, 0]  # [B,H,W,G] rel. coords
            sx = (kx * d - half) + off[..., t, 1]
            acc = jnp.zeros((B, H, W, G, cg), acc_dtype)
            for a in range(ky * d - half - r, ky * d - half + r + 2):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - a))
                for b in range(kx * d - half - r, kx * d - half + r + 2):
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - b))
                    w = (wy * wx).astype(acc_dtype)[..., None]
                    sl = xpad[:, P + a : P + a + H, P + b : P + b + W, :]
                    acc = acc + w * sl.astype(acc_dtype).reshape(
                        B, H, W, G, cg
                    )
            cols.append(acc.reshape(B, H, W, Cin))
    return jnp.stack(cols, axis=3).astype(x.dtype)


def window_im2col_mxu(x, offsets, *, num_groups, kernel_size, dilation,
                      radius, tile=128):
    """Window form with the x-axis sum as dense per-tile matmuls.

    For each (tap, y-shift a): build [B,H,Tx,tile,band] tent-weight
    matrices (band = tile + 2r+1 window columns) and contract with the
    row-shifted padded features [B,H,Tx,band,C] on the MXU.
    """
    import jax
    import jax.numpy as jnp

    B, H, W, Cin = x.shape
    G, K, d, r = num_groups, kernel_size, dilation, radius
    cg = Cin // G
    half = (K - 1) // 2 * d
    P = half + r + 1
    nwin = 2 * r + 2
    Tx = -(-W // tile)
    padw = Tx * tile - W
    # x high side needs P more cols than the tile overhang can reach
    xpad = jnp.pad(
        x, ((0, 0), (P, P), (P, P + padw + 1), (0, 0)), mode="edge"
    )
    off = offsets.astype(jnp.float32).reshape(B, H, W, G, K * K, 2)
    off = jnp.clip(off, -float(r), float(r))
    mmd = x.dtype

    cols = []
    for ky in range(K):
        for kx in range(K):
            t = ky * K + kx
            sy = (ky * d - half) + off[..., t, 0]
            # absolute fractional x position per output pixel [B,H,W,G]
            sx_abs = (
                jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
                + (kx * d - half)
                + off[..., t, 1]
            )
            # pad W up to Tx*tile so the tile reshape is static
            padw = Tx * tile - W
            sx_abs_p = jnp.pad(sx_abs, ((0, 0), (0, 0), (0, padw), (0, 0)))
            sx_tiles = sx_abs_p.reshape(B, H, Tx, tile, G)
            acc = jnp.zeros((B, H, W, G, cg), jnp.float32)
            for a in range(ky * d - half - r, ky * d - half + r + 2):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - a))  # [B,H,W,G]
                band = tile + nwin
                # input cols for tile i: i*tile + (kx*d-half-r) .. + tile-1
                # + (kx*d-half+r+1)  -> band wide, start in padded coords
                # = P + i*tile + kx*d - half - r
                col0 = P + kx * d - half - r
                # gatherless: slice per tile via reshape trick — xpad rows
                # shifted by a: [B,H,Wp,C]
                rows = xpad[:, P + a : P + a + H, :, :]
                # per-tile band slices stacked [B,H,Tx,band,C]
                bands = jnp.stack(
                    [
                        rows[:, :, col0 + i * tile : col0 + i * tile + band, :]
                        for i in range(Tx)
                    ],
                    axis=2,
                )
                # tent weights [B,H,Tx,tile,band,G]
                in_cols = (
                    jnp.arange(Tx, dtype=jnp.float32)[:, None] * tile
                    + (kx * d - half - r)
                    + jnp.arange(band, dtype=jnp.float32)[None, :]
                )  # absolute input col per (tile, band) [Tx, band]
                wxt = jnp.maximum(
                    0.0,
                    1.0
                    - jnp.abs(
                        sx_tiles[:, :, :, :, None, :]
                        - in_cols[None, None, :, None, :, None]
                    ),
                )  # [B,H,Tx,tile,band,G]
                for g in range(G):
                    wmat = wxt[..., g].astype(mmd)  # [B,H,Tx,tile,band]
                    bg = bands[..., g * cg : (g + 1) * cg].astype(mmd)
                    outg = jnp.einsum(
                        "bhtok,bhtkc->bhtoc", wmat, bg,
                        preferred_element_type=jnp.float32,
                    )  # [B,H,Tx,tile,cg]
                    outg = outg.reshape(B, H, Tx * tile, cg)[:, :, :W]
                    acc = acc.at[..., g, :].add(
                        outg * wy[..., g, None].astype(jnp.float32)
                    )
            cols.append(acc.reshape(B, H, W, Cin))
    return jnp.stack(cols, axis=3).astype(x.dtype)


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.ops.deform import _make_im2col

    # C (MXU-tiled) is opt-in: its unrolled tap x shift x group graph
    # compiles for many minutes and round-1 parity flagged it — keep it
    # out of the default A/B comparison until it earns its way back.
    with_mxu = "--mxu" in sys.argv[1:]
    radii = [int(a) for a in sys.argv[1:] if a != "--mxu"] or [2, 4]
    rng = np.random.RandomState(0)
    B, H, W, Cin = 2, 88, 120, 512
    G, K, dil = 4, 3, 2
    print(f"shape B{B} {H}x{W} C{Cin} G{G} K{K} d{dil}", file=sys.stderr)

    im2col_ref = _make_im2col(G, K, dil)

    results = {}

    # ---- parity in fp32 (offsets bounded by the smallest radius) ----
    r0 = min(radii)
    x32 = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    offs32 = jnp.asarray(
        rng.uniform(-r0 + 1e-3, r0 - 1e-3, (B, H, W, G * K * K * 2)).astype(
            np.float32
        )
    )
    ref = np.asarray(jax.jit(im2col_ref)(x32, offs32))
    variants = [("B_window", window_im2col)]
    if with_mxu:
        variants.append(("C_window_mxu", window_im2col_mxu))
    for name, fn in variants:
        got = np.asarray(
            jax.jit(
                lambda x, o: fn(
                    x, o, num_groups=G, kernel_size=K, dilation=dil,
                    radius=r0,
                )
            )(x32, offs32)
        )
        err = float(np.max(np.abs(got - ref)))
        results[f"parity_{name}_r{r0}"] = err
        print(f"parity {name} r={r0}: max|diff|={err:.2e}", file=sys.stderr)

    # ---- perf in bf16 ----
    x = x32.astype(jnp.bfloat16)
    offs = jnp.asarray(
        (rng.randn(B, H, W, G * K * K * 2) * 1.5).astype(np.float32)
    )

    @jax.jit
    def var_a(x, o):
        return im2col_ref(x, o).astype(jnp.float32).sum()

    ms = timeit(var_a, x, offs)
    results["A_gather_ms"] = round(ms, 2)
    print(f"A gather: {ms:.2f} ms", file=sys.stderr, flush=True)

    @jax.jit
    def var_a_bwd(x, o):
        def f(x, o):
            return im2col_ref(x, o).astype(jnp.float32).sum()

        gx, go = jax.grad(f, argnums=(0, 1))(x, o)
        return gx.astype(jnp.float32).sum() + go.sum()

    ms = timeit(var_a_bwd, x, offs)
    results["A_gather_bwd_ms"] = round(ms, 2)
    print(f"A gather fwd+bwd: {ms:.2f} ms", file=sys.stderr, flush=True)

    for r in radii:
        for name, fn in variants:
            @jax.jit
            def var_f(x, o, fn=fn, r=r):
                return fn(
                    x, o, num_groups=G, kernel_size=K, dilation=dil, radius=r
                ).astype(jnp.float32).sum()

            ms = timeit(var_f, x, offs)
            results[f"{name}_r{r}_ms"] = round(ms, 2)
            print(f"{name} r={r}: {ms:.2f} ms", file=sys.stderr, flush=True)

            @jax.jit
            def var_fb(x, o, fn=fn, r=r):
                def f(x, o):
                    return fn(
                        x, o, num_groups=G, kernel_size=K, dilation=dil,
                        radius=r,
                    ).astype(jnp.float32).sum()

                gx, go = jax.grad(f, argnums=(0, 1))(x, o)
                return gx.astype(jnp.float32).sum() + go.sum()

            ms = timeit(var_fb, x, offs)
            results[f"{name}_r{r}_bwd_ms"] = round(ms, 2)
            print(
                f"{name} r={r} fwd+bwd: {ms:.2f} ms", file=sys.stderr,
                flush=True,
            )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
