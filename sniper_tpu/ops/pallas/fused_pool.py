"""Pallas TPU kernels: the two-pass deformable ROI pool, per roi, in VMEM.

ops.deform.fused_offset_pool's einsum path is ~10x off the compute
floor at test canvases: the [chunk, E, W, C] / [chunk, E, E, C] patch
intermediates round-trip HBM between einsums, and the per-roi tent
matmuls carry <=2 useful terms per row. A direct per-roi Pallas sampler
(roi_patch.py) also measured SLOWER — its VPU tap blends and strided
single-sublane writes dominate, and the full-axis patch still lands in
HBM.

Design here — one kernel body, two pallas_calls + one XLA matmul:

  pass A (mode="avg"):   undeformed interior bin average
                         -> pass1 [R, P^2, C]
  XLA:                   offset FC as ONE R-batched [R, P^2*C] x
                         [P^2*C, 2P^2] matmul (M=R keeps the MXU full;
                         an in-kernel per-roi FC would be an M=1 dot or
                         a lane-by-lane FMA loop — both far slower, and
                         Mosaic cannot shape-cast [P^2, C] ->
                         [1, P^2*C] anyway) -> per-bin window starts
                         py/px [R, P^2]
  pass B (mode="stencil"): offset-shifted tent-stack bin pooling
                         -> pooled [R, P^2, C]

Each pass exploits that BOTH resampling stages are linear, so their
tent matrices compose per bin (associativity — bit-identical math to
sampling the patch's interpolant, just reassociated):

    pooled[p,c] = sum_{h,w} (f_y @ wy)[p,h] * (f_x @ wx)[p,w]
                  * feat[h,w,c]

  - wy [E,H] / wx [E,W] are the roi's dense resize tents and f_y/f_x
    [P^2,E] the per-bin window factors (interior indicators in pass A,
    offset-shifted tent stacks in pass B) — all built analytically from
    iota grids, no gathers;
  - compose on the MXU ([P^2,E] x [E,W]), contract W with ONE
    [P^2, W] x [W, H*C] matmul against the w-major feature block (the
    host passes feat transposed: H*C lanes keep the contraction N-dim
    smaller, since test canvases are landscape), then reduce H with
    lane-block FMAs on the VPU;
  - there is NO patch and NO scratch: per roi the kernel runs two tiny
    dots, one big dot, and an H-step reduce, all in VMEM;
  - the valid-count divisors are the product of two per-axis
    reductions (cnt = vy x vx, also separable);
  - py/px arrive as [1, P^2] lane rows and are recovered into [P^2, 1]
    sublane vectors with a broadcast+diagonal mask (Mosaic supports
    neither [1,n]->[n,1] reshapes nor dynamic lane slicing).

A previous patch-materializing variant of this kernel (row-blend loop
into a [W, E*C] scratch + x-resize matmul + separable pooling) measured
10.2/15.6/8.9 ms at the small/mid/large canvases vs einsum's
15.1/24.1/11.2; this composed form removes the blend loop and the
scratch entirely.

Sampling semantics are identical to ops.deform's einsum path (DCN CUDA
rules: roi snapping, 0.1 min size, drop-out-of-bounds-from-count, clamp
in-bounds; pass-2 samples the PATCH's piecewise-linear interpolant —
the documented deviation of the fused pool — which the composed form
reproduces exactly because composition is associative).

Backward (fused_pool_vjp): every stage is linear in the feature map and
piecewise-linear in the per-bin window starts py/px, so the VJP is two
TRANSPOSED pool kernels plus cheap XLA glue:

  bwd pass B (_pool_bwd_kernel):  per roi, recompute the stencil tents
      and push the output cotangent g back through the composed matmuls:
      dfeat += cy^T (x) cx^T (transposed tent-compose, accumulated per
      image in VMEM across the roi grid), and d(py/px) via the
      tent-stack derivative (sum of -sign terms) including the
      valid-count denominator's dependence on the tents.
  XLA:  d(py/px) -> clip mask -> offset FC transpose (doff_k, doff_b,
      dpass1), applying offset_grad_mult (the reference lr_mult 0.01).
  bwd pass A (_pool_bwd_avg_kernel): dpass1 pushed through the
      transposed interior-average pool -> second dfeat contribution.

Residuals are only (feat, rois, off_k, off_b, pass1) — patches are
recomputed in VMEM, never materialized to HBM (the einsum path's
autodiff stacks every chunk's [B, chunk, E, E, C] patch through HBM).
rois get zero cotangents (the DCN roi snapping round() has zero
gradient, matching the einsum path's autodiff).

Reference lineage: the fork's two DeformablePSROIPooling calls + the
offset FC between them (/root/reference/symbols/faster/
resnet_mx_101_e2e.py:286-293); these kernels are their TPU-native
fusion, forward and backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resize_tents(start, step, n_out, n_in, f32):
    """Dense 1-D resize tent matrix [n_out, n_in] + in-bounds row mask
    [1, n_out] (ops.deform._resize_matrices semantics: zero weight
    outside (-0.5, n_in-0.5), clamp inside to [0, n_in-1])."""
    o_idx = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0).astype(f32)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1).astype(f32)
    pos = start + o_idx * step
    inb = jnp.logical_and(pos > -0.5, pos < n_in - 0.5)
    posc = jnp.clip(pos, 0.0, float(n_in - 1))
    w = (jnp.maximum(0.0, 1.0 - jnp.abs(posc - i_idx))
         * jnp.where(inb, 1.0, 0.0))
    cells = jax.lax.broadcasted_iota(jnp.int32, (1, n_out), 1).astype(f32)
    p1 = start + cells * step
    v = jnp.where((p1 > -0.5) & (p1 < n_in - 0.5), 1.0, 0.0)
    return w, v


def _pool_kernel(geom_ref, bins_y_ref, bins_x_ref, featt_ref, out_ref,
                 *, mode, P, S, M, E, H, W, C, md):
    """One roi per grid step. featt is the w-major [1, W, H*C] feature
    block. bins_y/bins_x are [P*P, E] interior-average factors in "avg"
    mode, or [8, P*P] per-roi window-start rows (py/px) in "stencil"
    mode."""
    row = pl.program_id(0) % 8
    ys = geom_ref[row, 0]
    xs = geom_ref[row, 1]
    sh = geom_ref[row, 2]
    sw = geom_ref[row, 3]

    f32 = jnp.float32

    wy, vy = _resize_tents(ys, sh, E, H, f32)   # [E, H], [1, E]
    wx, vx = _resize_tents(xs, sw, E, W, f32)   # [E, W], [1, E]

    if mode == "avg":
        fy = bins_y_ref[:, :].astype(f32)
        fx = bins_x_ref[:, :].astype(f32)
    else:
        # recover [P*P, 1] sublane vectors from the roi's [1, P*P] lane
        # rows via broadcast + diagonal mask, then build the S-sample
        # tent-stack weights analytically (matches _stencil_pool)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (P * P, P * P), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (P * P, P * P), 1)
        eye = jnp.where(r_i == c_i, 1.0, 0.0).astype(f32)
        py = jnp.sum(
            jnp.broadcast_to(bins_y_ref[row, :].astype(f32)[None, :],
                             (P * P, P * P)) * eye,
            axis=1, keepdims=True)
        px = jnp.sum(
            jnp.broadcast_to(bins_x_ref[row, :].astype(f32)[None, :],
                             (P * P, P * P)) * eye,
            axis=1, keepdims=True)
        cell_p = jax.lax.broadcasted_iota(
            jnp.int32, (P * P, E), 1).astype(f32)

        def tent_stack(p0):
            w = jnp.zeros((P * P, E), f32)
            for k in range(S):
                w = w + jnp.maximum(0.0, 1.0 - jnp.abs(p0 + k - cell_p))
            return w

        fy = tent_stack(py)
        fx = tent_stack(px)

    # compose per-bin factors with the resize tents: cy [P*P, H],
    # cx [P*P, W]
    cy = jnp.dot(fy.astype(md), wy.astype(md), preferred_element_type=f32)
    cx = jnp.dot(fx.astype(md), wx.astype(md), preferred_element_type=f32)

    # contract W on the MXU, then reduce H with lane-block FMAs
    big = jnp.dot(cx.astype(md), featt_ref[0], preferred_element_type=f32)
    numer = jnp.zeros((P * P, C), f32)
    for h in range(H):
        numer = numer + cy[:, h:h + 1] * big[:, h * C:(h + 1) * C]

    n = (jnp.sum(fy * vy, axis=1, keepdims=True)
         * jnp.sum(fx * vx, axis=1, keepdims=True))
    out_ref[0, :, :] = jnp.where(n > 0, numer / jnp.maximum(n, 1.0), 0.0)


def _avg_factors(P, S, M, E):
    """Separable interior-average factors: ind[p, cell] = 1 iff cell is
    one of bin p's S samples on that axis (interior offset M)."""
    b = np.arange(P * P)
    cell = np.arange(E)
    ay = ((cell[None, :] >= M + (b[:, None] // P) * S)
          & (cell[None, :] < M + (b[:, None] // P + 1) * S))
    ax = ((cell[None, :] >= M + (b[:, None] % P) * S)
          & (cell[None, :] < M + (b[:, None] % P + 1) * S))
    return ay.astype(np.float32), ax.astype(np.float32)


def _pool_call(featt, geom, bins_y, bins_x, *, mode, P, S, M, E, H, C, md,
               rpi, interpret):
    B, W, HC = featt.shape
    R = B * rpi
    kernel = functools.partial(
        _pool_kernel, mode=mode, P=P, S=S, M=M, E=E, H=H, W=W, C=C, md=md,
    )
    if mode == "avg":
        bin_spec = pl.BlockSpec((P * P, E), lambda r: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        bin_spec = pl.BlockSpec((8, P * P), lambda r: (r // 8, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        # flat roi grid; the feature block index (r // rpi) only changes
        # at image boundaries, so each image's map is DMA'd once
        grid=(R,),
        in_specs=[
            pl.BlockSpec((8, 4), lambda r: (r // 8, 0),
                         memory_space=pltpu.SMEM),
            bin_spec,
            bin_spec,
            pl.BlockSpec((1, W, HC), lambda r: (r // rpi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P * P, C), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, P * P, C), jnp.float32),
        interpret=interpret,
    )(geom, bins_y, bins_x, featt)
    return out


def _window_starts(pass1, off_k, off_b, roi_h, roi_w, sub_h, sub_w,
                   *, P, S, M, E, trans_std):
    """Offset FC + per-bin window starts, batched over all rois in XLA.

    Returns (py, px, my, mx, off): the clipped [R, P*P] window starts
    pass B stencils at, the clip subgradient masks the backward needs
    (1 inside, 0 outside, 0.5 at a rail — jnp.clip's exact autodiff),
    and the raw offset-FC output [R, 2*P*P] (clamp telemetry)."""
    R = pass1.shape[0]
    off = (pass1.reshape(R, -1) @ off_k.astype(jnp.float32)
           + off_b.astype(jnp.float32))                 # [R, 2*P*P]
    dy = off[:, :P * P]
    dx = off[:, P * P:]
    p_i = jnp.arange(P * P)
    base_y = (S * (p_i // P) + M).astype(jnp.float32)
    base_x = (S * (p_i % P) + M).astype(jnp.float32)
    raw_y = base_y + dy * trans_std * roi_h.reshape(R, 1) / sub_h.reshape(R, 1)
    raw_x = base_x + dx * trans_std * roi_w.reshape(R, 1) / sub_w.reshape(R, 1)
    hi = float(E - S)
    py = jnp.clip(raw_y, 0.0, hi)
    px = jnp.clip(raw_x, 0.0, hi)
    # clip subgradient, matching jnp.clip autodiff exactly: 1 strictly
    # inside, 0 strictly outside, and 0.5 AT a rail (JAX's max/min
    # split ties 0.5) — so the fused backward is grad-identical to the
    # einsum path even on the measure-zero rail set
    def _clip_mask(raw):
        inside = (raw > 0.0) & (raw < hi)
        at_rail = (raw == 0.0) | (raw == hi)
        return inside.astype(jnp.float32) + 0.5 * at_rail.astype(jnp.float32)

    my = _clip_mask(raw_y)
    mx = _clip_mask(raw_x)
    return py, px, my, mx, off


def _forward_parts(feat, rois, off_k, off_b, *, rpi, P, S, spatial_scale,
                   trans_std, margin_bins, interpret):
    """Shared forward body. Returns (pooled [R, P*P*C], pass1
    [R, P*P, C], off [R, 2*P*P]) — pass1 is the offset-FC input the
    VJP saves; off is the raw FC output (clamp telemetry)."""
    from sniper_tpu.ops.deform import _mm_dtype, _roi_geom

    B, H, W, C = feat.shape
    T = P * S
    M = margin_bins * S
    E = T + 2 * M
    R = B * rpi
    md = _mm_dtype()
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    # w-major feature layout: the kernel contracts W on the MXU and
    # reduces H on the VPU (H < W at the landscape test canvases, so
    # this orientation minimizes both the matmul N-dim and the reduce)
    featt = feat.astype(md).transpose(0, 2, 1, 3).reshape(B, W, H * C)
    x1, y1, roi_w, roi_h, sub_w, sub_h = _roi_geom(
        rois.reshape(B, rpi, 5), spatial_scale, T)
    geom = jnp.stack(
        [y1 + (0.5 - M) * sub_h, x1 + (0.5 - M) * sub_w, sub_h, sub_w],
        axis=-1,
    ).astype(jnp.float32).reshape(R, 4)

    ay, ax = _avg_factors(P, S, M, E)
    call = functools.partial(
        _pool_call, featt, geom, mode=None, P=P, S=S, M=M, E=E, H=H, C=C,
        md=md, rpi=rpi, interpret=interpret,
    )

    # pass A: undeformed interior average
    pass1 = call(jnp.asarray(ay), jnp.asarray(ax), mode="avg")

    py, px, _, _, off = _window_starts(
        pass1, off_k, off_b, roi_h, roi_w, sub_h, sub_w,
        P=P, S=S, M=M, E=E, trans_std=trans_std,
    )

    # pass B: offset-shifted stencil pooling
    pooled = call(py.astype(jnp.float32), px.astype(jnp.float32),
                  mode="stencil")
    return pooled.reshape(R, P * P * C), pass1, off


@functools.partial(
    jax.jit,
    static_argnames=("rois_per_image", "pooled_size", "sample_per_part",
                     "trans_std", "spatial_scale", "margin_bins",
                     "interpret"),
)
def fused_pool_pallas(
    feat: jax.Array,
    rois: jax.Array,
    off_k: jax.Array,
    off_b: jax.Array,
    *,
    rois_per_image: int,
    pooled_size: int = 7,
    sample_per_part: int = 4,
    spatial_scale: float = 0.0625,
    trans_std: float = 0.1,
    margin_bins: int = 1,
    interpret: bool | None = None,
) -> jax.Array:
    """Whole-pool Pallas forward: feat [B,H,W,C] (any float dtype),
    image-contiguous rois [B*rpi, 5], offset FC params. Returns pooled
    [B*rpi, P*P*C] fp32 — same contract as ops.deform.fused_offset_pool
    (parity-tested in tests/test_pallas_fused_pool.py). Forward only;
    training goes through fused_pool_vjp."""
    pooled, _, _ = _forward_parts(
        feat, rois, off_k, off_b, rpi=rois_per_image, P=pooled_size,
        S=sample_per_part, spatial_scale=spatial_scale,
        trans_std=trans_std, margin_bins=margin_bins, interpret=interpret,
    )
    return pooled


# ---------------------------------------------------------------------------
# Backward kernels (see module docstring, "Backward")
# ---------------------------------------------------------------------------


def _tent_stack_pair(p0, cell_p, S, f32):
    """Tent-stack weights AND their derivative in the window start p0:
    w[p,e] = sum_k max(0, 1-|p0+k-e|). The derivative matches jnp
    autodiff of the forward stack EXACTLY, including its subgradient
    conventions at the kinks — load-bearing because the offset FC is
    zeros-initialized, so the first training steps evaluate every bin at
    integer p0 where all tent kinks are hit: jnp.abs' is select(d >= 0,
    1, -1) (i.e. +1 AT zero), and jnp.maximum splits ties in half, so
    the |d| == 1 boundary contributes -abs'(d)/2."""
    w = jnp.zeros_like(cell_p)
    dw = jnp.zeros_like(cell_p)
    for k in range(S):
        d = p0 + k - cell_p
        ad = jnp.abs(d)
        w = w + jnp.maximum(0.0, 1.0 - ad)
        dabs = jnp.where(d >= 0, 1.0, -1.0)
        gate = jnp.where(ad < 1.0, 1.0, 0.0) + jnp.where(ad == 1.0, 0.5, 0.0)
        dw = dw - dabs * gate
    return w, dw


def _pool_bwd_kernel(geom_ref, bins_ref, featt_ref, g_ref,
                     dfeat_ref, dpp_ref, *, mode, P, S, M, E, H, W, C,
                     md, rpi):
    """Transposed pool, one roi per grid step.

    mode="stencil": bins holds the [8, 2*P*P] py/px rows, g is the
    pooled-output cotangent; emits the per-image dfeat accumulation AND
    the d(py/px) rows. mode="avg": bins holds the two constant [P*P, E]
    interior factors stacked as [2*P*P, E], g is dpass1; emits dfeat
    only (the avg tents depend on roi geometry alone, which has zero
    gradient through the DCN round() snapping)."""
    r = pl.program_id(0)
    row = r % 8
    ys = geom_ref[row, 0]
    xs = geom_ref[row, 1]
    sh = geom_ref[row, 2]
    sw = geom_ref[row, 3]
    f32 = jnp.float32
    PP = P * P

    wy, vy = _resize_tents(ys, sh, E, H, f32)   # [E, H], [1, E]
    wx, vx = _resize_tents(xs, sw, E, W, f32)   # [E, W], [1, E]

    if mode == "avg":
        fy = bins_ref[:PP, :].astype(f32)
        fx = bins_ref[PP:, :].astype(f32)
        dfy_need = False
    else:
        # recover the roi's py/px [P*P, 1] sublane vectors from its
        # [1, 2*P*P] lane row (broadcast + diagonal mask, as forward)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (PP, PP), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (PP, PP), 1)
        eye = jnp.where(r_i == c_i, 1.0, 0.0).astype(f32)

        def recover(lane_row):
            return jnp.sum(
                jnp.broadcast_to(lane_row[None, :], (PP, PP)) * eye,
                axis=1, keepdims=True)

        py = recover(bins_ref[row, 0:PP].astype(f32))
        px = recover(bins_ref[row, PP:2 * PP].astype(f32))
        cell_p = jax.lax.broadcasted_iota(jnp.int32, (PP, E), 1).astype(f32)
        fy, dfy_dp = _tent_stack_pair(py, cell_p, S, f32)
        fx, dfx_dp = _tent_stack_pair(px, cell_p, S, f32)
        dfy_need = True

    cy = jnp.dot(fy.astype(md), wy.astype(md), preferred_element_type=f32)
    cx = jnp.dot(fx.astype(md), wx.astype(md), preferred_element_type=f32)

    g = g_ref[0].astype(f32)                     # [P*P, C]
    sy = jnp.sum(fy * vy, axis=1, keepdims=True)  # [P*P, 1]
    sx = jnp.sum(fx * vx, axis=1, keepdims=True)
    n = sy * sx
    pos = n > 0
    den = jnp.maximum(n, 1.0)
    dnum = jnp.where(pos, g / den, 0.0)          # d(numer) [P*P, C]

    if dfy_need:
        big = jnp.dot(cx.astype(md), featt_ref[0],
                      preferred_element_type=f32)   # [P*P, H*C]
        h_iota = jax.lax.broadcasted_iota(jnp.int32, (PP, H), 1)
        numer = jnp.zeros((PP, C), f32)
        dcy = jnp.zeros((PP, H), f32)
        gparts = []
        for h in range(H):
            blk = big[:, h * C:(h + 1) * C]
            numer = numer + cy[:, h:h + 1] * blk
            s = jnp.sum(dnum * blk, axis=1, keepdims=True)
            dcy = dcy + s * jnp.where(h_iota == h, 1.0, 0.0)
            gparts.append((cy[:, h:h + 1] * dnum).astype(md))
    else:
        gparts = [(cy[:, h:h + 1] * dnum).astype(md) for h in range(H)]
    GG = jnp.concatenate(gparts, axis=1)         # [P*P, H*C] in md

    # dfeat[w, h*c] += sum_p cx[p, w] * GG[p, h*c]
    contrib = jax.lax.dot_general(
        cx.astype(md), GG, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)              # [W, H*C]

    @pl.when(r % rpi == 0)
    def _():
        dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    dfeat_ref[0] = dfeat_ref[0] + contrib

    if not dfy_need:
        return

    # the divisor's dependence on the tents: d(1/max(n,1)) is zero on
    # (0, 1) (the max picks the constant) and HALF at the n == 1.0 tie
    # (jnp.maximum autodiff splits ties, like the tent kinks above) —
    # load-bearing: the zeros-init FC makes integer window starts, so a
    # border roi with one in-bounds sample row and column hits n == 1.0
    # exactly on step 1.
    tie = jnp.where(n == 1.0, 0.5, 1.0)
    dn = jnp.where(pos & (n >= 1.0),
                   -tie * jnp.sum(g * numer, axis=1, keepdims=True)
                   / (den * den),
                   0.0)                          # [P*P, 1]

    dcx = jax.lax.dot_general(
        GG, featt_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)              # [P*P, W]
    dfy = jax.lax.dot_general(
        dcy.astype(md), wy.astype(md), (((1,), (1,)), ((), ())),
        preferred_element_type=f32) + (dn * sx) * vy
    dfx = jax.lax.dot_general(
        dcx.astype(md), wx.astype(md), (((1,), (1,)), ((), ())),
        preferred_element_type=f32) + (dn * sy) * vx

    dpy = jnp.sum(dfy * dfy_dp, axis=1, keepdims=True)   # [P*P, 1]
    dpx = jnp.sum(dfx * dfx_dp, axis=1, keepdims=True)
    # [P*P, 1] -> [1, P*P] lane rows (Mosaic cannot reshape/transpose)
    dpy_row = jnp.sum(jnp.broadcast_to(dpy, (PP, PP)) * eye, axis=0,
                      keepdims=True)
    dpx_row = jnp.sum(jnp.broadcast_to(dpx, (PP, PP)) * eye, axis=0,
                      keepdims=True)
    dpp_ref[row, 0:PP] = dpy_row[0]
    dpp_ref[row, PP:2 * PP] = dpx_row[0]


def _bwd_call(featt, geom, bins, g, *, mode, P, S, M, E, H, C, md, rpi,
              interpret):
    """pallas_call wrapper for the transposed pool. Returns
    (dfeatt [B, W, H*C] fp32, dpypx [R, 2*P*P] fp32 or None)."""
    B, W, HC = featt.shape
    R = B * rpi
    PP = P * P
    kernel = functools.partial(
        _pool_bwd_kernel, mode=mode, P=P, S=S, M=M, E=E, H=H, W=W, C=C,
        md=md, rpi=rpi,
    )
    if mode == "avg":
        bin_spec = pl.BlockSpec((2 * PP, E), lambda r: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        bin_spec = pl.BlockSpec((8, 2 * PP), lambda r: (r // 8, 0),
                                memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((B, W, HC), jnp.float32),
                  jax.ShapeDtypeStruct((R, 2 * PP), jnp.float32)]
    out_specs = [
        # revisited per image: zeroed at the image's first roi, then
        # accumulated in VMEM, written back when the index advances
        pl.BlockSpec((1, W, HC), lambda r: (r // rpi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 2 * PP), lambda r: (r // 8, 0),
                     memory_space=pltpu.VMEM),
    ]
    dfeatt, dpp = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((8, 4), lambda r: (r // 8, 0),
                         memory_space=pltpu.SMEM),
            bin_spec,
            pl.BlockSpec((1, W, HC), lambda r: (r // rpi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PP, C), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(geom, bins, featt, g)
    return dfeatt, (dpp if mode == "stencil" else None)


@functools.lru_cache(maxsize=None)
def _make_fused_pool_vjp(rpi, P, S, spatial_scale, trans_std, margin_bins,
                         offset_grad_mult, interpret, with_off):
    """custom_vjp-wrapped fused pool, specialized per static config.

    with_off=True additionally returns the raw offset-FC output
    [R, 2*P*P] (stop-gradient semantics: its cotangent is ignored) for
    margin-clamp telemetry."""

    statics = dict(rpi=rpi, P=P, S=S, spatial_scale=spatial_scale,
                   trans_std=trans_std, margin_bins=margin_bins,
                   interpret=interpret)

    @jax.custom_vjp
    def pool(feat, rois, off_k, off_b):
        pooled, _, off = _forward_parts(feat, rois, off_k, off_b, **statics)
        return (pooled, off) if with_off else pooled

    def fwd(feat, rois, off_k, off_b):
        pooled, pass1, off = _forward_parts(feat, rois, off_k, off_b,
                                            **statics)
        out = (pooled, off) if with_off else pooled
        return out, (feat, rois, off_k, off_b, pass1)

    def bwd(res, gout):
        from sniper_tpu.ops.deform import _mm_dtype, _roi_geom

        if with_off:  # the off output is telemetry — cotangent dropped
            gout = gout[0]
        feat, rois, off_k, off_b, pass1 = res
        B, H, W, C = feat.shape
        T = P * S
        M = margin_bins * S
        E = T + 2 * M
        R = B * rpi
        PP = P * P
        md = _mm_dtype()
        interp = interpret
        if interp is None:
            interp = jax.default_backend() not in ("tpu", "axon")

        featt = feat.astype(md).transpose(0, 2, 1, 3).reshape(B, W, H * C)
        x1, y1, roi_w, roi_h, sub_w, sub_h = _roi_geom(
            rois.reshape(B, rpi, 5), spatial_scale, T)
        geom = jnp.stack(
            [y1 + (0.5 - M) * sub_h, x1 + (0.5 - M) * sub_w, sub_h, sub_w],
            axis=-1,
        ).astype(jnp.float32).reshape(R, 4)

        py, px, my, mx, _ = _window_starts(
            pass1, off_k, off_b, roi_h, roi_w, sub_h, sub_w,
            P=P, S=S, M=M, E=E, trans_std=trans_std,
        )

        g = gout.reshape(R, PP, C).astype(jnp.float32)
        call = functools.partial(
            _bwd_call, featt, geom, P=P, S=S, M=M, E=E, H=H, C=C, md=md,
            rpi=rpi, interpret=interp,
        )

        # transposed pass B -> dfeat term 1 + d(py/px)
        pypx = jnp.concatenate([py, px], axis=1).astype(jnp.float32)
        dfeat_b, dpp = call(pypx, g, mode="stencil")

        # window starts -> offset FC transpose (my/mx carry jnp.clip's
        # exact subgradient incl. the 0.5 rail ties; trans_std *
        # roi/sub is the forward's exact scale)
        dpy = dpp[:, :PP] * my
        dpx = dpp[:, PP:] * mx
        ddy = dpy * (trans_std * roi_h.reshape(R, 1) / sub_h.reshape(R, 1))
        ddx = dpx * (trans_std * roi_w.reshape(R, 1) / sub_w.reshape(R, 1))
        dfc = jnp.concatenate([ddy, ddx], axis=1) * offset_grad_mult
        p1f = pass1.reshape(R, PP * C)
        doff_k = (p1f.astype(md).T @ dfc.astype(md)).astype(off_k.dtype)
        doff_b = dfc.sum(axis=0).astype(off_b.dtype)
        dpass1 = (dfc.astype(md) @ off_k.astype(md).T).reshape(R, PP, C)

        # transposed pass A -> dfeat term 2
        ay, ax = _avg_factors(P, S, M, E)
        bins_a = jnp.concatenate(
            [jnp.asarray(ay), jnp.asarray(ax)], axis=0)
        dfeat_a, _ = call(bins_a, dpass1.astype(jnp.float32), mode="avg")

        dfeatt = dfeat_a + dfeat_b
        dfeat = dfeatt.reshape(B, W, H, C).transpose(0, 2, 1, 3)
        return (dfeat.astype(feat.dtype), jnp.zeros_like(rois),
                doff_k, doff_b)

    pool.defvjp(fwd, bwd)
    return pool


def fused_pool_vjp(
    feat: jax.Array,
    rois: jax.Array,
    off_k: jax.Array,
    off_b: jax.Array,
    *,
    rois_per_image: int,
    pooled_size: int = 7,
    sample_per_part: int = 4,
    spatial_scale: float = 0.0625,
    trans_std: float = 0.1,
    margin_bins: int = 1,
    offset_grad_mult: float = 0.01,
    interpret: bool | None = None,
    return_offset_stats: bool = False,
) -> jax.Array:
    """Differentiable fused pool: fused_pool_pallas's forward plus the
    hand-written transposed-pool backward (grad parity vs the einsum
    path's autodiff tested in tests/test_pallas_fused_pool.py). This is
    what training pools through when network.POOL_KERNEL resolves to
    "fused". With ``return_offset_stats`` also returns the raw
    offset-FC output [R, 2*P*P] (no gradient flows through it) for
    margin-clamp telemetry."""
    fn = _make_fused_pool_vjp(
        rois_per_image, pooled_size, sample_per_part, spatial_scale,
        trans_std, margin_bins, offset_grad_mult, interpret,
        return_offset_stats,
    )
    out = fn(feat, rois, off_k, off_b)
    if return_offset_stats:
        pooled, off = out
        return pooled, jax.lax.stop_gradient(off)
    return out
