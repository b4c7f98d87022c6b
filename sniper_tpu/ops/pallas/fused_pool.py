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

Forward-only (no VJP): wired on the inference path; training keeps the
einsum form whose backward is already MXU-shaped.

Reference lineage: the fork's two DeformablePSROIPooling calls + the
offset FC between them (/root/reference/symbols/faster/
resnet_mx_101_e2e.py:286-293); these kernels are their TPU-native
fusion.
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
    (parity-tested in tests/test_pallas_fused_pool.py)."""
    from sniper_tpu.ops.deform import _mm_dtype, _roi_geom

    B, H, W, C = feat.shape
    P = pooled_size
    S = sample_per_part
    T = P * S
    M = margin_bins * S
    E = T + 2 * M
    rpi = rois_per_image
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

    # offset FC + per-bin window starts, batched over all rois in XLA
    off = (pass1.reshape(R, P * P * C) @ off_k.astype(jnp.float32)
           + off_b.astype(jnp.float32))                 # [R, 2*P*P]
    dy = off[:, :P * P]
    dx = off[:, P * P:]
    p_i = jnp.arange(P * P)
    base_y = (S * (p_i // P) + M).astype(jnp.float32)
    base_x = (S * (p_i % P) + M).astype(jnp.float32)
    py = jnp.clip(base_y + dy * trans_std * roi_h.reshape(R, 1)
                  / sub_h.reshape(R, 1), 0.0, float(E - S))
    px = jnp.clip(base_x + dx * trans_std * roi_w.reshape(R, 1)
                  / sub_w.reshape(R, 1), 0.0, float(E - S))

    # pass B: offset-shifted stencil pooling
    pooled = call(py.astype(jnp.float32), px.astype(jnp.float32),
                  mode="stencil")
    return pooled.reshape(R, P * P * C)
