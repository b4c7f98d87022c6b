"""Deformable convolution + deformable (PS)ROI pooling, TPU-native.

Replaces the reference MXNet-fork CUDA ops ``DeformableConvolution`` and
``DeformablePSROIPooling`` (call sites:
/root/reference/symbols/faster/resnet_mx_101_e2e.py:124-128,286-293,
357-369) with gather-based bilinear sampling + matmul:

- deformable_conv: per-tap sampling grids (base grid + dilation + learned
  offsets per deformable group) -> bilinear gather -> im2col tensor ->
  one big [taps*Cin, Cout] matmul that lands on the MXU. No scatter, no
  dynamic shapes; every gather is a flat ``take`` over the (H*W) axis.
- deformable_psroi_pool: DCN-style ROI pooling with group_size=1 (i.e.
  deformable ROIAlign): 7x7 bins, sample_per_part^2 bilinear samples per
  bin, learned per-bin offsets scaled by trans_std and the roi size,
  out-of-bounds samples dropped from the average (count semantics match
  the CUDA kernel, including the round()-to-pixel roi snapping and the
  0.1 minimum roi size).

All arrays are NHWC. Everything is jittable and differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _mm_dtype():
    """Matmul-operand dtype for the hand-written dots in this module.

    bf16 operands with fp32 accumulation is the MXU-native layout, but
    the XLA CPU backend cannot execute bf16 x bf16 -> f32 dots
    (DotThunk rejects them), so CPU runs keep the operands fp32. The
    accumulation dtype (preferred_element_type) is fp32 either way.
    """
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _bilinear_gather(feat_flat, h_coord, w_coord, H, W):
    """Bilinear sample feat_flat [H*W, C] at fractional coords [...].

    Coords are clamped to the valid range; callers mask out-of-bounds
    samples themselves when they need drop semantics.
    Returns [..., C].
    """
    h = jnp.clip(h_coord, 0.0, H - 1.0)
    w = jnp.clip(w_coord, 0.0, W - 1.0)
    h0 = jnp.floor(h).astype(jnp.int32)
    w0 = jnp.floor(w).astype(jnp.int32)
    h1 = jnp.minimum(h0 + 1, H - 1)
    w1 = jnp.minimum(w0 + 1, W - 1)
    lh = (h - h0).astype(feat_flat.dtype)[..., None]
    lw = (w - w0).astype(feat_flat.dtype)[..., None]

    def take(hy, wx):
        return jnp.take(feat_flat, hy * W + wx, axis=0)

    v00 = take(h0, w0)
    v01 = take(h0, w1)
    v10 = take(h1, w0)
    v11 = take(h1, w1)
    top = v00 * (1 - lw) + v01 * lw
    bot = v10 * (1 - lw) + v11 * lw
    return top * (1 - lh) + bot * lh


@functools.lru_cache(maxsize=None)
def _make_im2col(num_groups: int, K: int, dilation: int):
    """Specialized deform-im2col with a TPU-friendly custom VJP.

    XLA transposes the forward's bilinear gathers into scatter-adds,
    which serialize on TPU (measured: a 64ms trunk backward became 6.2s
    with three deformable units). The custom backward instead builds the
    input gradient with separable one-hot tent matrices — per tap,
    grad_x[y,x,c] = sum_q wy[q,y] * wx[q,x] * g[q,c], evaluated as an
    outer product + batched matmul (pure VPU/MXU, no scatter). Offset
    gradients recompute the corner values with the same slice gathers as
    the forward (gathers transpose fine because they feed elementwise
    math only).
    """
    G = num_groups
    half = (K - 1) // 2 * dilation

    def _sample_geom(offg, H, W, base_y, base_x, t, ky, kx):
        sy = jnp.clip(
            base_y + (ky * dilation - half) + offg[:, :, :, t, 0],
            0.0, H - 1.0,
        )
        sx = jnp.clip(
            base_x + (kx * dilation - half) + offg[:, :, :, t, 1],
            0.0, W - 1.0,
        )
        y0 = jnp.minimum(jnp.floor(sy).astype(jnp.int32), H - 2)
        x0 = jnp.minimum(jnp.floor(sx).astype(jnp.int32), W - 2)
        ly = sy - y0
        lx = sx - x0
        return sy, sx, y0, x0, ly, lx

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def _corners(xg, y0, x0, cg):
        """[B,H,W] starts -> 2x2 corner slices [B,H,W,2,2,cg]."""
        B, H, W = y0.shape

        def one(xg_i, y0_i, x0_i):
            starts = jnp.stack([y0_i.reshape(-1), x0_i.reshape(-1)], axis=1)
            return jax.lax.gather(
                xg_i, starts, dnums, slice_sizes=(2, 2, cg),
                mode=jax.lax.GatherScatterMode.CLIP,
            ).reshape(H, W, 2, 2, cg)

        return jax.vmap(one)(xg, y0, x0)

    def fwd_impl(x, offsets):
        B, H, W, Cin = x.shape
        cg = Cin // G
        base_y = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
        base_x = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
        off = offsets.astype(jnp.float32).reshape(B, H, W, G, K * K, 2)
        cols = []
        for ky in range(K):
            for kx in range(K):
                t = ky * K + kx
                per_g = []
                for g in range(G):
                    _, _, y0, x0, ly, lx = _sample_geom(
                        off[:, :, :, g], H, W, base_y, base_x, t, ky, kx,
                    )
                    sl = _corners(
                        x[:, :, :, g * cg : (g + 1) * cg], y0, x0, cg
                    )
                    lyc = ly.astype(x.dtype)[..., None]
                    lxc = lx.astype(x.dtype)[..., None]
                    top = sl[:, :, :, 0, 0] * (1 - lxc) + sl[:, :, :, 0, 1] * lxc
                    bot = sl[:, :, :, 1, 0] * (1 - lxc) + sl[:, :, :, 1, 1] * lxc
                    per_g.append(top * (1 - lyc) + bot * lyc)
                cols.append(jnp.concatenate(per_g, axis=-1))
        return jnp.stack(cols, axis=3)  # [B,H,W,K*K,Cin]

    @jax.custom_vjp
    def im2col(x, offsets):
        return fwd_impl(x, offsets)

    def im2col_fwd(x, offsets):
        return fwd_impl(x, offsets), (x, offsets)

    def im2col_bwd(res, gcol):
        x, offsets = res
        B, H, W, Cin = x.shape
        cg = Cin // G
        base_y = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
        base_x = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
        off = offsets.astype(jnp.float32).reshape(B, H, W, G, K * K, 2)
        Q = H * W
        ygrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)
        xgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)

        gx = jnp.zeros((B, H, W, Cin), jnp.float32)
        goff = jnp.zeros((B, H, W, G, K * K, 2), jnp.float32)
        for ky in range(K):
            for kx in range(K):
                t = ky * K + kx
                for g in range(G):
                    offg = off[:, :, :, g]
                    sy, sx, y0, x0, ly, lx = _sample_geom(
                        offg, H, W, base_y, base_x, t, ky, kx
                    )
                    mmd = _mm_dtype()
                    gq = gcol[:, :, :, t, g * cg : (g + 1) * cg].reshape(
                        B, Q, cg
                    ).astype(mmd)

                    y0f = y0.reshape(B, Q, 1)
                    x0f = x0.reshape(B, Q, 1)
                    lyf = ly.reshape(B, Q, 1).astype(mmd)
                    lxf = lx.reshape(B, Q, 1).astype(mmd)
                    wy = (
                        (ygrid == y0f).astype(mmd) * (1 - lyf)
                        + (ygrid == y0f + 1).astype(mmd) * lyf
                    )  # [B,Q,H]
                    wx = (
                        (xgrid == x0f).astype(mmd) * (1 - lxf)
                        + (xgrid == x0f + 1).astype(mmd) * lxf
                    )  # [B,Q,W]
                    # fused tent weight [B,Q,H*W] -> ONE square matmul
                    # (M=HW, K=Q) per (tap, group). 2.3x faster than the
                    # wx*gq [B,Q,W,cg] intermediate + 32-row skinny
                    # einsum it replaces; tap/group-merged variants
                    # measured slower (scripts/profile_deform_bwd.py)
                    wyx = (wy[:, :, :, None] * wx[:, :, None, :]).reshape(
                        B, Q, H * W
                    )
                    gx_g = jnp.einsum(
                        "bqp,bqc->bpc", wyx, gq,
                        preferred_element_type=jnp.float32,
                    ).reshape(B, H, W, cg)
                    gx = gx.at[:, :, :, g * cg : (g + 1) * cg].add(gx_g)

                    # offset grads: corner values via the forward gathers
                    sl = _corners(
                        x[:, :, :, g * cg : (g + 1) * cg], y0, x0, cg
                    ).astype(jnp.float32)
                    v00 = sl[:, :, :, 0, 0]
                    v01 = sl[:, :, :, 0, 1]
                    v10 = sl[:, :, :, 1, 0]
                    v11 = sl[:, :, :, 1, 1]
                    lyc = ly[..., None]
                    lxc = lx[..., None]
                    dvy = (v10 - v00) * (1 - lxc) + (v11 - v01) * lxc
                    dvx = (v01 - v00) * (1 - lyc) + (v11 - v10) * lyc
                    gqf = gcol[:, :, :, t, g * cg : (g + 1) * cg].astype(
                        jnp.float32
                    )
                    # clamped samples get zero positional gradient
                    my = ((sy > 0.0) & (sy < H - 1.0)).astype(jnp.float32)
                    mx = ((sx > 0.0) & (sx < W - 1.0)).astype(jnp.float32)
                    goff = goff.at[:, :, :, g, t, 0].add(
                        jnp.sum(gqf * dvy, axis=-1) * my
                    )
                    goff = goff.at[:, :, :, g, t, 1].add(
                        jnp.sum(gqf * dvx, axis=-1) * mx
                    )
        return gx.astype(x.dtype), goff.reshape(offsets.shape).astype(
            offsets.dtype
        )

    im2col.defvjp(im2col_fwd, im2col_bwd)
    return im2col


def deformable_conv(
    x: jax.Array,
    offsets: jax.Array,
    kernel: jax.Array,
    *,
    num_groups: int = 4,
    kernel_size: int = 3,
    dilation: int = 2,
    conv_groups: int = 1,
) -> jax.Array:
    """DCNv1 convolution, stride 1, 'same' padding.

    x [B,H,W,Cin], offsets [B,H,W,G*K*K*2] (pairs ordered (dy, dx) per
    tap, group-major like the CUDA op; G = num_groups = deformable
    groups), kernel [K,K,Cin/conv_groups,Cout]. conv_groups > 1 gives
    grouped convolution over the deformed taps (the ResNeXt variant).
    Returns [B,H,W,Cout] (accumulated in fp32).
    """
    B, H, W, Cin = x.shape
    K = kernel_size
    G = num_groups
    cg = Cin // G
    half = (K - 1) // 2 * dilation

    col = _make_im2col(G, K, dilation)(x, offsets)  # [B,H,W,K*K,Cin]
    if conv_groups == 1:
        w = kernel.reshape(K * K * Cin, -1)
        return jnp.einsum(
            "bhwc,co->bhwo",
            col.reshape(B, H, W, K * K * Cin),
            w,
            preferred_element_type=jnp.float32,
        )
    # grouped: kernel [K,K,Cin/CG,Cout]; tap-channel blocks map to groups
    cg_in = Cin // conv_groups
    cout = kernel.shape[-1]
    cg_out = cout // conv_groups
    # [B,H,W,K*K,CG,cg_in] -> group-major flattened taps
    col_g = col.reshape(B, H, W, K * K, conv_groups, cg_in)
    col_g = col_g.transpose(0, 1, 2, 4, 3, 5).reshape(
        B, H, W, conv_groups, K * K * cg_in
    )
    w_g = kernel.reshape(K, K, cg_in, conv_groups, cg_out)
    w_g = w_g.transpose(3, 0, 1, 2, 4).reshape(
        conv_groups, K * K * cg_in, cg_out
    )
    out = jnp.einsum(
        "bhwgi,gio->bhwgo", col_g, w_g, preferred_element_type=jnp.float32
    )
    return out.reshape(B, H, W, cout)


def _resize_matrices(start, scale_step, n_out, n_in):
    """Per-roi 1-D bilinear resize matrices.

    start [R]: coordinate of output cell 0's sample point; scale_step
    [R]: spacing between output cells (pixels). Returns (W [R, n_out,
    n_in] tent weights, valid [R, n_out] in-bounds flags). Out-of-bounds
    sample points get zero weight rows (the DCN drop-from-count rule);
    in-bounds points are clamped like the CUDA kernel.
    """
    r = start.shape[0]
    m = jnp.arange(n_out, dtype=jnp.float32)
    pos = start[:, None] + m[None, :] * scale_step[:, None]  # [R, n_out]
    valid = (pos > -0.5) & (pos < n_in - 0.5)
    posc = jnp.clip(pos, 0.0, n_in - 1.0)
    cells = jnp.arange(n_in, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(posc[:, :, None] - cells[None, None, :]))
    return w * valid[:, :, None].astype(w.dtype), valid


def grad_scale(x, scale):
    """Identity with scaled gradient (reference lr_mult emulation)."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


def _roi_geom(crois, spatial_scale, T):
    """DCN roi decode: snap corners to pixels, scale, 0.1 min size.

    crois [..., 5] -> (x1, y1, roi_w, roi_h, sub_w, sub_h), each [...].
    """
    x1 = jnp.round(crois[..., 1]) * spatial_scale - 0.5
    y1 = jnp.round(crois[..., 2]) * spatial_scale - 0.5
    x2 = (jnp.round(crois[..., 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(crois[..., 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    return x1, y1, roi_w, roi_h, roi_w / T, roi_h / T


def _patch_matrices(geom, M, E, H, W):
    """Per-roi 1-D resize matrices onto the E-cell patch grid (patch
    cell t samples at x1 + (t - M + 0.5) * sub). geom from _roi_geom
    with leading shape L -> (wy [*L,E,H], wx [*L,E,W], cnt [*L,E,E]
    fp32 in-bounds mask)."""
    x1, y1, _, _, sub_w, sub_h = geom
    lead = x1.shape
    wy, vy = _resize_matrices(
        (y1 + (0.5 - M) * sub_h).reshape(-1), sub_h.reshape(-1), E, H
    )
    wx, vx = _resize_matrices(
        (x1 + (0.5 - M) * sub_w).reshape(-1), sub_w.reshape(-1), E, W
    )
    wy = wy.reshape(lead + (E, H))
    wx = wx.reshape(lead + (E, W))
    vy = vy.reshape(lead + (E,))
    vx = vx.reshape(lead + (E,))
    cnt = (vy[..., :, None] & vx[..., None, :]).astype(jnp.float32)
    return wy, wx, cnt


def _extract_patch_batched(featc, crois, geom, M, E):
    """Patch extraction for [B, chunk] image-contiguous roi chunks:
    batch-diagonal einsums pair each roi with its own image's [H,W,C]
    rows/cols. tmp/patch stay in the matmul dtype (bf16 on TPU): the
    pool is bandwidth-bound on these intermediates, not FLOP-bound, and
    the tent matrices have <=2 nonzero terms per row so the rounding is
    one bf16 quantization (MXU accumulation is fp32 either way)."""
    B, H, W, C = featc.shape
    wy, wx, cnt = _patch_matrices(geom, M, E, H, W)
    tmp = jnp.einsum(
        "brth,bhwc->brtwc", wy.astype(_mm_dtype()), featc,
        preferred_element_type=_mm_dtype(),
    )  # [B, chunk, E, W, C]
    patch = jnp.einsum(
        "brsw,brtwc->brtsc", wx.astype(_mm_dtype()), tmp,
        preferred_element_type=_mm_dtype(),
    )  # [B, chunk, E, E, C]
    return patch, cnt


def _extract_patches_pallas(featc, geom, M, E):
    """Patch extraction via the Pallas per-roi sampling kernel.

    Same output contract as _extract_patch_batched but over the FULL
    [B, rpi] roi axis in one pallas_call (no lax.map chunking — the
    kernel's [E, W, C] row intermediate lives in VMEM, so there is no
    per-chunk HBM intermediate to bound). geom from _roi_geom with
    leading shape [B, rpi]. Returns (patch [B, rpi, E, E, C] in featc's
    dtype, cnt [B, rpi, E, E] fp32 in-bounds mask).
    """
    from sniper_tpu.ops.pallas.roi_patch import extract_patches

    B, H, W, C = featc.shape
    x1, y1, _, _, sub_w, sub_h = geom
    rpi = x1.shape[1]
    ys = y1 + (0.5 - M) * sub_h
    xs = x1 + (0.5 - M) * sub_w
    patch = extract_patches(
        featc, ys.reshape(-1), xs.reshape(-1),
        sub_h.reshape(-1), sub_w.reshape(-1),
        rois_per_image=rpi, patch_cells=E,
    ).reshape(B, rpi, E, E, C)

    cells = jnp.arange(E, dtype=jnp.float32)
    pos_y = ys[..., None] + cells * sub_h[..., None]
    pos_x = xs[..., None] + cells * sub_w[..., None]
    vy = (pos_y > -0.5) & (pos_y < H - 0.5)
    vx = (pos_x > -0.5) & (pos_x < W - 0.5)
    cnt = (vy[..., :, None] & vx[..., None, :]).astype(jnp.float32)
    return patch, cnt


def _tiled_bin_avg(patch, cnt, P, S):
    """Undeformed per-bin average over a [*, T, T, C] patch (T = P*S):
    the S-wide bin windows tile the patch disjointly, so this is a
    reshape-sum — no sliding-window box-sum chain (whose ~T^2-sized
    fp32 intermediates were the measured bandwidth killer)."""
    lead = patch.shape[:-3]
    C = patch.shape[-1]
    out = patch.astype(jnp.float32).reshape(
        lead + (P, S, P, S, C)
    ).sum(axis=(-4, -2))
    n = cnt.reshape(lead + (P, S, P, S)).sum(axis=(-3, -1))[..., None]
    return jnp.where(n > 0, out / jnp.maximum(n, 1.0), 0.0)


def _stencil_pool(patch, cnt, geom, ctrans, P, S, M, E, trans_std):
    """Deformed per-bin average: learned offsets shift all S^2 samples
    of a bin equally, and the S-sample box average at a shifted window
    is a fixed tent-stack stencil on the patch — each bin is ONE row of
    a fused [P^2, E^2] weight matrix applied as a batched matmul (MXU;
    separable einsum chains and per-roi gathers both measured
    slow/hostile on this backend). patch [*L, E, E, C], ctrans
    [*L, P, P, 2] (plane 0 = dy, plane 1 = dx)."""
    _, _, roi_w, roi_h, sub_w, sub_h = geom
    lead = patch.shape[:-3]
    C = patch.shape[-1]
    off_y = (
        ctrans[..., 0].astype(jnp.float32) * trans_std
        * roi_h[..., None, None]
    )  # [*L, P, P]
    off_x = (
        ctrans[..., 1].astype(jnp.float32) * trans_std
        * roi_w[..., None, None]
    )
    dy = off_y / sub_h[..., None, None]
    dx = off_x / sub_w[..., None, None]
    base = S * jnp.arange(P, dtype=jnp.float32) + M
    # window starts clamp to E - S so all S samples stay on the patch
    py = jnp.clip(base[:, None] + dy, 0.0, float(E - S))
    px = jnp.clip(base[None, :] + dx, 0.0, float(E - S))

    grid = jnp.arange(E, dtype=jnp.float32)

    def stencil(p):
        d = p[..., None] - grid  # [*L, P, P, E] window start minus cell
        w = jnp.zeros_like(d)
        for k in range(S):
            w = w + jnp.maximum(0.0, 1.0 - jnp.abs(d + k))
        return w

    w_y = stencil(py)
    w_x = stencil(px)
    wf = (w_y[..., :, None] * w_x[..., None, :]).reshape(
        lead + (P * P, E * E)
    )
    pooled = jnp.einsum(
        "...pe,...ec->...pc", wf.astype(_mm_dtype()),
        patch.reshape(lead + (E * E, C)).astype(_mm_dtype()),
        preferred_element_type=jnp.float32,
    ).reshape(lead + (P, P, C))
    n = jnp.einsum(
        "...pe,...e->...p", wf, cnt.reshape(lead + (E * E,)),
        preferred_element_type=jnp.float32,
    ).reshape(lead + (P, P))[..., None]
    return jnp.where(n > 0, pooled / jnp.maximum(n, 1.0), 0.0)


def deformable_psroi_pool_fast(
    feat: jax.Array,
    rois: jax.Array,
    trans: jax.Array | None,
    *,
    pooled_size: int = 7,
    sample_per_part: int = 4,
    spatial_scale: float = 0.0625,
    trans_std: float = 0.1,
    margin_bins: int = 2,
    roi_chunk: int = 64,
    rois_per_image: int | None = None,
) -> jax.Array:
    """MXU-native deformable ROI pooling.

    Same interface/semantics as deformable_psroi_pool but restructured
    for TPU: the naive form issues P^2 * S^2 * 4 bilinear gathers per roi
    against the HBM feature map (the profiled hot spot: ~100ms per step).
    Here:

    1. each roi is resized onto its regular (P*S)^2 sample grid (plus a
       margin for offsets) with two per-roi bilinear matrices — batched
       skinny matmuls that run on the MXU, not gathers. Sample positions
       match the CUDA kernel exactly (roi snapping, 0.1 min size,
       drop-out-of-bounds-from-count),
    2. the undeformed per-bin S x S average is a disjoint reshape-sum
       over that patch (_tiled_bin_avg),
    3. per-bin learned offsets shift all S^2 samples of a bin equally,
       so the deformable output is a fused tent-stack stencil matmul
       over the patch (_stencil_pool) — no per-sample gathers.

    Rois are processed in ``roi_chunk`` blocks under lax.map so the
    [chunk, T+2M, W, C] resize intermediate stays bounded (a full-R
    intermediate is multi-GB at test canvases and crashed the TPU
    worker); the resize matmuls run in bf16 with fp32 accumulation.

    For trans=None this is bit-equivalent math to the reference kernel
    (up to bf16 resize rounding). With offsets it reconstructs off-grid
    samples from the patch's piecewise-linear interpolant instead of the
    original map's — a sub-cell approximation (patch cells are one
    sub-sample apart); the margin covers offsets up to ``margin_bins``
    bins, beyond which they clamp. Parameters are trained from scratch in
    this framework, so the op is self-consistent.

    ``rois_per_image``: when the caller guarantees rois are
    image-contiguous (roi i belongs to image i // rois_per_image — how
    multi_proposal/multi_proposal_target emit them), the resize runs as
    batch-diagonal einsums against each roi's own [H,W,C] map instead of
    one-hot-folding the batch into the contraction — a factor-B FLOP
    reduction in the patch extraction at identical chunk memory. The
    rois' batch-index column is ignored on this path.
    """
    B, H, W, C = feat.shape
    P = pooled_size
    S = sample_per_part
    T = P * S
    M = 0 if trans is None else margin_bins * S
    E = T + 2 * M  # extended patch cells per axis
    R = rois.shape[0]

    if rois_per_image is not None and R == B * rois_per_image and B > 1:
        return _psroi_pool_fast_batched(
            feat, rois, trans, pooled_size=P, sample_per_part=S,
            spatial_scale=spatial_scale, trans_std=trans_std,
            margin_bins=margin_bins, roi_chunk=roi_chunk,
            rois_per_image=rois_per_image,
        )

    # pad roi count to a chunk multiple
    n_chunks = max(1, -(-R // roi_chunk))
    pad = n_chunks * roi_chunk - R
    rois_p = jnp.concatenate(
        [rois, jnp.zeros((pad, 5), rois.dtype)], axis=0
    ).reshape(n_chunks, roi_chunk, 5)
    if trans is not None:
        trans_p = jnp.concatenate(
            [trans, jnp.zeros((pad,) + trans.shape[1:], trans.dtype)], axis=0
        ).reshape((n_chunks, roi_chunk) + trans.shape[1:])

    feat_bh = feat.astype(_mm_dtype()).reshape(B * H, W, C)

    def chunk_fn(args):
        crois = args[0]
        ctrans = args[1] if trans is not None else None
        roi_batch = crois[:, 0].astype(jnp.int32)
        geom = _roi_geom(crois, spatial_scale, T)

        wy, wx, cnt = _patch_matrices(geom, M, E, H, W)
        # fold the batch index into the Y matrix (one-hot block
        # embedding): one big [Rc*E, B*H] x [B*H, W*C] matmul against a
        # shared RHS. bf16 intermediates: see _extract_patch_batched.
        onehot = jax.nn.one_hot(roi_batch, B, dtype=wy.dtype)  # [Rc, B]
        wyb = (
            onehot[:, :, None, None] * wy[:, None, :, :]
        ).transpose(0, 2, 1, 3).reshape(roi_chunk, E, B * H)
        tmp = jnp.einsum(
            "rtk,kwc->rtwc", wyb.astype(_mm_dtype()), feat_bh,
            preferred_element_type=_mm_dtype(),
        )  # [Rc, E, W, C]
        patch = jnp.einsum(
            "rsw,rtwc->rtsc", wx.astype(_mm_dtype()), tmp,
            preferred_element_type=_mm_dtype(),
        )  # [Rc, E, E, C]

        if ctrans is None:
            return _tiled_bin_avg(patch, cnt, P, S)
        return _stencil_pool(patch, cnt, geom, ctrans, P, S, M, E,
                             trans_std)

    if trans is None:
        out = jax.lax.map(lambda c: chunk_fn((c,)), rois_p)
    else:
        out = jax.lax.map(lambda c: chunk_fn(c), (rois_p, trans_p))
    out = out.reshape(n_chunks * roi_chunk, P, P, C)
    return out[:R]


def _psroi_pool_fast_batched(
    feat, rois, trans, *, pooled_size, sample_per_part, spatial_scale,
    trans_std, margin_bins, roi_chunk, rois_per_image,
):
    """Batch-diagonal variant of deformable_psroi_pool_fast.

    Same math, but rois are [B, rpi] image-contiguous so the two resize
    contractions pair each roi with its own image's rows/cols
    ("brth,bhwc->brtwc") instead of contracting over a one-hot-embedded
    [B*H] axis — B-fold fewer FLOPs, and the batch axis stays diagonal
    (clean under data-parallel sharding). Chunk size along the roi axis
    is scaled down by B so the [B, chunk, E, E, C] patch intermediate
    keeps the original path's memory footprint.
    """
    B, H, W, C = feat.shape
    P = pooled_size
    S = sample_per_part
    T = P * S
    M = 0 if trans is None else margin_bins * S
    E = T + 2 * M
    rpi = rois_per_image

    chunk_b = max(1, roi_chunk // B)
    n_chunks = -(-rpi // chunk_b)
    pad = n_chunks * chunk_b - rpi

    def to_chunks(x, extra):
        # [B*rpi, ...] -> [n_chunks, B, chunk_b, ...]
        x = x.reshape((B, rpi) + extra)
        x = jnp.concatenate(
            [x, jnp.zeros((B, pad) + extra, x.dtype)], axis=1
        ) if pad else x
        x = x.reshape((B, n_chunks, chunk_b) + extra)
        return jnp.moveaxis(x, 1, 0)

    rois_p = to_chunks(rois, (5,))
    if trans is not None:
        trans_p = to_chunks(trans, trans.shape[1:])

    featc = feat.astype(_mm_dtype())

    def chunk_fn(args):
        crois = args[0]  # [B, chunk_b, 5]
        ctrans = args[1] if trans is not None else None
        geom = _roi_geom(crois, spatial_scale, T)
        patch, cnt = _extract_patch_batched(featc, crois, geom, M, E)
        if ctrans is None:
            return _tiled_bin_avg(patch, cnt, P, S)
        return _stencil_pool(patch, cnt, geom, ctrans, P, S, M, E,
                             trans_std)

    if trans is None:
        out = jax.lax.map(lambda c: chunk_fn((c,)), rois_p)
    else:
        out = jax.lax.map(lambda c: chunk_fn(c), (rois_p, trans_p))
    # [n_chunks, B, chunk_b, P, P, C] -> [B*rpi, P, P, C]
    out = jnp.moveaxis(out, 0, 1).reshape(B, n_chunks * chunk_b, P, P, C)
    return out[:, :rpi].reshape(B * rpi, P, P, C)


def fused_offset_pool(
    feat,
    rois,
    off_k,
    off_b,
    *,
    rois_per_image: int,
    pooled_size: int = 7,
    sample_per_part: int = 4,
    spatial_scale: float = 0.0625,
    trans_std: float = 0.1,
    margin_bins: int = 2,
    roi_chunk: int = 64,
    offset_grad_mult: float = 0.01,
    extract: str = "einsum",
    return_offset_stats: bool = False,
):
    """Two-pass deformable ROI pooling with ONE patch extraction.

    Calling deformable_psroi_pool_fast twice extracts each roi's
    (E x E) patch twice (the offset-predictor pass and the offset-guided
    pass resample identical geometry — only the final bin lookup
    differs), and every intermediate (offset_t, pooled) round-trips HBM
    between the flax layers. Measured on v5e, the no_trans pass alone is
    ~12-14ms per 2400/1200 rois — pure re-extraction. The offset FC is
    per-roi, so the whole two-pass pool fuses into the chunk loop:

      extract margin patch once -> pass-1 bins from its central cells
      (bit-identical to the M=0 pool: interior resize rows coincide) ->
      offset FC (off_k/off_b, zeros-init, offset_grad_mult emulating the
      reference lr_mult) -> stencil lookup.

    Rois must be image-contiguous (rois_per_image, as the proposal ops
    emit). Returns pooled [B*rpi, P*P*C] fp32. Shared by the 7x7 R-CNN
    head (rcnn_head_fused) and the 14x14 mask-branch pooling
    (models/detector.py; reference two-pool composition
    resnet_mx_101_e2e_mask.py mask symbol).

    ``extract`` selects the pooling backend: "einsum" (default, chunked
    lax.map over rois, differentiable via autodiff), "fused"
    (composed-tent Pallas kernel with a hand-written transposed-pool
    VJP, ops/pallas/fused_pool.py — 1.3-2.0x faster on v5e at the test
    canvases, the single-TPU default for inference AND training via
    network.POOL_KERNEL "auto"), or "pallas" (forward-only per-roi
    patch sampling kernel, ops/pallas/roi_patch.py — parity oracle;
    measured SLOWER, see its module docstring).

    ``return_offset_stats``: also return the raw offset-FC output
    [B*rpi, 2*P*P] fp32 (stop-gradiented) so callers can monitor how
    close trained offsets get to the margin clamp — the stencil clips
    window shifts at margin_bins / (trans_std * P) in offset units
    regardless of roi size (the per-roi scale roi/sub is exactly P*S).
    Essentially free: the FC output is already computed in-path on
    every backend.
    """
    B, H, W, C = feat.shape
    P = pooled_size
    S = sample_per_part
    T = P * S
    M = margin_bins * S
    E = T + 2 * M
    rpi = rois_per_image

    if extract == "fused":
        # composed-tent whole-pool Pallas kernel with a hand-written
        # transposed-pool VJP (ops/pallas/fused_pool.py) — usable on
        # both the inference AND training paths
        from sniper_tpu.ops.pallas.fused_pool import fused_pool_vjp

        return fused_pool_vjp(
            feat, rois, off_k, off_b, rois_per_image=rpi,
            pooled_size=P, sample_per_part=S,
            spatial_scale=spatial_scale, trans_std=trans_std,
            margin_bins=margin_bins, offset_grad_mult=offset_grad_mult,
            return_offset_stats=return_offset_stats,
        )

    if extract == "pallas":
        # forward-only Pallas sampling kernel (inference path): one
        # pallas_call over all rois, then the pass-1 average / offset
        # FC / stencil over the full roi axis — no lax.map chunking
        featc = feat.astype(_mm_dtype())
        crois = rois.reshape(B, rpi, 5)
        geom = _roi_geom(crois, spatial_scale, T)
        patch, cnt = _extract_patches_pallas(featc, geom, M, E)
        offset_t = _tiled_bin_avg(
            patch[:, :, M:M + T, M:M + T, :],
            cnt[:, :, M:M + T, M:M + T], P, S,
        )
        off = offset_t.reshape(B, rpi, P * P * C) @ off_k + off_b
        off = grad_scale(off, offset_grad_mult)
        ctrans = off.reshape(B, rpi, 2, P, P).transpose(0, 1, 3, 4, 2)
        pooled = _stencil_pool(patch, cnt, geom, ctrans, P, S, M, E,
                               trans_std)
        pooled = pooled.reshape(B * rpi, P * P * C)
        if return_offset_stats:
            return pooled, jax.lax.stop_gradient(
                off.reshape(B * rpi, 2 * P * P).astype(jnp.float32))
        return pooled

    chunk_b = max(1, roi_chunk // B)
    n_chunks = -(-rpi // chunk_b)
    pad = n_chunks * chunk_b - rpi

    rois_r = rois.reshape(B, rpi, 5)
    if pad:
        rois_r = jnp.concatenate(
            [rois_r, jnp.zeros((B, pad, 5), rois.dtype)], axis=1
        )
    rois_p = jnp.moveaxis(
        rois_r.reshape(B, n_chunks, chunk_b, 5), 1, 0
    )

    featc = feat.astype(_mm_dtype())

    def chunk_fn(crois):  # [B, chunk_b, 5]
        geom = _roi_geom(crois, spatial_scale, T)
        patch, cnt = _extract_patch_batched(featc, crois, geom, M, E)

        # pass 1: undeformed bins from the central cells of the SAME
        # patch — bit-equal to an M=0 pool because the margin patch's
        # interior resize rows coincide with the M=0 grid's
        offset_t = _tiled_bin_avg(
            patch[:, :, M:M + T, M:M + T, :],
            cnt[:, :, M:M + T, M:M + T], P, S,
        )

        off = (
            offset_t.reshape(B, chunk_b, P * P * C) @ off_k + off_b
        )
        off = grad_scale(off, offset_grad_mult)
        ctrans = off.reshape(B, chunk_b, 2, P, P).transpose(0, 1, 3, 4, 2)

        pooled = _stencil_pool(patch, cnt, geom, ctrans, P, S, M, E,
                               trans_std)
        pooled = pooled.reshape(B, chunk_b, P * P * C)
        if return_offset_stats:
            return pooled, jax.lax.stop_gradient(
                off.astype(jnp.float32))
        return pooled

    out = jax.lax.map(chunk_fn, rois_p)  # [n_chunks, B, chunk_b, ...]
    pooled, off = out if return_offset_stats else (out, None)
    pooled = jnp.moveaxis(pooled, 0, 1).reshape(
        B, n_chunks * chunk_b, P * P * C
    )[:, :rpi].reshape(B * rpi, P * P * C)
    if return_offset_stats:
        off = jnp.moveaxis(off, 0, 1).reshape(
            B, n_chunks * chunk_b, 2 * P * P
        )[:, :rpi].reshape(B * rpi, 2 * P * P)
        return pooled, off
    return pooled


def rcnn_head_fused(
    feat,
    rois,
    head_params,
    *,
    rois_per_image: int,
    pooled_size: int = 7,
    sample_per_part: int = 4,
    spatial_scale: float = 0.0625,
    trans_std: float = 0.1,
    margin_bins: int = 2,
    roi_chunk: int = 64,
    offset_grad_mult: float = 0.01,
    extract: str = "einsum",
    return_offset_stats: bool = False,
):
    """fused_offset_pool + the R-CNN FC stack.

    ``head_params`` is the tuple (offset_k, offset_b, fc1_k, fc1_b,
    fc2_k, fc2_b, cls_k, cls_b, bbox_k, bbox_b) of raw [in, out]/[out]
    arrays (the flax module holds them; see models/heads.RCNNHead).
    Returns (cls_score [R, num_classes], bbox_pred [R, 4]), fp32 —
    plus the raw offset-FC output [R, 2*P*P] when
    ``return_offset_stats`` (see fused_offset_pool).

    The FCs run once over the full roi axis, OUTSIDE the pool's chunk
    loop — inside they'd run at M = chunk per step and re-stream the
    12544x1024 weights every iteration (measured 2x slower overall).
    """
    (off_k, off_b, f1_k, f1_b, f2_k, f2_b, c_k, c_b, b_k, b_b) = head_params
    pooled = fused_offset_pool(
        feat, rois, off_k, off_b, rois_per_image=rois_per_image,
        pooled_size=pooled_size, sample_per_part=sample_per_part,
        spatial_scale=spatial_scale, trans_std=trans_std,
        margin_bins=margin_bins, roi_chunk=roi_chunk,
        offset_grad_mult=offset_grad_mult, extract=extract,
        return_offset_stats=return_offset_stats,
    )
    pooled, off = pooled if return_offset_stats else (pooled, None)
    h = jax.nn.relu(pooled @ f1_k + f1_b)
    h = jax.nn.relu(h @ f2_k + f2_b)
    cls_score, bbox_pred = h @ c_k + c_b, h @ b_k + b_b
    if return_offset_stats:
        return cls_score, bbox_pred, off
    return cls_score, bbox_pred


def deformable_psroi_pool(
    feat: jax.Array,
    rois: jax.Array,
    trans: jax.Array | None,
    *,
    pooled_size: int = 7,
    sample_per_part: int = 4,
    spatial_scale: float = 0.0625,
    trans_std: float = 0.1,
) -> jax.Array:
    """Deformable ROI pooling (DCN DeformablePSROIPooling, group_size=1).

    feat [B,H,W,C]; rois [R,5] (batch idx + xyxy in image pixels);
    trans [R, P, P, 2] per-bin normalized offsets (dy, dx) or None
    (the ``no_trans`` offset-predictor pass). Returns [R, P, P, C].
    """
    B, H, W, C = feat.shape
    P = pooled_size
    S = sample_per_part

    roi_batch = rois[:, 0].astype(jnp.int32)
    # DCN snaps roi corners to integer pixels before scaling
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / P  # [R]
    bin_h = roi_h / P
    sub_w = bin_w / S
    sub_h = bin_h / S

    if trans is None:
        off_y = jnp.zeros((rois.shape[0], P, P))
        off_x = jnp.zeros((rois.shape[0], P, P))
    else:
        off_y = trans[..., 0].astype(jnp.float32) * trans_std * roi_h[:, None, None]
        off_x = trans[..., 1].astype(jnp.float32) * trans_std * roi_w[:, None, None]

    py = jax.lax.broadcasted_iota(jnp.float32, (P, P), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (P, P), 1)
    # bin start corners [R,P,P]
    hstart = y1[:, None, None] + py * bin_h[:, None, None] + off_y
    wstart = x1[:, None, None] + px * bin_w[:, None, None] + off_x

    feat_flat = feat.reshape(B, H * W, C)

    acc = jnp.zeros((rois.shape[0], P, P, C), dtype=jnp.float32)
    cnt = jnp.zeros((rois.shape[0], P, P, 1), dtype=jnp.float32)
    for ih in range(S):
        for iw in range(S):
            h = hstart + (ih + 0.5) * sub_h[:, None, None]
            w = wstart + (iw + 0.5) * sub_w[:, None, None]
            inb = (
                (w > -0.5) & (w < W - 0.5) & (h > -0.5) & (h < H - 0.5)
            ).astype(jnp.float32)[..., None]
            hc = jnp.clip(h, 0.0, H - 1.0)
            wc = jnp.clip(w, 0.0, W - 1.0)

            def sample(fi, hy, wx):
                return _bilinear_gather(fi, hy, wx, H, W)

            # gather per roi from its batch image
            v = jax.vmap(sample)(feat_flat[roi_batch], hc, wc)  # [R,P,P,C]
            acc = acc + v.astype(jnp.float32) * inb
            cnt = cnt + inb
    return acc / jnp.maximum(cnt, 1.0)
