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

import jax
import jax.numpy as jnp


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

    base_y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    off = offsets.astype(jnp.float32).reshape(B, H, W, G, K * K, 2)

    def one_image(xi, offi):
        # xi [H,W,Cin], offi [H,W,G,K*K,2]
        cols = []
        for ky in range(K):
            for kx in range(K):
                t = ky * K + kx
                dy = (ky * dilation - half) + offi[:, :, :, t, 0]  # [H,W,G]
                dx = (kx * dilation - half) + offi[:, :, :, t, 1]
                sy = base_y[:, :, None] + dy
                sx = base_x[:, :, None] + dx
                per_group = []
                for g in range(G):
                    fg = xi[:, :, g * cg : (g + 1) * cg].reshape(H * W, cg)
                    per_group.append(
                        _bilinear_gather(fg, sy[:, :, g], sx[:, :, g], H, W)
                    )
                cols.append(jnp.concatenate(per_group, axis=-1))  # [H,W,Cin]
        return jnp.stack(cols, axis=2)  # [H,W,K*K,Cin]

    col = jax.vmap(one_image)(x, off)  # [B,H,W,K*K,Cin]
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
