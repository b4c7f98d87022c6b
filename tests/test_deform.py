"""Deformable op tests: zero-offset equivalence to standard convs/pools
and a literal NumPy oracle for the DCN ROI-pooling semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sniper_tpu.ops.deform import deformable_conv, deformable_psroi_pool


def test_deform_conv_zero_offsets_equals_dilated_conv(rng):
    B, H, W, C, O = 2, 12, 12, 8, 6
    x = rng.randn(B, H, W, C).astype(np.float32)
    k = rng.randn(3, 3, C, O).astype(np.float32) * 0.1
    offsets = np.zeros((B, H, W, 4 * 9 * 2), np.float32)
    got = deformable_conv(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(k),
                          num_groups=4, dilation=2)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), [(2, 2), (2, 2)],
        rhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # borders differ: zero-padding (conv) vs edge-clamped sampling (deform);
    # compare interior only
    np.testing.assert_allclose(
        np.asarray(got)[:, 2:-2, 2:-2], np.asarray(want)[:, 2:-2, 2:-2],
        rtol=1e-4, atol=1e-4,
    )


def test_deform_conv_offset_shifts_sampling(rng):
    # constant-gradient image: offset of +1 in x shifts the sampled value
    B, H, W = 1, 10, 10
    ramp = np.arange(W, dtype=np.float32)[None, None, :, None] * np.ones((B, H, W, 4))
    k = np.zeros((3, 3, 4, 1), np.float32)
    k[1, 1, 0, 0] = 1.0  # identity on center tap, channel 0
    off0 = np.zeros((B, H, W, 1 * 9 * 2), np.float32)
    off1 = off0.copy()
    off1[..., 2 * 4 + 1] = 1.0  # center tap (t=4) x-offset +1
    y0 = np.asarray(deformable_conv(jnp.asarray(ramp), jnp.asarray(off0),
                                    jnp.asarray(k), num_groups=1, dilation=1))
    y1 = np.asarray(deformable_conv(jnp.asarray(ramp), jnp.asarray(off1),
                                    jnp.asarray(k), num_groups=1, dilation=1))
    np.testing.assert_allclose(y1[0, :, :-2, 0] - y0[0, :, :-2, 0], 1.0, atol=1e-5)


def psroi_oracle(feat, rois, trans, P, S, scale, trans_std):
    """Literal CUDA-kernel transliteration (one roi, NHWC feat)."""
    B, H, W, C = feat.shape
    out = np.zeros((len(rois), P, P, C), np.float64)
    for r, roi in enumerate(rois):
        b = int(roi[0])
        x1 = round(roi[1]) * scale - 0.5
        y1 = round(roi[2]) * scale - 0.5
        x2 = (round(roi[3]) + 1.0) * scale - 0.5
        y2 = (round(roi[4]) + 1.0) * scale - 0.5
        rw, rh = max(x2 - x1, 0.1), max(y2 - y1, 0.1)
        bw, bh = rw / P, rh / P
        sw, sh = bw / S, bh / S
        for i in range(P):
            for j in range(P):
                oy = trans[r, i, j, 0] * trans_std * rh if trans is not None else 0
                ox = trans[r, i, j, 1] * trans_std * rw if trans is not None else 0
                hs = y1 + i * bh + oy
                ws = x1 + j * bw + ox
                acc = np.zeros(C)
                cnt = 0
                for ih in range(S):
                    for iw in range(S):
                        h = hs + (ih + 0.5) * sh
                        w = ws + (iw + 0.5) * sw
                        if w < -0.5 or w > W - 0.5 or h < -0.5 or h > H - 0.5:
                            continue
                        h = min(max(h, 0), H - 1)
                        w = min(max(w, 0), W - 1)
                        h0, w0 = int(np.floor(h)), int(np.floor(w))
                        h1, w1 = min(h0 + 1, H - 1), min(w0 + 1, W - 1)
                        lh, lw = h - h0, w - w0
                        v = (
                            feat[b, h0, w0] * (1 - lh) * (1 - lw)
                            + feat[b, h0, w1] * (1 - lh) * lw
                            + feat[b, h1, w0] * lh * (1 - lw)
                            + feat[b, h1, w1] * lh * lw
                        )
                        acc += v
                        cnt += 1
                out[r, i, j] = acc / max(cnt, 1)
    return out


def test_psroi_pool_matches_oracle(rng):
    feat = rng.randn(2, 16, 16, 5).astype(np.float32)
    rois = np.array(
        [[0, 10, 20, 120, 200], [1, 0, 0, 255, 255], [0, 200, 200, 250, 250]],
        np.float32,
    )
    trans = (rng.randn(3, 7, 7, 2) * 0.5).astype(np.float32)
    got = np.asarray(
        deformable_psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                              jnp.asarray(trans))
    )
    want = psroi_oracle(feat, rois, trans, 7, 4, 0.0625, 0.1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_psroi_pool_no_trans_matches_oracle(rng):
    feat = rng.randn(1, 8, 8, 3).astype(np.float32)
    rois = np.array([[0, 16, 16, 96, 96]], np.float32)
    got = np.asarray(
        deformable_psroi_pool(jnp.asarray(feat), jnp.asarray(rois), None)
    )
    want = psroi_oracle(feat, rois, None, 7, 4, 0.0625, 0.1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_ops_differentiable(rng):
    feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    rois = jnp.asarray(np.array([[0, 10, 10, 100, 100]], np.float32))

    def f(feat):
        return deformable_psroi_pool(feat, rois, None).sum()

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_psroi_fast_no_trans_exact(rng):
    from sniper_tpu.ops.deform import deformable_psroi_pool_fast

    feat = rng.randn(2, 16, 16, 5).astype(np.float32)
    rois = np.array(
        [[0, 10, 20, 120, 200], [1, 0, 0, 255, 255], [0, 200, 200, 250, 250]],
        np.float32,
    )
    ref = np.asarray(
        deformable_psroi_pool(jnp.asarray(feat), jnp.asarray(rois), None)
    )
    fast = np.asarray(
        deformable_psroi_pool_fast(jnp.asarray(feat), jnp.asarray(rois), None)
    )
    # exact math; tolerance covers the op's bf16 resize matmuls
    np.testing.assert_allclose(fast, ref, atol=2e-2)


def test_psroi_fast_zero_trans_matches_no_trans(rng):
    from sniper_tpu.ops.deform import deformable_psroi_pool_fast

    feat = rng.randn(1, 12, 12, 3).astype(np.float32)
    rois = np.array([[0, 16, 16, 120, 120]], np.float32)
    trans = np.zeros((1, 7, 7, 2), np.float32)
    a = np.asarray(
        deformable_psroi_pool_fast(jnp.asarray(feat), jnp.asarray(rois),
                                   jnp.asarray(trans))
    )
    b = np.asarray(
        deformable_psroi_pool_fast(jnp.asarray(feat), jnp.asarray(rois), None)
    )
    # same math, different summation path (fused bf16 matmul vs box sums)
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_psroi_fast_small_trans_close_to_reference(rng):
    from sniper_tpu.ops.deform import deformable_psroi_pool_fast

    # smooth feature -> the patch-interpolant approximation is tight
    yy, xx = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
    feat = np.stack([np.sin(yy / 4.0), np.cos(xx / 5.0)], -1)[None].astype(
        np.float32
    )
    rois = np.array([[0, 30, 30, 300, 300]], np.float32)
    trans = (rng.randn(1, 7, 7, 2) * 0.5).astype(np.float32)
    ref = np.asarray(
        deformable_psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                              jnp.asarray(trans))
    )
    fast = np.asarray(
        deformable_psroi_pool_fast(jnp.asarray(feat), jnp.asarray(rois),
                                   jnp.asarray(trans))
    )
    np.testing.assert_allclose(fast, ref, atol=0.05)


def test_psroi_fast_margin1_matches_margin2(rng):
    """margin_bins only sets the patch halo: offsets within 1 bin of
    the roi edge are identical between margin 1 and 2 (interior patch
    cells coincide); only shifts past the smaller halo clamp."""
    from sniper_tpu.ops.deform import deformable_psroi_pool_fast

    feat = rng.randn(2, 20, 20, 4).astype(np.float32)
    rois = np.array(
        [[0, 30, 30, 200, 260], [1, 0, 0, 310, 310], [0, 80, 40, 300, 200]],
        np.float32,
    )
    # |trans| <= 1.0 -> shift <= trans_std * P = 0.7 bins < 1-bin halo
    trans = np.clip(rng.randn(3, 7, 7, 2) * 0.5, -1.0, 1.0).astype(
        np.float32
    )
    outs = {}
    for m in (1, 2):
        outs[m] = np.asarray(deformable_psroi_pool_fast(
            jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(trans),
            margin_bins=m,
        ))
    np.testing.assert_allclose(outs[1], outs[2], atol=5e-3)


def test_psroi_fast_differentiable(rng):
    from sniper_tpu.ops.deform import deformable_psroi_pool_fast

    feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    rois = jnp.asarray(np.array([[0, 10, 10, 100, 100]], np.float32))
    trans = jnp.asarray((rng.randn(1, 7, 7, 2) * 0.1).astype(np.float32))

    def f(feat, trans):
        return deformable_psroi_pool_fast(feat, rois, trans).sum()

    gf, gt = jax.grad(f, argnums=(0, 1))(feat, trans)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.abs(np.asarray(gf)).sum() > 0
    assert np.abs(np.asarray(gt)).sum() > 0


def test_deform_conv_custom_vjp_grads_match_autodiff(rng):
    """Custom backward (one-hot matmuls) vs plain autodiff of a
    reference take-based implementation."""
    from sniper_tpu.ops.deform import _bilinear_gather

    B, H, W, C, G = 1, 6, 7, 8, 2
    cg = C // G
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    offs = jnp.asarray((rng.randn(B, H, W, G * 9 * 2) * 0.7).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, C, 5) * 0.1).astype(np.float32))

    def ref_conv(x, offs, k):
        # plain-autodiff reference: per-corner takes (XLA scatter bwd)
        base_y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        base_x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        off = offs.reshape(B, H, W, G, 9, 2)
        cols = []
        for ky in range(3):
            for kx in range(3):
                t = ky * 3 + kx
                per_g = []
                for g in range(G):
                    dy = (ky - 1) + off[0, :, :, g, t, 0]
                    dx = (kx - 1) + off[0, :, :, g, t, 1]
                    fg = x[0, :, :, g * cg:(g + 1) * cg].reshape(H * W, cg)
                    per_g.append(
                        _bilinear_gather(fg, base_y + dy, base_x + dx, H, W)
                    )
                cols.append(jnp.concatenate(per_g, -1))
        col = jnp.stack(cols, 2)[None]
        return jnp.einsum("bhwtc,tco->bhwo",
                          col.reshape(B, H, W, 9, C),
                          k.reshape(9, C, 5))

    from sniper_tpu.ops.deform import deformable_conv

    def loss_new(x, offs):
        return jnp.sum(
            deformable_conv(x, offs, k, num_groups=G, dilation=1) ** 2
        )

    def loss_ref(x, offs):
        return jnp.sum(ref_conv(x, offs, k) ** 2)

    # forwards agree (away from clamp boundaries, interior offsets)
    np.testing.assert_allclose(
        float(loss_new(x, offs)), float(loss_ref(x, offs)), rtol=1e-3
    )
    gx_n, go_n = jax.grad(loss_new, argnums=(0, 1))(x, offs)
    gx_r, go_r = jax.grad(loss_ref, argnums=(0, 1))(x, offs)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                               rtol=2e-2, atol=2e-2)
    # offset grads differ at clamped samples (ref clamps values, we zero
    # positional grads there); compare interior-dominated bulk
    diff = np.abs(np.asarray(go_n) - np.asarray(go_r))
    agree = (diff < 0.05 * (1 + np.abs(np.asarray(go_r)))).mean()
    assert agree > 0.9, f"offset grads agree only {agree:.2%}"


def _contiguous_rois(rng, B, rpi, fh, fw):
    rois = np.zeros((B * rpi, 5), np.float32)
    rois[:, 0] = np.repeat(np.arange(B), rpi)
    rois[:, 1] = rng.uniform(0, fw * 16 - 80, B * rpi)
    rois[:, 2] = rng.uniform(0, fh * 16 - 80, B * rpi)
    rois[:, 3] = rois[:, 1] + rng.uniform(8, 140, B * rpi)
    rois[:, 4] = rois[:, 2] + rng.uniform(8, 140, B * rpi)
    return jnp.asarray(rois)


def test_psroi_fast_batched_path_matches_onehot(rng):
    """rois_per_image (batch-diagonal) path is numerically identical to
    the general one-hot path, forwards and input grads."""
    from sniper_tpu.ops.deform import deformable_psroi_pool_fast

    B, fh, fw, C, rpi = 3, 14, 18, 16, 21
    feat = jnp.asarray(rng.randn(B, fh, fw, C).astype(np.float32))
    rois = _contiguous_rois(rng, B, rpi, fh, fw)
    trans = jnp.asarray(
        (rng.randn(B * rpi, 7, 7, 2) * 0.5).astype(np.float32)
    )
    for tr in (None, trans):
        a = deformable_psroi_pool_fast(feat, rois, tr, roi_chunk=16)
        b = deformable_psroi_pool_fast(
            feat, rois, tr, roi_chunk=16, rois_per_image=rpi
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    ga, ta = jax.grad(
        lambda f, t: (deformable_psroi_pool_fast(f, rois, t) ** 2).sum(),
        argnums=(0, 1),
    )(feat, trans)
    gb, tb = jax.grad(
        lambda f, t: (deformable_psroi_pool_fast(
            f, rois, t, rois_per_image=rpi
        ) ** 2).sum(),
        argnums=(0, 1),
    )(feat, trans)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-3)
    # trans (offset) gradients flow through the structurally different
    # batched stencil layout too
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), atol=1e-3)


# slow set: 14x14 mask-config variant of the batched-path parity
@pytest.mark.slow
def test_psroi_fast_batched_pool14_mask_config(rng):
    """The mask branch routes pooled_size=14 through the batched path
    during training; check it against the one-hot path, values + trans
    grads."""
    from sniper_tpu.ops.deform import deformable_psroi_pool_fast

    B, fh, fw, C, rpi, P = 2, 10, 12, 8, 9, 14
    feat = jnp.asarray(rng.randn(B, fh, fw, C).astype(np.float32))
    rois = _contiguous_rois(rng, B, rpi, fh, fw)
    trans = jnp.asarray(
        (rng.randn(B * rpi, P, P, 2) * 0.5).astype(np.float32)
    )
    a = deformable_psroi_pool_fast(feat, rois, trans, pooled_size=P)
    b = deformable_psroi_pool_fast(
        feat, rois, trans, pooled_size=P, rois_per_image=rpi
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    ta = jax.grad(
        lambda t: (deformable_psroi_pool_fast(
            feat, rois, t, pooled_size=P
        ) ** 2).sum()
    )(trans)
    tb = jax.grad(
        lambda t: (deformable_psroi_pool_fast(
            feat, rois, t, pooled_size=P, rois_per_image=rpi
        ) ** 2).sum()
    )(trans)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), atol=1e-3)


# slow set: head-level composition parity; component parity runs fast
@pytest.mark.slow
def test_rcnn_head_fused_matches_two_pool_composition(rng):
    """The single-loop fused head (one patch extraction) reproduces the
    reference-shaped two-pool + Dense composition bit-for-bit, values
    and parameter gradients."""
    from sniper_tpu.models.heads import RCNNHead

    B, fh, fw, C, rpi = 2, 12, 16, 32, 13
    feat = jnp.asarray(rng.randn(B, fh, fw, C).astype(np.float32))
    rois = _contiguous_rois(rng, B, rpi, fh, fw)

    # margin_bins=2: the random 0.05 offset kernel produces shifts past
    # the default 1-bin halo; the wide halo keeps fused == composition
    # (clamp semantics at margin 1 are pinned by
    # test_psroi_fast_margin1_matches_margin2)
    h_ref = RCNNHead(num_classes=7, fc_dim=48, fused=False)
    h_fus = RCNNHead(num_classes=7, fc_dim=48, fused=True, margin_bins=2)
    vs = h_ref.init(jax.random.PRNGKey(0), feat, rois)
    # non-zero offset kernel so the second pass actually deforms
    p = {k: dict(v) for k, v in vs["params"].items()}
    p["offset"] = dict(p["offset"])
    p["offset"]["kernel"] = jnp.asarray(
        rng.randn(*p["offset"]["kernel"].shape).astype(np.float32) * 0.05
    )
    vs = {"params": p}

    c1, b1 = h_ref.apply(vs, feat, rois)
    c2, b2 = h_fus.apply(vs, feat, rois)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)

    def loss(v, mod):
        c, b = mod.apply(v, feat, rois)
        return (c ** 2).sum() * 0.01 + (b ** 2).sum() * 0.01

    g1 = jax.tree_util.tree_leaves(jax.grad(lambda v: loss(v, h_ref))(vs))
    g2 = jax.tree_util.tree_leaves(jax.grad(lambda v: loss(v, h_fus))(vs))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
