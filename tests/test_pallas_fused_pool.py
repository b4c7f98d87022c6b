"""Parity tests for the fused two-pass-pool Pallas kernels.

fused_pool_pallas (ops/pallas/fused_pool.py, interpret mode on CPU)
must match ops.deform.fused_offset_pool's einsum path — the same DCN
sampling semantics (roi snapping, 0.1 min size, drop-out-of-bounds-
from-count, clamp in-bounds) through extraction, pass-1 interior
average, offset FC, and the offset-shifted stencil pooling. On CPU both
paths compute in fp32; small differences remain from accumulation
order (dense-dot vs tent-einsum), so tolerances are loose-ish but tight
relative to the output scale.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sniper_tpu.ops.deform import fused_offset_pool
from sniper_tpu.ops.pallas.fused_pool import fused_pool_pallas


def _random_rois(rng, B, rpi, span=400):
    R = B * rpi
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = np.repeat(np.arange(B), rpi)
    rois[:, 1] = rng.uniform(-40, span, R)
    rois[:, 2] = rng.uniform(-40, span, R)
    rois[:, 3] = rois[:, 1] + rng.uniform(3, span, R)
    rois[:, 4] = rois[:, 2] + rng.uniform(3, span, R)
    return rois


def _params(rng, C, P=7):
    off_k = jnp.asarray((rng.randn(P * P * C, P * P * 2) * 0.05)
                        .astype(np.float32))
    off_b = jnp.asarray((rng.randn(P * P * 2) * 0.1).astype(np.float32))
    return off_k, off_b


@pytest.mark.parametrize("margin_bins", [1, 2])
def test_fused_pool_matches_einsum(rng, margin_bins):
    B, H, W, C = 2, 20, 28, 8
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rpi = 6
    rois = jnp.asarray(_random_rois(rng, B, rpi))
    off_k, off_b = _params(rng, C)

    a = fused_offset_pool(feat, rois, off_k, off_b, rois_per_image=rpi,
                          margin_bins=margin_bins, extract="einsum")
    b = fused_pool_pallas(feat, rois, off_k, off_b, rois_per_image=rpi,
                          margin_bins=margin_bins)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=3e-5, rtol=2e-4)


def test_degenerate_and_offmap_rois(rng):
    """Off-map rois pool to exactly zero (count semantics, off = off_b
    path); sub-pixel rois stay finite and match."""
    B, H, W, C = 1, 10, 12, 4
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rois = jnp.asarray(np.array([
        [0, -500, -500, -400, -400],     # fully off-map (negative side)
        [0, 5000, 5000, 6000, 6000],     # fully off-map (positive side)
        [0, 40, 40, 41, 41],             # sub-bin roi (0.1 min size)
    ], np.float32))
    off_k, off_b = _params(rng, C)
    a = fused_offset_pool(feat, rois, off_k, off_b, rois_per_image=3,
                          margin_bins=1, extract="einsum")
    b = fused_pool_pallas(feat, rois, off_k, off_b, rois_per_image=3,
                          margin_bins=1)
    assert np.isfinite(np.asarray(b)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=3e-5, rtol=2e-4)
    assert np.abs(np.asarray(b)[:2]).max() == 0.0


def test_rcnn_head_extract_fused_matches_einsum(rng):
    """The head-level plumbing: RCNNHead(extract='fused') must produce
    the same cls/bbox outputs as the einsum default (CPU f32)."""
    import jax
    from sniper_tpu.models.heads import RCNNHead

    B, H, W, C = 2, 12, 16, 8
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rpi = 4
    rois = jnp.asarray(_random_rois(rng, B, rpi, span=200))
    head = RCNNHead(num_classes=5, spatial_scale=1.0 / 16, fc_dim=32)
    v = head.init(jax.random.PRNGKey(0), feat, rois)
    # zeros-init offset FC predicts no shift; randomize to exercise the
    # stencil path through both backends
    v = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.05),
        v)
    a_cls, a_box = head.apply(v, feat, rois, extract="einsum")
    b_cls, b_box = head.apply(v, feat, rois, extract="fused")
    np.testing.assert_allclose(np.asarray(a_cls), np.asarray(b_cls),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a_box), np.asarray(b_box),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "fc_scale, margin_bins",
    # fc_scale regimes at margin 1 (the default): zeros-init FC puts
    # every window start ON the tent kinks (0.0), small offsets stay
    # interior (0.01), large offsets hit the clip rails (0.1); one
    # margin-2 case re-checks the halo arithmetic (the full 3x2 grid
    # measured ~70s of the fast suite for no extra coverage).
    [(0.0, 1), (0.01, 1), (0.1, 1), (0.01, 2)],
)
def test_vjp_grads_match_einsum_autodiff(rng, margin_bins, fc_scale):
    """fused_pool_vjp's hand-written backward == jax autodiff of the
    einsum path, for d(feat), d(off_k), d(off_b) — including the
    subgradient conventions at the tent kinks (fc_scale=0 evaluates
    every bin at integer window starts, where jnp.abs'(0)=+1 and
    jnp.maximum ties split in half) and the zero-gradient clip rails
    (fc_scale=0.1 pushes starts past the patch halo)."""
    import jax
    from sniper_tpu.ops.pallas.fused_pool import fused_pool_vjp

    B, H, W, C = 2, 20, 28, 8
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rpi = 6
    rois = jnp.asarray(_random_rois(rng, B, rpi))
    P = 7
    off_k = jnp.asarray((rng.randn(P * P * C, 2 * P * P) * fc_scale)
                        .astype(np.float32))
    off_b = jnp.asarray((rng.randn(2 * P * P) * fc_scale)
                        .astype(np.float32))
    gct = jnp.asarray(rng.randn(B * rpi, P * P * C).astype(np.float32))

    def loss(fn, feat, off_k, off_b):
        out = fn(feat, rois, off_k, off_b, rois_per_image=rpi,
                 margin_bins=margin_bins)
        return jnp.sum(out * gct)

    def ein(feat, rois, off_k, off_b, **kw):
        return fused_offset_pool(feat, rois, off_k, off_b,
                                 extract="einsum", **kw)

    ge = jax.grad(lambda *a: loss(ein, *a), argnums=(0, 1, 2))(
        feat, off_k, off_b)
    gf = jax.grad(lambda *a: loss(fused_pool_vjp, *a), argnums=(0, 1, 2))(
        feat, off_k, off_b)
    for name, a, b in zip(("dfeat", "doff_k", "doff_b"), ge, gf):
        a, b = np.asarray(a), np.asarray(b)
        tol = 2e-5 * max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=tol, err_msg=name)


# slow set: the pool-count tie corner; the main VJP grad parity runs fast
@pytest.mark.slow
def test_vjp_pool_count_tie_grads(rng):
    """Valid-count tie (n == 1.0) subgradient: jnp.maximum autodiff
    splits the tie in half, so the divisor gradient at n == 1.0 is
    -0.5*g*numer/den^2, NOT zero. The tie only carries gradient when an
    integer-positioned stencil window sits exactly on the validity
    boundary, which needs feature-aligned roi coords + integer bin
    sizes + zeros-init FC (the step-1 training regime) + a roi
    straddling the feature-map border — the rois below were found by an
    old-gate vs einsum-autodiff search; the old `n > 1.0` gate was off
    by 58% relative on doff_k here."""
    import jax
    from sniper_tpu.ops.pallas.fused_pool import fused_pool_vjp

    B, H, W, C = 1, 20, 28, 8
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    # 20x28 feature map = 320x448 image px; bin size 3 feature px
    rois = jnp.asarray(np.array([
        [0, -32, 16, 304, 352],
        [0, -80, 16, 256, 352],
        [0, -128, 16, 208, 352],
    ], np.float32))
    rpi = 3
    P = 7
    off_k = jnp.zeros((P * P * C, 2 * P * P), jnp.float32)
    off_b = jnp.zeros((2 * P * P), jnp.float32)
    gct = jnp.asarray(rng.randn(rpi, P * P * C).astype(np.float32))

    def loss(fn, feat, off_k, off_b, **kw):
        out = fn(feat, rois, off_k, off_b, rois_per_image=rpi,
                 margin_bins=1, **kw)
        return jnp.sum(out * gct)

    def ein(*a, **kw):
        return fused_offset_pool(*a, extract="einsum", **kw)

    ge = jax.grad(lambda *a: loss(ein, *a), argnums=(0, 1, 2))(
        feat, off_k, off_b)
    gf = jax.grad(lambda *a: loss(fused_pool_vjp, *a), argnums=(0, 1, 2))(
        feat, off_k, off_b)
    for name, a, b in zip(("dfeat", "doff_k", "doff_b"), ge, gf):
        a, b = np.asarray(a), np.asarray(b)
        tol = 2e-5 * max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=tol, err_msg=name)


# slow set: head-level grad parity; the VJP-level grad parity runs fast
@pytest.mark.slow
def test_head_train_grads_fused_matches_einsum(rng):
    """Head-level training plumbing: grads of a scalar loss wrt ALL head
    params (offset FC, fc6/fc7, cls/bbox) agree between the einsum and
    fused backends."""
    import jax
    from sniper_tpu.models.heads import RCNNHead

    B, H, W, C = 2, 12, 16, 8
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rpi = 4
    rois = jnp.asarray(_random_rois(rng, B, rpi, span=200))
    head = RCNNHead(num_classes=5, spatial_scale=1.0 / 16, fc_dim=32)
    v = head.init(jax.random.PRNGKey(0), feat, rois)
    v = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.05),
        v)

    def loss(v, extract):
        cls, box = head.apply(v, feat, rois, extract=extract)
        return jnp.sum(jnp.tanh(cls)) + jnp.sum(box * box)

    ge = jax.grad(loss)(v, "einsum")
    gf = jax.grad(loss)(v, "fused")
    flat_e, _ = jax.tree_util.tree_flatten_with_path(ge)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    for (pa, a), (_, b) in zip(flat_e, flat_f):
        a, b = np.asarray(a), np.asarray(b)
        tol = 5e-5 * max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=tol,
                                   err_msg=jax.tree_util.keystr(pa))


# slow set: telemetry parity (the clamp math also runs in train smokes)
@pytest.mark.slow
def test_offset_stats_parity_and_clamp_math(rng):
    """return_offset_stats: the raw offset-FC output agrees between the
    einsum path and the fused Pallas VJP path, and the documented clamp
    threshold (margin_bins / (trans_std * P)) matches where the stencil
    actually stops responding to larger offsets."""
    from sniper_tpu.ops.pallas.fused_pool import fused_pool_vjp

    B, H, W, C = 2, 16, 20, 8
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rpi = 4
    rois = jnp.asarray(_random_rois(rng, B, rpi, span=250))
    off_k, off_b = _params(rng, C)

    pe, oe = fused_offset_pool(feat, rois, off_k, off_b,
                               rois_per_image=rpi, margin_bins=1,
                               return_offset_stats=True)
    pf, of = fused_pool_vjp(feat, rois, off_k, off_b,
                            rois_per_image=rpi, margin_bins=1,
                            return_offset_stats=True)
    np.testing.assert_allclose(np.asarray(oe), np.asarray(of),
                               atol=1e-4, rtol=1e-3)
    tol = 1e-4 * max(float(np.abs(np.asarray(pe)).max()), 1.0)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(pf), atol=tol)

    # clamp math: the telemetry threshold margin_bins/(trans_std*P) is
    # where EDGE bins hit the patch rail (interior bins have more
    # headroom, so the threshold is a conservative early warning). For
    # bin 0 (corner bin at the lower rail), an offset at -1.5x the
    # threshold pools identically to one at exactly -1x (both rails),
    # while -0.5x differs.
    thr = 1 / (0.1 * 7)  # margin_bins=1, trans_std=0.1, P=7
    ck = jnp.zeros_like(off_k)

    def pool_bin0(v):
        cb = jnp.full_like(off_b, v)
        out = np.asarray(fused_offset_pool(
            feat, rois, ck, cb, rois_per_image=rpi, margin_bins=1))
        return out.reshape(B * rpi, 49, C)[:, 0]

    at_thr, over, under = pool_bin0(-thr), pool_bin0(-1.5 * thr), \
        pool_bin0(-0.5 * thr)
    np.testing.assert_allclose(at_thr, over, atol=1e-5)
    assert np.abs(at_thr - under).max() > 1e-3


def test_nonzero_offsets_exercise_stencil(rng):
    """Large FC weights push bins well off their undeformed windows —
    the stencil path (py/px clamps, tent stacks) must still match."""
    B, H, W, C = 2, 16, 16, 8
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rpi = 4
    rois = jnp.asarray(_random_rois(rng, B, rpi, span=220))
    off_k = jnp.asarray((rng.randn(7 * 7 * C, 7 * 7 * 2) * 0.5)
                        .astype(np.float32))
    off_b = jnp.asarray((rng.randn(7 * 7 * 2) * 1.0).astype(np.float32))
    a = fused_offset_pool(feat, rois, off_k, off_b, rois_per_image=rpi,
                          margin_bins=1, extract="einsum")
    b = fused_pool_pallas(feat, rois, off_k, off_b, rois_per_image=rpi,
                          margin_bins=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-5, rtol=5e-4)


def test_window_start_rail_tie_subgradient():
    """The VJP's clip masks reproduce jnp.clip's autodiff EXACTLY,
    including the measure-zero rail ties (grad 0.5, not 0): raw window
    starts placed exactly ON the clip rails must get mask 0.5."""
    from sniper_tpu.ops.pallas.fused_pool import _window_starts

    P, S, M = 7, 2, 2
    E = P * S + 2 * M
    hi = float(E - S)
    PP = P * P
    C = 4
    pass1 = jnp.zeros((1, PP * C), jnp.float32)
    off_k = jnp.zeros((PP * C, 2 * PP), jnp.float32)
    p_i = np.arange(PP)
    base_y = (S * (p_i // P) + M).astype(np.float32)
    base_x = (S * (p_i % P) + M).astype(np.float32)
    ones = jnp.ones((1,), jnp.float32)

    def masks(dy, dx):
        _, _, my, mx, _ = _window_starts(
            pass1, off_k, jnp.asarray(np.concatenate([dy, dx])),
            ones, ones, ones, ones, P=P, S=S, M=M, E=E, trans_std=1.0,
        )
        return np.asarray(my)[0], np.asarray(mx)[0]

    # exactly ON the rails: raw_y == 0, raw_x == hi -> 0.5 like
    # jax.grad(jnp.clip) (tested: max/min ties split in half)
    my, mx = masks(-base_y, hi - base_x)
    assert (my == 0.5).all() and (mx == 0.5).all()
    # strictly interior -> 1; strictly outside -> 0
    my, mx = masks(np.zeros(PP, np.float32), -100 * np.ones(PP, np.float32))
    assert (my == 1.0).all() and (mx == 0.0).all()
