"""Parity tests for the Pallas per-roi patch-extraction kernel.

The kernel (ops/pallas/roi_patch.py, interpret mode on CPU) must match
the einsum patch extraction (ops.deform._extract_patch_batched) that
the training path and the CPU inference path use — same DCN sampling
semantics: roi snapping, 0.1 min size, drop-out-of-bounds-from-count,
clamp in-bounds. On CPU both paths compute in fp32, so agreement is
near-exact.
"""

import numpy as np
import jax.numpy as jnp
import pytest

# slow-marked: this kernel is a parity ORACLE for a measured-slower
# alternative (roi_patch.py ships disabled); the shipped fused kernel's
# parity runs in the fast set (test_pallas_fused_pool.py)
pytestmark = pytest.mark.slow

from sniper_tpu.ops.deform import (
    _extract_patch_batched,
    _extract_patches_pallas,
    _roi_geom,
    fused_offset_pool,
)


def _random_rois(rng, B, rpi, span=400):
    R = B * rpi
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = np.repeat(np.arange(B), rpi)
    rois[:, 1] = rng.uniform(-40, span, R)
    rois[:, 2] = rng.uniform(-40, span, R)
    rois[:, 3] = rois[:, 1] + rng.uniform(3, span, R)
    rois[:, 4] = rois[:, 2] + rng.uniform(3, span, R)
    return rois


@pytest.mark.parametrize("margin_bins", [0, 1, 2])
def test_patch_extraction_matches_einsum(rng, margin_bins):
    B, H, W, C = 2, 14, 18, 8
    P, S = 7, 4
    T = P * S
    M = margin_bins * S
    E = T + 2 * M
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rpi = 5
    rois = jnp.asarray(_random_rois(rng, B, rpi))

    crois = rois.reshape(B, rpi, 5)
    geom = _roi_geom(crois, 1.0 / 16, T)
    ref_patch, ref_cnt = _extract_patch_batched(feat, crois, geom, M, E)
    got_patch, got_cnt = _extract_patches_pallas(feat, geom, M, E)

    np.testing.assert_allclose(
        np.asarray(got_patch), np.asarray(ref_patch), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(ref_cnt))


def test_fused_offset_pool_pallas_matches_einsum(rng):
    """End-to-end two-pass pool parity: extraction + pass-1 + offset FC
    + stencil lookup through the pallas extraction."""
    B, H, W, C = 2, 20, 28, 8
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rpi = 6
    rois = jnp.asarray(_random_rois(rng, B, rpi))
    off_k = jnp.asarray(rng.randn(7 * 7 * C, 7 * 7 * 2).astype(np.float32)
                        * 0.05)
    off_b = jnp.asarray(rng.randn(7 * 7 * 2).astype(np.float32) * 0.1)

    a = fused_offset_pool(feat, rois, off_k, off_b, rois_per_image=rpi,
                          extract="einsum")
    b = fused_offset_pool(feat, rois, off_k, off_b, rois_per_image=rpi,
                          extract="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-4)


def test_degenerate_and_offmap_rois(rng):
    """Rois fully off the map and sub-pixel rois must not produce NaNs
    and must keep the drop-from-count zeros of the reference kernel."""
    B, H, W, C = 1, 10, 12, 4
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    rois = np.array([
        [0, -500, -500, -400, -400, ],   # fully off-map (negative side)
        [0, 5000, 5000, 6000, 6000, ],   # fully off-map (positive side)
        [0, 40, 40, 41, 41, ],           # sub-bin roi (0.1 min size)
    ], np.float32)
    rois = jnp.asarray(rois)
    off_k = jnp.zeros((7 * 7 * C, 7 * 7 * 2), np.float32)
    off_b = jnp.zeros((7 * 7 * 2,), np.float32)
    a = fused_offset_pool(feat, rois, off_k, off_b, rois_per_image=3,
                          extract="einsum")
    b = fused_offset_pool(feat, rois, off_k, off_b, rois_per_image=3,
                          extract="pallas")
    assert np.isfinite(np.asarray(b)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-4)
    # off-map rois pool to exactly zero (count semantics)
    assert np.abs(np.asarray(b)[:2]).max() == 0.0
