"""Measured bound on the deformable-pooling sub-cell approximation.

The last reference-semantics deviation without a number attached
(ARCHITECTURE "Known deviations"): with learned offsets,
deformable_psroi_pool_fast reconstructs off-grid samples from the
resized patch's piecewise-linear interpolant instead of the original
map's (and clamps offsets beyond the margin halo), while the reference
fork's CUDA kernel bilinear-samples the original map per sample point
(exact contract: /root/reference/symbols/faster/
resnet_mx_101_e2e.py:286-293, SURVEY §2.9). ops.deform.
deformable_psroi_pool IS that exact contract (per-sample bilinear
gathers with DCN roi snapping / 0.1 min size / out-of-bounds count
drop), so these tests pin the fast path's deviation against it:

- trans=None: bit-equivalent (fp32 on CPU; the docstring's claim).
- trained offset magnitudes (|off| <= 0.32, the overfit checkpoint's
  telemetry, scripts/profile_margin.py): small relative error.
- adversarial magnitudes at/near the margin-1 clamp: bounded, larger
  error — the clamp engages by design (offset telemetry +
  HEAD_MARGIN_BINS warnings are the guard rail in training).

scripts/profile_pool_approx.py measures the same deltas on the real
TPU (bf16 resize path) plus the AP delta on a trained checkpoint;
numbers quoted in ARCHITECTURE "Known deviations".
"""

import numpy as np
import pytest

from sniper_tpu.ops.deform import (
    deformable_psroi_pool,
    deformable_psroi_pool_fast,
)

P, S = 7, 4
H = W = 38
C = 16
R = 24


def _setup(seed=0, smooth=True):
    """Feature map + rois. smooth=True low-passes the map — real C5
    features are spatially correlated, and the sub-cell interpolant
    error scales with curvature between sub-samples, so both regimes
    are measured (random noise is the adversarial texture)."""
    rng = np.random.RandomState(seed)
    feat = rng.randn(2, H, W, C).astype(np.float32)
    if smooth:
        import cv2

        for b in range(feat.shape[0]):
            feat[b] = cv2.GaussianBlur(feat[b], (5, 5), 1.2)
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = rng.randint(0, 2, R)
    # roi sizes from head-sized (~48px) to chip-sized (~400px) in
    # IMAGE pixels (spatial_scale 1/16 maps onto the 38^2 map)
    x1 = rng.uniform(0, 200, R)
    y1 = rng.uniform(0, 200, R)
    w = rng.uniform(48, 400, R)
    h = rng.uniform(48, 400, R)
    rois[:, 1], rois[:, 2] = x1, y1
    rois[:, 3] = np.minimum(x1 + w, 16 * W - 2)
    rois[:, 4] = np.minimum(y1 + h, 16 * H - 2)
    return feat, rois


def _rel(delta, ref):
    return float(np.abs(delta).max() / (np.abs(ref).max() + 1e-12))


def test_fast_pool_exact_when_no_trans():
    feat, rois = _setup()
    a = np.asarray(deformable_psroi_pool_fast(
        feat, rois, None, pooled_size=P, sample_per_part=S,
        margin_bins=1))
    b = np.asarray(deformable_psroi_pool(
        feat, rois, None, pooled_size=P, sample_per_part=S))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("smooth,tol_max,tol_mean",
                         [(True, 0.08, 0.04), (False, 0.25, 0.14)])
def test_fast_pool_delta_at_trained_offsets(smooth, tol_max, tol_mean):
    """|off| <= 0.32 (trained telemetry): measured round-5 deltas are
    max-element 3.6% of output range / mean-abs 1.7% of output RMS on
    correlated features (12.6% / 6.5% on raw noise; identical to 3
    digits on CPU fp32 and TPU bf16 — the sub-cell approximation
    dominates, not precision). Tolerances are those values with ~2x
    headroom — a regression bound for the approximation, not a
    correctness proof; the AP impact is measured by
    scripts/profile_pool_approx.py."""
    feat, rois = _setup(seed=1, smooth=smooth)
    rng = np.random.RandomState(2)
    trans = rng.uniform(-0.32, 0.32, (R, P, P, 2)).astype(np.float32)
    a = np.asarray(deformable_psroi_pool_fast(
        feat, rois, trans, pooled_size=P, sample_per_part=S,
        margin_bins=1))
    b = np.asarray(deformable_psroi_pool(
        feat, rois, trans, pooled_size=P, sample_per_part=S))
    rel = _rel(a - b, b)
    mean_ratio = float(np.abs(a - b).mean() / np.sqrt((b ** 2).mean()))
    assert rel < tol_max, f"trained-magnitude max delta {rel:.4f}"
    assert mean_ratio < tol_mean, f"trained-magnitude mean {mean_ratio:.4f}"


def test_fast_pool_delta_near_clamp_bounded():
    """At |off| = 1.4 (just under the margin-1 clamp 1/(0.1*7)=1.43)
    the error is larger — the regime the offset telemetry warns about —
    but still bounded; and beyond the clamp the fast path saturates
    (off 2.0 == off 1.43 output) instead of sampling garbage."""
    feat, rois = _setup(seed=3)
    rng = np.random.RandomState(4)
    sign = np.sign(rng.randn(R, P, P, 2)).astype(np.float32)
    near = sign * 1.4
    a = np.asarray(deformable_psroi_pool_fast(
        feat, rois, near, pooled_size=P, sample_per_part=S,
        margin_bins=1))
    b = np.asarray(deformable_psroi_pool(
        feat, rois, near, pooled_size=P, sample_per_part=S))
    rel = _rel(a - b, b)
    # measured 0.41 (smooth) — individual elements deviate hard in
    # this regime; that is exactly why the training-side telemetry
    # warns when offsets approach the clamp
    assert rel < 0.8, f"near-clamp rel delta {rel:.4f}"

    # saturation past the clamp: window starts clip to the PATCH
    # boundary, which binds first for the bin moving OUT of the patch —
    # bin (0,0) under a negative shift has exactly margin_bins*S cells
    # of headroom (= |off| 1/(0.1*P) = 1.43), so its output must be
    # invariant between off=-1.43 and off=-5 while interior bins (which
    # clip at margin + S*p cells) still move. The telemetry threshold
    # (heads._sow_offset_stats) is this worst-case bin's bound.
    for mag in (1.0 / (0.1 * P), 3.0, 5.0):
        t = np.full((R, P, P, 2), -mag, np.float32)
        out = np.asarray(deformable_psroi_pool_fast(
            feat, rois, t, pooled_size=P, sample_per_part=S,
            margin_bins=1))
        if mag == 1.0 / (0.1 * P):
            corner_ref = out[:, 0, 0]
            deep_ref = out[:, 3, 3]
        else:
            np.testing.assert_allclose(out[:, 0, 0], corner_ref,
                                       rtol=1e-4, atol=1e-4)
    # interior bin 3,3 has 1*S + 3*S cells of negative headroom — at
    # mag 3.0 (shift 8.4 < 16 cells) it must NOT yet be saturated
    t = np.full((R, P, P, 2), -3.0, np.float32)
    out3 = np.asarray(deformable_psroi_pool_fast(
        feat, rois, t, pooled_size=P, sample_per_part=S, margin_bins=1))
    assert np.abs(out3[:, 3, 3] - deep_ref).max() > 1e-3
