import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sniper_tpu.ops.nms import NEG_INF, NMSWrapper, nms_jax, nms_np, soft_nms_np
from tests.conftest import random_boxes


def nms_oracle(dets, thresh):
    """O(N^2) literal greedy NMS (score order, suppress ovr >= thresh)."""
    order = dets[:, 4].argsort()[::-1]
    keep, suppressed = [], set()
    for i in order:
        if i in suppressed:
            continue
        keep.append(int(i))
        for j in order:
            if j == i or j in suppressed:
                continue
            xx1 = max(dets[i, 0], dets[j, 0])
            yy1 = max(dets[i, 1], dets[j, 1])
            xx2 = min(dets[i, 2], dets[j, 2])
            yy2 = min(dets[i, 3], dets[j, 3])
            w, h = max(0, xx2 - xx1 + 1), max(0, yy2 - yy1 + 1)
            ai = (dets[i, 2] - dets[i, 0] + 1) * (dets[i, 3] - dets[i, 1] + 1)
            aj = (dets[j, 2] - dets[j, 0] + 1) * (dets[j, 3] - dets[j, 1] + 1)
            if w * h / (ai + aj - w * h) >= thresh:
                suppressed.add(int(j))
    return keep


def test_nms_np_matches_oracle(rng):
    for _ in range(5):
        dets = random_boxes(rng, 60, hw=(200, 200)).astype(np.float64)
        assert nms_np(dets, 0.5) == nms_oracle(dets, 0.5)


def test_nms_jax_matches_np(rng):
    dets = random_boxes(rng, 100, hw=(256, 256))
    ref = nms_np(dets, 0.5)
    keep, valid = jax.jit(nms_jax, static_argnums=(2, 3))(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 100, 0.5
    )
    got = [int(k) for k, v in zip(np.asarray(keep), np.asarray(valid)) if v]
    assert got == ref


def test_nms_jax_padding_invariance(rng):
    """Padded entries (score NEG_INF) never appear and don't perturb output."""
    dets = random_boxes(rng, 40, hw=(128, 128))
    boxes = np.concatenate([dets[:, :4], np.zeros((24, 4), np.float32)])
    scores = np.concatenate([dets[:, 4], np.full(24, NEG_INF, np.float32)])
    keep, valid = nms_jax(jnp.asarray(boxes), jnp.asarray(scores), 64, 0.5)
    got = [int(k) for k, v in zip(np.asarray(keep), np.asarray(valid)) if v]
    assert got == nms_np(dets, 0.5)
    assert all(k < 40 for k in got)


def test_nms_jax_max_out_truncation(rng):
    dets = random_boxes(rng, 80, hw=(4000, 4000))  # mostly disjoint
    keep, valid = nms_jax(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 10, 0.5)
    ref = nms_np(dets, 0.5)[:10]
    got = [int(k) for k, v in zip(np.asarray(keep), np.asarray(valid)) if v]
    assert got == ref


def test_soft_nms_identical_boxes_decay():
    # two identical boxes: second score decays by exp(-1/sigma)
    dets = np.array(
        [[10, 10, 50, 50, 0.9], [10, 10, 50, 50, 0.8], [200, 200, 240, 240, 0.7]],
        dtype=np.float32,
    )
    out = soft_nms_np(dets, sigma=0.5, method=2)
    assert out.shape[0] == 3
    np.testing.assert_allclose(out[0, 4], 0.9, rtol=1e-6)
    # identical boxes → ov = 1 → weight = exp(-1/0.5)
    np.testing.assert_allclose(out[1, 4], 0.7, rtol=1e-6)  # emitted next by score
    np.testing.assert_allclose(
        sorted(out[:, 4])[0], 0.8 * np.exp(-1 / 0.5), rtol=1e-5
    )


def test_soft_nms_threshold_discard():
    dets = np.array([[0, 0, 20, 20, 0.9], [0, 0, 20, 20, 0.001]], dtype=np.float32)
    out = soft_nms_np(dets, sigma=0.5, threshold=0.001, method=2)
    assert out.shape[0] == 1  # decayed below threshold and dropped


def test_soft_nms_hard_method_equals_nms(rng):
    dets = random_boxes(rng, 50, hw=(300, 300))
    out = soft_nms_np(dets, Nt=0.5, method=0, threshold=1e-4)
    ref_keep = nms_np(dets.astype(np.float64), 0.5 + 1e-9)  # hard method uses >
    assert out.shape[0] == len(ref_keep)
    np.testing.assert_allclose(
        np.sort(out[:, 4]), np.sort(dets[ref_keep, 4]), rtol=1e-6
    )


def test_nms_wrapper_dispatch(rng):
    dets = random_boxes(rng, 30)
    hard = NMSWrapper(0.45, -1)(dets)
    soft = NMSWrapper(-1, 0.55)(dets)
    assert hard.shape[1] == 5 and soft.shape[1] == 5
    with pytest.raises(AssertionError):
        NMSWrapper(0.5, 0.5)


def _soft_nms_scalar_oracle(boxes, sigma=0.5, Nt=0.3, threshold=0.001,
                            method=2):
    """Direct transliteration of the reference Cython soft-NMS
    (/root/reference/lib/nms/cpu_nms.pyx:17-110) as a labeled oracle:
    scalar double loop, fp32 locals, tail-swap drops."""
    b = np.array(boxes, dtype=np.float32, copy=True)
    N = b.shape[0]
    i = 0
    while i < N:
        maxpos = i + int(np.argmax(b[i:N, 4]))
        b[[i, maxpos]] = b[[maxpos, i]]
        tx1, ty1, tx2, ty2 = b[i, 0], b[i, 1], b[i, 2], b[i, 3]
        tarea = np.float32((tx2 - tx1 + 1) * (ty2 - ty1 + 1))
        pos = i + 1
        while pos < N:
            x1, y1, x2, y2 = b[pos, 0], b[pos, 1], b[pos, 2], b[pos, 3]
            area = np.float32((x2 - x1 + 1) * (y2 - y1 + 1))
            iw = np.float32(min(tx2, x2) - max(tx1, x1) + 1)
            if iw > 0:
                ih = np.float32(min(ty2, y2) - max(ty1, y1) + 1)
                if ih > 0:
                    ua = np.float32(tarea + area - iw * ih)
                    ov = np.float32(iw * ih / ua)
                    if method == 1:
                        weight = np.float32(1 - ov) if ov > Nt else np.float32(1)
                    elif method == 2:
                        weight = np.float32(np.exp(-(ov * ov) / np.float32(sigma)))
                    else:
                        weight = np.float32(0) if ov > Nt else np.float32(1)
                    b[pos, 4] = np.float32(weight * b[pos, 4])
                    if b[pos, 4] < threshold:
                        b[pos] = b[N - 1]
                        N -= 1
                        pos -= 1
            pos += 1
        i += 1
    return b[:N]


def test_soft_nms_vectorized_matches_scalar_oracle(rng):
    """The vectorized-inner soft_nms_np must be BIT-identical to the
    scalar reference transliteration, including drop/tail-swap order
    (high-overlap clusters force many threshold drops)."""
    for trial in range(20):
        n = rng.randint(2, 120)
        # clustered boxes -> heavy overlap -> decays + drops
        centers = rng.uniform(50, 150, (max(n // 20, 1), 2))
        c = centers[rng.randint(len(centers), size=n)]
        wh = rng.uniform(20, 60, (n, 2)).astype(np.float32)
        dets = np.zeros((n, 5), np.float32)
        dets[:, 0] = c[:, 0] - wh[:, 0] / 2
        dets[:, 1] = c[:, 1] - wh[:, 1] / 2
        dets[:, 2] = c[:, 0] + wh[:, 0] / 2
        dets[:, 3] = c[:, 1] + wh[:, 1] / 2
        dets[:, 4] = rng.uniform(0.001, 1.0, n)
        for method, thresh in ((2, 0.3), (2, 0.001), (1, 0.05), (0, 0.01)):
            got = soft_nms_np(dets, sigma=0.55, Nt=0.3, threshold=thresh,
                              method=method)
            want = _soft_nms_scalar_oracle(dets, sigma=0.55, Nt=0.3,
                                           threshold=thresh, method=method)
            np.testing.assert_array_equal(got, want)


def test_soft_nms_batched_matches_per_class(rng):
    """soft_nms_np_batched over C independent problems must be
    bit-identical per problem to soft_nms_np, including indices."""
    from sniper_tpu.ops.nms import soft_nms_np_batched

    for trial in range(6):
        dets_list = []
        for _ in range(rng.randint(1, 12)):
            n = rng.randint(0, 90)
            centers = rng.uniform(50, 150, (max(n // 15, 1), 2))
            c = centers[rng.randint(len(centers), size=n)]
            wh = rng.uniform(20, 60, (n, 2)).astype(np.float32)
            d = np.zeros((n, 5), np.float32)
            d[:, 0] = c[:, 0] - wh[:, 0] / 2
            d[:, 1] = c[:, 1] - wh[:, 1] / 2
            d[:, 2] = c[:, 0] + wh[:, 0] / 2
            d[:, 3] = c[:, 1] + wh[:, 1] / 2
            d[:, 4] = rng.uniform(0.001, 1.0, n)
            dets_list.append(d)
        for thresh in (0.001, 0.05):
            outs, idxs = soft_nms_np_batched(
                dets_list, sigma=0.55, threshold=thresh, method=2,
                return_indices=True,
            )
            for d, out, idx in zip(dets_list, outs, idxs):
                want, widx = soft_nms_np(d, sigma=0.55, threshold=thresh,
                                         method=2, return_indices=True)
                np.testing.assert_array_equal(out, want)
                np.testing.assert_array_equal(idx, widx)


def test_degenerate_boxes_warning_free_and_suppressible(rng):
    """Inverted/degenerate boxes (x2 < x1-1 => +1-area <= 0) must not
    produce NaN IoU (which made them immune to suppression) and must not
    emit RuntimeWarnings. Real boxes around them behave as usual."""
    import warnings

    dets = np.array(
        [
            [10, 10, 100, 100, 0.9],   # real
            [12, 12, 98, 98, 0.8],     # overlaps the real box -> suppressed
            [50, 50, 40, 40, 0.7],     # inverted (zero/neg area)
            [50, 50, 40, 40, 0.6],     # identical inverted duplicate
            [200, 200, 190, 205, 0.5], # inverted in x only
        ],
        np.float32,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        keep = nms_np(dets, 0.5)
        soft = soft_nms_np(dets.copy(), sigma=0.55, method=2)
        from sniper_tpu.ops.nms import soft_nms_np_batched

        soft_b = soft_nms_np_batched([dets.copy(), dets[:2].copy()],
                                     sigma=0.55, method=2)
    # hard NMS: real duplicate suppressed; degenerate boxes have IoU 0
    # with everything (including each other) so they all survive
    assert keep == [0, 2, 3, 4]
    # soft-NMS: no NaN scores anywhere
    assert np.isfinite(soft).all()
    assert all(np.isfinite(s).all() for s in soft_b)
    # device NMS agrees on the degenerate semantics
    keep_j, valid_j = nms_jax(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 5, 0.5
    )
    got = sorted(int(k) for k, v in zip(keep_j, valid_j) if v)
    assert got == [0, 2, 3, 4]
