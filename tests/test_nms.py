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
