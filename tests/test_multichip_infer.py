"""Data-parallel inference on the virtual CPU mesh.

The reference runs test-time forwards over a GPU list inside each
CONCURRENT_JOBS worker (inference.py:416-428); the TPU equivalent is
main_test.make_forward(num_devices=N): the batch splits along dim 0
over a 1-D mesh with replicated params. These tests check the
multi-device forward is numerically identical to single-device and
that the CLI plumbing (parallel.num_devices) selects it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from main_test import _test_num_devices, make_forward
from sniper_tpu.config import default_config
from sniper_tpu.models.detector import SNIPERDetector

A = 9
H = W = 64


def _tiny_model():
    return SNIPERDetector(
        num_classes=5, num_anchors=A, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1),
        pre_nms_top_n=64, post_nms_top_n=8, num_rois=8,
        dtype=jnp.float32,
    )


import pytest


@pytest.fixture(scope="module")
def mv():
    """Shared (model, variables): each test compiling its own init was
    the bulk of this file's 55s wall-clock."""
    model = _tiny_model()
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))
    im_info = jnp.asarray(np.tile([[H, W, 1.0]], (2, 1)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, data, im_info, train=False
    )
    return model, variables


def test_dp_forward_matches_single_device(mv):
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    model, variables = mv
    rng = np.random.RandomState(0)
    # 2 devices, not 8: same sharding semantics, 1/4 the emulated work
    # (the 8-device path runs in the driver dryrun + slow mid-depth test)
    data = jnp.asarray(rng.randn(4, H, W, 3).astype(np.float32))
    im_info = jnp.asarray(np.tile([[H, W, 1.0]], (4, 1)).astype(np.float32))

    f1 = make_forward(model, variables, num_devices=1)
    f4 = make_forward(model, variables, num_devices=2)
    o1 = f1(data, im_info)
    o4 = f4(data, im_info)
    assert set(o1) == set(o4)
    for k in ("rois", "cls_prob", "bbox_pred", "roi_valid"):
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o4[k]), atol=1e-4,
            err_msg=k,
        )


def test_dp_forward_rejects_indivisible_batch(mv):
    model, variables = mv
    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.randn(3, H, W, 3).astype(np.float32))
    im_info = jnp.asarray(np.tile([[H, W, 1.0]], (3, 1)).astype(np.float32))
    fwd = make_forward(model, variables, num_devices=2)
    try:
        fwd(data, im_info)
    except ValueError as e:
        assert "not divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for batch 3 on 2 devices")


def test_num_devices_requires_explicit_opt_in():
    cfg = default_config()
    assert _test_num_devices(cfg) == 1  # default -1 stays single-chip
    cfg.parallel.num_devices = 4
    assert _test_num_devices(cfg) == 4


# slow set: DP parity variants beyond the core single-vs-DP check
@pytest.mark.slow
def test_dp_forward_uint8_matches_fp32(mv):
    """uint8 canvases through the DP forward (device_normalize inside
    the jitted fn, batch sharded over 2 devices) must match the fp32
    host-normalized single-device forward."""
    model, variables = mv
    rng = np.random.RandomState(2)
    means = (103.939, 116.779, 123.68)
    u8 = rng.randint(0, 255, (4, H, W, 3)).astype(np.uint8)
    # host-normalize the fp32 twin exactly like process_chip_image_rect
    f32 = u8.astype(np.float32) - np.asarray(means, np.float32)[::-1]
    im_info = jnp.asarray(np.tile([[H, W, 1.0]], (4, 1)).astype(np.float32))
    f1 = make_forward(model, variables, num_devices=1)
    f4 = make_forward(model, variables, num_devices=2, pixel_means=means)
    o1 = f1(jnp.asarray(f32), im_info)
    o4 = f4(jnp.asarray(u8), im_info)
    # XLA fuses the in-graph mean-subtract into the first conv, which
    # reassociates fp32 accumulation — parity is plumbing-level, not
    # bitwise (observed max diff 2.3e-3 on 63-px roi coords)
    for k in ("rois", "cls_prob", "bbox_pred", "roi_valid"):
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o4[k]), rtol=1e-3, atol=1e-2,
            err_msg=k,
        )


@pytest.mark.slow
def test_dp_forward_fused_pool_shard_map_matches_single(mv):
    """Explicit POOL_KERNEL=fused under multi-device inference: the
    shard_map forward (which keeps the Pallas pool usable — no sharding
    rule exists for pallas_call under the auto-partitioner) must match
    the single-device fused forward. Runs the Pallas kernel in interpret
    mode on the CPU mesh."""
    _, variables = mv
    model = SNIPERDetector(
        num_classes=5, num_anchors=A, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1),
        pre_nms_top_n=64, post_nms_top_n=8, num_rois=8,
        dtype=jnp.float32, pool_kernel="fused",
    )
    rng = np.random.RandomState(4)
    data = jnp.asarray(rng.randn(4, H, W, 3).astype(np.float32))
    im_info = jnp.asarray(np.tile([[H, W, 1.0]], (4, 1)).astype(np.float32))
    f1 = make_forward(model, variables, num_devices=1)
    f2 = make_forward(model, variables, num_devices=2)
    o1 = f1(data, im_info)
    o2 = f2(data, im_info)
    for k in ("rois", "cls_prob", "bbox_pred", "roi_valid"):
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o2[k]), atol=1e-4, err_msg=k,
        )
