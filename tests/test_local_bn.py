"""Per-device BatchNorm (network.BN_MODE=local) semantics.

The reference trains PER-GPU BN statistics (README.md:10); BN_MODE=
local restores that on a data-parallel mesh via grouped statistics
(models/norm.LocalBatchNorm). These tests pin: (1) each group
normalizes with exactly the statistics a single-device BN would
compute on that group's shard; (2) running averages are the across-
group mean (MXNet Module aux averaging analog); (3) local != sync on
heterogeneous shards; (4) the registry knob plumbs through to the
model and the train step runs on a 2-device mesh.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sniper_tpu.models.norm import LocalBatchNorm, make_batch_norm


def _ref_bn(momentum=0.9, eps=1e-5):
    return nn.BatchNorm(use_running_average=False, momentum=momentum,
                        epsilon=eps)


def test_local_bn_matches_per_shard_single_device_bn(rng):
    """groups=2 on batch 4 == nn.BatchNorm run independently on each
    half (the per-device semantics), outputs AND running stats."""
    x = rng.randn(4, 5, 6, 3).astype(np.float32)
    # heterogeneous shards so sync and local stats genuinely differ
    x[2:] = x[2:] * 3.0 + 1.5

    local = LocalBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, groups=2)
    v = local.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    y, mut = local.apply(v, jnp.asarray(x), mutable=["batch_stats"])

    ref = _ref_bn()
    vr = ref.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x[:2]))
    y0, m0 = ref.apply(vr, jnp.asarray(x[:2]), mutable=["batch_stats"])
    y1, m1 = ref.apply(vr, jnp.asarray(x[2:]), mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y[:2]), np.asarray(y0),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(y[2:]), np.asarray(y1),
                               rtol=0, atol=2e-6)
    # running stats = across-group average of the per-shard updates
    for k in ("mean", "var"):
        want = (np.asarray(m0["batch_stats"][k])
                + np.asarray(m1["batch_stats"][k])) / 2
        np.testing.assert_allclose(np.asarray(mut["batch_stats"][k]), want,
                                   rtol=0, atol=2e-6)


def test_local_bn_groups1_equals_sync(rng):
    x = jnp.asarray(rng.randn(4, 5, 6, 3).astype(np.float32))
    local = LocalBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, groups=1)
    sync = _ref_bn()
    v = local.init({"params": jax.random.PRNGKey(0)}, x)
    yl, ml = local.apply(v, x, mutable=["batch_stats"])
    vs = sync.init({"params": jax.random.PRNGKey(0)}, x)
    ys, ms = sync.apply(vs, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yl), np.asarray(ys),
                               rtol=0, atol=2e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(ml["batch_stats"][k]),
                                   np.asarray(ms["batch_stats"][k]),
                                   rtol=0, atol=2e-6)


def test_local_bn_differs_from_sync_on_heterogeneous_shards(rng):
    x = rng.randn(4, 5, 6, 3).astype(np.float32)
    x[2:] += 4.0
    x = jnp.asarray(x)
    local = LocalBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, groups=2)
    v = local.init({"params": jax.random.PRNGKey(0)}, x)
    yl, _ = local.apply(v, x, mutable=["batch_stats"])
    sync = _ref_bn()
    vs = sync.init({"params": jax.random.PRNGKey(0)}, x)
    ys, _ = sync.apply(vs, x, mutable=["batch_stats"])
    assert np.abs(np.asarray(yl) - np.asarray(ys)).max() > 0.1


def test_local_bn_batch_not_divisible_raises():
    local = LocalBatchNorm(use_running_average=False, groups=3)
    x = jnp.zeros((4, 2, 2, 3))
    with pytest.raises(ValueError, match="not divisible"):
        local.init({"params": jax.random.PRNGKey(0)}, x)


def test_make_batch_norm_dispatch():
    # inference / sync / groups=1 -> plain nn.BatchNorm
    kw = dict(momentum=0.9, epsilon=1e-5, dtype=None, name=None)
    assert isinstance(
        make_batch_norm(use_running_average=True, bn_mode="local",
                        bn_groups=4, **kw),
        nn.BatchNorm,
    )
    assert isinstance(
        make_batch_norm(use_running_average=False, bn_mode="sync",
                        bn_groups=4, **kw),
        nn.BatchNorm,
    )
    assert isinstance(
        make_batch_norm(use_running_average=False, bn_mode="local",
                        bn_groups=4, **kw),
        LocalBatchNorm,
    )


def test_registry_resolves_bn_mode():
    from sniper_tpu.config import default_config
    from sniper_tpu.models.registry import get_model

    cfg = default_config()
    cfg.symbol = "resnet_mx_50_e2e"
    cfg.dataset.NUM_CLASSES = 5
    cfg.network.BN_MODE = "local"
    cfg.parallel.num_devices = 2
    m = get_model(cfg)
    assert m.bn_mode == "local" and m.bn_groups == 2
    cfg.parallel.num_devices = -1  # all devices (8 on the CPU mesh)
    m = get_model(cfg)
    assert m.bn_groups == len(jax.devices())
    cfg.network.BN_MODE = "sync"
    m = get_model(cfg)
    assert m.bn_mode == "sync" and m.bn_groups == 1
    cfg.network.BN_MODE = "bogus"
    with pytest.raises(ValueError, match="BN_MODE"):
        get_model(cfg)


@pytest.mark.slow
def test_train_step_local_bn_2dev_mesh(rng):
    """The full train step compiles and runs with BN_MODE=local on a
    2-device mesh, and its trunk batch_stats differ from the sync run
    on the same (heterogeneous) batch."""
    import optax

    from sniper_tpu.config import default_config
    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.parallel.mesh import make_mesh, shard_batch
    from sniper_tpu.train.trainer import create_train_state, make_train_step

    H = W = 64
    A = 9
    b = 2
    fh = fw = H // 16
    gt = np.full((b, 10, 5), -1.0, np.float32)
    gt[:, 0] = [8, 8, 40, 40, 2]
    data = rng.randn(b, H, W, 3).astype(np.float32)
    data[1] = data[1] * 2.5 + 3.0  # shard-heterogeneous statistics
    batch = {
        "data": data,
        "im_info": np.tile([[H, W, 1.0]], (b, 1)).astype(np.float32),
        "gt_boxes": gt,
        "valid_ranges": np.tile([[0.0, 512.0]], (b, 1)).astype(np.float32),
        "label": rng.choice([-1.0, 0.0, 1.0], (b, A * fh * fw),
                            p=[0.8, 0.15, 0.05]).astype(np.float32),
        "bbox_target": (rng.randn(b, 4 * A, fh, fw) * 0.1).astype(np.float32),
        "bbox_weight": np.zeros((b, 4 * A, fh, fw), np.float32),
    }
    mesh = make_mesh(2)
    cfg = default_config()
    cfg.network.FIXED_PARAMS = ["conv0", "bn0", "stage1", "bn_data"]

    def run(bn_mode):
        model = SNIPERDetector(
            num_classes=5, num_anchors=A, anchor_scales=(2, 4, 7),
            anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1),
            pre_nms_top_n=200, post_nms_top_n=16, num_rois=16,
            dtype=jnp.float32, bn_mode=bn_mode, bn_groups=2,
        )
        tx = optax.sgd(0.01)
        state = create_train_state(model, cfg, batch, tx)
        replicated = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())
        state = jax.device_put(state, replicated)
        step = make_train_step(model, tx, mesh, 1,
                               pixel_means=(0.0, 0.0, 0.0))
        state, metrics = step(state, shard_batch(mesh, batch),
                              jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        return state

    s_local = run("local")
    s_sync = run("sync")
    # some trainable-BN running mean must differ between the modes
    # (frozen stem/stage1 BNs are use_running_average and identical)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s_local.batch_stats, s_sync.batch_stats,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6
