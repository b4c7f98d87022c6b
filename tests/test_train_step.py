"""Data-parallel train step on a 2-device virtual CPU mesh.

2 devices, not all 8: the step is EXECUTION-bound on virtual CPU
devices (a cached step at 8 devices measures ~50s on this box vs ~13s
at 2), and 2 devices exercise the same sharding/collective semantics.
The full 8-device path runs in the driver's dryrun_multichip and the
slow-marked mid-depth variant (tests/test_multichip_train.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sniper_tpu.config import default_config
from sniper_tpu.models.detector import SNIPERDetector
from sniper_tpu.parallel.mesh import make_mesh, shard_batch
from sniper_tpu.train.optimizer import fixed_param_mask, make_optimizer
from sniper_tpu.train.trainer import create_train_state, make_train_step

B_PER_DEV = 1
H = W = 64
A = 9


def make_batch(n_dev):
    b = n_dev * B_PER_DEV
    rng = np.random.RandomState(0)
    fh = fw = H // 16
    gt = np.full((b, 10, 5), -1.0, np.float32)
    gt[:, 0] = [8, 8, 40, 40, 2]
    return {
        "data": rng.randn(b, H, W, 3).astype(np.float32),
        "im_info": np.tile([[H, W, 1.0]], (b, 1)).astype(np.float32),
        "gt_boxes": gt,
        "valid_ranges": np.tile([[0.0, 512.0]], (b, 1)).astype(np.float32),
        "label": rng.choice([-1.0, 0.0, 1.0], (b, A * fh * fw), p=[0.8, 0.15, 0.05]).astype(np.float32),
        "bbox_target": (rng.randn(b, 4 * A, fh, fw) * 0.1).astype(np.float32),
        "bbox_weight": np.zeros((b, 4 * A, fh, fw), np.float32),
    }


N_DEV = 2


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(N_DEV)
    cfg = default_config()
    cfg.TRAIN.lr = 0.01
    cfg.TRAIN.warmup = True
    cfg.TRAIN.warmup_lr = 0.001
    cfg.TRAIN.warmup_step = 10
    cfg.TRAIN.lr_step = "1.0"
    cfg.network.FIXED_PARAMS = ["conv0", "bn0", "stage1", "bn_data"]
    model = SNIPERDetector(
        num_classes=5, num_anchors=A, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1),
        pre_nms_top_n=200, post_nms_top_n=16, num_rois=16, dtype=jnp.float32,
    )
    batch = make_batch(N_DEV)
    tx_probe = None
    # params needed for the mask -> init once with a dummy tx
    import optax

    state0 = create_train_state(model, cfg, batch, optax.sgd(0.1))
    tx, sched = make_optimizer(cfg, epoch_size=100, params=state0.params)
    state = state0.replace(opt_state=tx.init(state0.params))
    # Commit the state to an explicit replicated mesh sharding: the
    # init state lives on one device while the step's output state
    # carries mesh shardings, so without this every (fresh state,
    # stepped state) signature pair recompiled the ~90s step.
    # Replicated input reaches the in==out sharding fixpoint, so the
    # module pays for exactly ONE fp32 compile.
    replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = jax.device_put(state, replicated)
    # explicit zero means: synthetic fp32/uint8 batches, no mean shift
    step = make_train_step(model, tx, mesh, B_PER_DEV,
                           pixel_means=(0.0, 0.0, 0.0))

    def fresh_state():
        # the step donates its input state; hand each test its own copy
        return jax.device_put(
            jax.tree_util.tree_map(np.asarray, state), replicated)

    return mesh, model, fresh_state, step, batch, cfg


def test_train_step_runs_and_updates(setup):
    mesh, model, fresh_state, step, batch, cfg = setup
    state = fresh_state()
    sharded = shard_batch(mesh, batch)
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params)
    state1, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert int(state1.step) == 1
    for k in ("loss", "rpn_cls_loss", "rcnn_cls_loss", "rcnn_acc",
              "offset_max", "offset_clamp_frac", "dcn_offset_max"):
        assert np.isfinite(float(metrics[k])), k
    # offset FC is zeros-init, so step-1 clamp telemetry reads exactly 0
    assert float(metrics["offset_max"]) == 0.0
    assert float(metrics["offset_clamp_frac"]) == 0.0
    # the trunk's DCN offset convs are zeros-init too
    assert float(metrics["dcn_offset_max"]) == 0.0
    # trainable params moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state1.params, p0
    )
    total_move = sum(jax.tree_util.tree_leaves(moved))
    assert total_move > 0

    # frozen params did not move
    def collect(tree, pred, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(collect(v, pred, path + (k,)))
            elif pred(path + (k,)):
                out["/".join(path + (k,))] = v
        return out

    frozen_moved = collect(
        moved,
        lambda p: any(
            seg.startswith(("conv0", "bn0", "stage1", "bn_data")) for seg in p
        ),
    )
    assert frozen_moved, "expected frozen param entries to exist"
    assert all(v == 0.0 for v in frozen_moved.values()), frozen_moved


def test_train_step_two_steps_loss_finite(setup):
    mesh, model, fresh_state, step, batch, cfg = setup
    state = fresh_state()
    sharded = shard_batch(mesh, batch)
    s, m1 = step(state, sharded, jax.random.PRNGKey(1))
    # the chained call only hits the jit cache if the output state kept
    # the replicated input sharding — assert it so a silent sharding
    # drift shows up as a failure, not a 90s recompile
    for leaf in jax.tree_util.tree_leaves(s.params):
        assert leaf.sharding.is_equivalent_to(state.params["rpn"][
            "rpn_conv_3x3"]["kernel"].sharding, leaf.ndim), leaf.sharding
    s, m2 = step(s, shard_batch(mesh, batch), jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["loss"]))
    assert int(s.step) == 2


@pytest.mark.slow
def test_train_step_uint8_batch_matches_fp32(setup):
    """A uint8 batch + data_extent through the step must give exactly
    the fp32 loss (device_normalize with zero means / full extent is a
    pure cast; masking bit-exactness is covered in test_loader).

    slow: the uint8 data dtype is a distinct jit signature, so this is
    a second ~80s full train-step compile on the 1-core CI box; the
    device_normalize bit-exactness itself is fast-covered in
    test_loader."""
    mesh, model, fresh_state, step, batch, cfg = setup
    b = batch["data"].shape[0]
    u8 = dict(batch)
    u8["data"] = np.random.RandomState(3).randint(
        0, 255, batch["data"].shape
    ).astype(np.uint8)
    u8["data_extent"] = np.tile([[H, W]], (b, 1)).astype(np.float32)
    f32 = dict(batch)
    f32["data"] = u8["data"].astype(np.float32)

    _, m_u8 = step(fresh_state(), shard_batch(mesh, u8), jax.random.PRNGKey(5))
    _, m_f32 = step(fresh_state(), shard_batch(mesh, f32), jax.random.PRNGKey(5))
    assert float(m_u8["loss"]) == float(m_f32["loss"])


def test_fixed_param_mask_prefixes():
    params = {
        "trunk": {
            "conv0": {"kernel": 1}, "bn0": {"scale": 1},
            "stage1_unit1": {"conv1": {"kernel": 1}},
            "stage2_unit1": {"conv1": {"kernel": 1}},
        },
        "rpn": {"rpn_conv_3x3": {"kernel": 1}},
    }
    mask = fixed_param_mask(params, ["conv0", "bn0", "stage1"])
    assert mask["trunk"]["conv0"]["kernel"] is False
    assert mask["trunk"]["stage1_unit1"]["conv1"]["kernel"] is False
    assert mask["trunk"]["stage2_unit1"]["conv1"]["kernel"] is True
    assert mask["rpn"]["rpn_conv_3x3"]["kernel"] is True


def test_lr_schedule():
    from sniper_tpu.train.optimizer import warmup_multistep

    sched = warmup_multistep(0.015, 0.0005, 10, [100], 0.1)
    assert float(sched(0)) == pytest.approx(0.0005)
    assert float(sched(5)) == pytest.approx((0.0005 + 0.015) / 2, rel=0.1)
    assert float(sched(50)) == pytest.approx(0.015)
    assert float(sched(150)) == pytest.approx(0.0015)
