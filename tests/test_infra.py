"""Infra tests: our configs, checkpoint round-trip, profiler, packing."""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sniper_tpu.config import load_config
from sniper_tpu.models.registry import get_model


def test_own_configs_load_and_build():
    files = glob.glob("configs/*.yml")
    assert len(files) >= 6
    for f in files:
        cfg = load_config(f)
        m = get_model(cfg)
        assert m.num_classes == cfg.dataset.NUM_CLASSES


def test_checkpoint_roundtrip(tmp_path):
    from sniper_tpu.train.checkpoint import (
        latest_epoch,
        load_checkpoint,
        save_checkpoint,
    )
    from sniper_tpu.train.trainer import TrainState

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState(
        step=jnp.asarray(7, jnp.int32), params=params,
        batch_stats={"bn": {"mean": jnp.zeros(3)}},
        opt_state=tx.init(params),
    )
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, epoch=1)
    save_checkpoint(d, state.replace(step=jnp.asarray(9, jnp.int32)), epoch=2)
    assert latest_epoch(d) == 2

    template = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=jax.tree_util.tree_map(jnp.zeros_like, params),
        batch_stats={"bn": {"mean": jnp.zeros(3)}},
        opt_state=tx.init(params),
    )
    restored = load_checkpoint(d, template)
    assert int(restored.step) == 9
    np.testing.assert_allclose(restored.params["w"], params["w"])
    restored1 = load_checkpoint(d, template, epoch=1)
    assert int(restored1.step) == 7


def test_pack_unpack_detections():
    from sniper_tpu.infer.tester import pack_detections, unpack_detections

    rng = np.random.RandomState(0)
    out = {
        "rois": jnp.asarray(rng.randn(2, 8, 5).astype(np.float32)),
        "cls_prob": jnp.asarray(rng.rand(2, 8, 4).astype(np.float32)),
        "bbox_pred": jnp.asarray(rng.randn(2, 8, 4).astype(np.float32)),
        "roi_valid": jnp.asarray(rng.rand(2, 8) > 0.5),
    }
    packed = pack_detections(out)
    assert packed.shape == (2, 8, 5 + 4 + 4 + 1)
    un = unpack_detections(np.asarray(packed), 4)
    np.testing.assert_allclose(un["rois"], np.asarray(out["rois"]))
    np.testing.assert_allclose(un["cls_prob"], np.asarray(out["cls_prob"]))
    np.testing.assert_array_equal(un["roi_valid"], np.asarray(out["roi_valid"]))


def test_stage_timer():
    from sniper_tpu.utils.profiler import StageTimer

    t = StageTimer()
    x = jnp.ones((8, 8))
    with t.stage("mul", sync_tree=None):
        y = x * 2
    with t.stage("mul", sync_tree=y):
        y = y * 2
    rep = t.report()
    assert "mul" in rep and "over 2" in rep
