"""PredictionDumper: VisMetric-equivalent training prediction dumps."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sniper_tpu.config import default_config
from sniper_tpu.models.detector import SNIPERDetector
from sniper_tpu.train.trainer import create_train_state
from sniper_tpu.train.vis_dump import PredictionDumper


def test_prediction_dumper_writes_pkl_and_jpg(tmp_path, rng):
    H = W = 64
    A = 9
    b = 2
    fh = fw = H // 16
    gt = np.full((b, 10, 5), -1.0, np.float32)
    gt[:, 0] = [8, 8, 40, 40, 2]
    batch = {
        # uint8 chips + extent: the ChipLoader default path
        "data": rng.randint(0, 255, (b, H, W, 3)).astype(np.uint8),
        "data_extent": np.tile([[H, W]], (b, 1)).astype(np.float32),
        "im_info": np.tile([[H, W, 1.0]], (b, 1)).astype(np.float32),
        "gt_boxes": gt,
        "valid_ranges": np.tile([[0.0, 512.0]], (b, 1)).astype(np.float32),
        "label": np.zeros((b, A * fh * fw), np.float32),
        "bbox_target": np.zeros((b, 4 * A, fh, fw), np.float32),
        "bbox_weight": np.zeros((b, 4 * A, fh, fw), np.float32),
    }
    cfg = default_config()
    cfg.TRAIN.VISUALIZE = True
    cfg.TRAIN.visualization_freq = 5
    model = SNIPERDetector(
        num_classes=3, num_anchors=A, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_top_n=100, post_nms_top_n=8, num_rois=8,
    )
    state = create_train_state(model, cfg, batch, optax.sgd(0.1))

    cfg.TRAIN.visualization_path = str(tmp_path / "debug" / "visualization")
    dumper = PredictionDumper(model, cfg)
    # off-cadence -> no dump, no forward built
    assert dumper.maybe_dump(state, batch, step=3) is None
    assert dumper._fwd is None

    pkl = dumper.maybe_dump(state, batch, step=5)
    assert pkl and os.path.exists(pkl)
    jpg = pkl.replace(".pkl", ".jpg")
    assert os.path.exists(jpg)
    with open(pkl, "rb") as f:
        payload = pickle.load(f)
    assert payload["step"] == 5
    assert len(payload["dets"]) == 3  # per-class incl. background slot
    assert payload["rois"].shape[-1] == 5
    # decoded detections are finite and inside the canvas
    for dets in payload["dets"][1:]:
        assert np.isfinite(dets).all()
        if len(dets):
            assert dets[:, :4].min() >= 0
            assert dets[:, [0, 2]].max() <= W - 1 + 1e-5
            assert dets[:, [1, 3]].max() <= H - 1 + 1e-5


import pytest


# slow set: compiles a 2-device train step (~50s on CPU) — the fast
# set's <5 min bar doesn't have room for it
@pytest.mark.slow
def test_prediction_dumper_mesh_sharded_state(tmp_path, rng):
    """Round-4 advisor finding: on a >1-device mesh the train state is
    sharded/replicated by the partitioned step while the dumper's
    debug forward is a plain jit — the dumper must device_get the
    variables first. Exercise exactly that: state stepped once on a
    2-device mesh, then dumped."""
    from sniper_tpu.parallel.mesh import make_mesh, shard_batch
    from sniper_tpu.train.trainer import make_train_step

    H = W = 64
    A = 9
    b = 2
    fh = fw = H // 16
    gt = np.full((b, 10, 5), -1.0, np.float32)
    gt[:, 0] = [8, 8, 40, 40, 2]
    batch = {
        "data": rng.randn(b, H, W, 3).astype(np.float32),
        "im_info": np.tile([[H, W, 1.0]], (b, 1)).astype(np.float32),
        "gt_boxes": gt,
        "valid_ranges": np.tile([[0.0, 512.0]], (b, 1)).astype(np.float32),
        "label": np.zeros((b, A * fh * fw), np.float32),
        "bbox_target": np.zeros((b, 4 * A, fh, fw), np.float32),
        "bbox_weight": np.zeros((b, 4 * A, fh, fw), np.float32),
    }
    cfg = default_config()
    cfg.TRAIN.VISUALIZE = True
    cfg.TRAIN.visualization_freq = 1
    cfg.TRAIN.visualization_path = str(tmp_path / "vis2")
    model = SNIPERDetector(
        num_classes=3, num_anchors=A, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_top_n=100, post_nms_top_n=8, num_rois=8,
    )
    mesh = make_mesh(2)
    state = create_train_state(model, cfg, batch, optax.sgd(0.1))
    step = make_train_step(model, optax.sgd(0.01), mesh,
                           batch_images_per_device=1, rpn_batch_size=64,
                           pixel_means=(0.0, 0.0, 0.0))
    state, _ = step(state, shard_batch(mesh, batch),
                    jax.random.PRNGKey(0))  # state now carries mesh shardings

    dumper = PredictionDumper(model, cfg)
    pkl = dumper.maybe_dump(state, batch, step=7, batch_seq=4)
    assert pkl and os.path.exists(pkl)
    with open(pkl, "rb") as f:
        payload = pickle.load(f)
    assert payload["step"] == 7
    assert payload["batch_seq"] == 4
