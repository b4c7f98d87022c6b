"""End-to-end training smoke: overfit one synthetic batch.

The strongest correctness signal without a dataset: losses must drop
substantially when the full pipeline (loader-format batch -> fused
targets -> heads -> losses -> SGD) repeatedly sees the same chip batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sniper_tpu.config import default_config
from sniper_tpu.models.detector import SNIPERDetector
from sniper_tpu.parallel.mesh import make_mesh, shard_batch
from sniper_tpu.train.optimizer import make_optimizer
from sniper_tpu.train.trainer import create_train_state, make_train_step

A = 9
H = W = 64


def make_batch(b=8):
    rng = np.random.RandomState(0)
    fh = fw = H // 16
    gt = np.full((b, 10, 5), -1.0, np.float32)
    gt[:, 0] = [8, 8, 40, 40, 2]
    gt[:, 1] = [30, 20, 60, 56, 3]
    # plant a visible pattern where the objects are
    data = rng.randn(b, H, W, 3).astype(np.float32) * 0.1
    data[:, 8:40, 8:40, 0] += 2.0
    data[:, 20:56, 30:60, 1] += 2.0
    from sniper_tpu.data.anchor_targets import AnchorTargetAssigner

    asn = AnchorTargetAssigner(
        chip_size=H, anchor_scales=(2, 4, 7), anchor_ratios=(0.5, 1, 2),
        rpn_batch_size=64, pos_thresh=0.5, neg_thresh=0.4,
    )
    labels = np.zeros((b, A * fh * fw), np.float32)
    tgts = np.zeros((b, 4 * A, fh, fw), np.float32)
    ws = np.zeros((b, 4 * A, fh, fw), np.float32)
    boxes = gt[0, :2, :4]
    for i in range(b):
        out = asn(
            np.array([0.0, 0, H - 1, W - 1]), 1.0, np.arange(2),
            np.arange(2), boxes, np.array([2, 3]),
            np.random.RandomState(1),
        )
        labels[i] = out.labels
        tgts[i] = out.bbox_targets
        ws[i] = out.bbox_weights
    return {
        "data": data,
        "im_info": np.tile([[H, W, 1.0]], (b, 1)).astype(np.float32),
        "gt_boxes": gt,
        "valid_ranges": np.tile([[0.0, 512.0]], (b, 1)).astype(np.float32),
        "label": labels,
        "bbox_target": tgts,
        "bbox_weight": ws,
    }


@pytest.mark.slow
def test_overfit_single_batch():
    # 2 devices, not all 8: the step is EXECUTION-bound on virtual CPU
    # devices (~50s/step at 8 vs ~13s at 2, tests/test_train_step.py
    # note) and 2 exercise the same DP semantics — this test's signal
    # is the LOSS TRAJECTORY, not the mesh width (the 8-wide path runs
    # in the driver dryrun + mid-depth multichip test)
    mesh = make_mesh(2)
    n_dev = 2
    cfg = default_config()
    cfg.TRAIN.lr = 0.02
    cfg.TRAIN.warmup = False
    cfg.TRAIN.lr_step = ""
    cfg.TRAIN.wd = 0.0
    cfg.network.FIXED_PARAMS = []
    model = SNIPERDetector(
        num_classes=5, num_anchors=A, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1),
        pre_nms_top_n=128, post_nms_top_n=16, num_rois=16, dtype=jnp.float32,
    )
    batch = make_batch(n_dev)
    state = create_train_state(model, cfg, batch, optax.sgd(0.1))
    tx, _ = make_optimizer(cfg, epoch_size=1000, params=state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, mesh, 1, rpn_batch_size=64)

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(14):
        key, sub = jax.random.split(key)
        state, metrics = step(state, shard_batch(mesh, batch), sub)
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert np.isfinite(losses).all()
    assert last < 0.75 * first, f"loss did not drop: {first:.3f} -> {last:.3f}"
    # rpn head learns objectness on the planted pattern
    assert float(metrics["rpn_cls_loss"]) < losses[0]


def test_ohem_select():
    from sniper_tpu.ops.ohem import ohem_select

    cls_loss = jnp.asarray([[5.0, 1.0, 3.0, 0.1]])
    bbox_loss = jnp.zeros((1, 4))
    labels = jnp.asarray([[1, 0, 2, 0]])
    w = jnp.ones((1, 4, 4))
    new_labels, new_w = ohem_select(cls_loss, bbox_loss, labels, w, 2)
    assert new_labels.tolist() == [[1, -1, 2, -1]]
    assert float(new_w[0, 1].sum()) == 0.0
    assert float(new_w[0, 0].sum()) == 4.0


def test_ds_utils():
    from sniper_tpu.data.ds_utils import filter_small_boxes, unique_boxes

    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [5, 5, 6, 6.0]])
    assert len(unique_boxes(boxes)) == 2
    assert filter_small_boxes(boxes, 4).tolist() == [0, 1]
