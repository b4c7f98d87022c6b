"""End-to-end detector module tests on tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sniper_tpu.models.detector import SNIPERDetector
from sniper_tpu.models.losses import total_loss

B, H, W = 2, 64, 64
FH, FW = H // 16, W // 16
A = 9


@pytest.fixture(scope="module")
def tiny_detector():
    model = SNIPERDetector(
        num_classes=5, num_anchors=A, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1),
        pre_nms_top_n=200, post_nms_top_n=16, num_rois=16,
        dtype=jnp.float32,
    )
    data = jnp.zeros((B, H, W, 3))
    im_info = jnp.tile(jnp.asarray([[H, W, 1.0]]), (B, 1))
    gt = jnp.full((B, 10, 5), -1.0)
    gt = gt.at[:, 0].set(jnp.asarray([8.0, 8, 40, 40, 2]))
    vr = jnp.tile(jnp.asarray([[0.0, 512.0]]), (B, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, vr, train=True,
    )
    return model, variables, (data, im_info, gt, vr)


def test_train_forward_shapes(tiny_detector):
    model, variables, (data, im_info, gt, vr) = tiny_detector
    out, mutated = model.apply(
        variables, data, im_info, gt, vr, train=True,
        rngs={"sampling": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert out["rpn_cls_logits"].shape == (B, FH, FW, 2, A)
    assert out["rpn_bbox_pred"].shape == (B, 4 * A, FH, FW)
    assert out["rois"].shape == (B, 16, 5)
    assert out["cls_score"].shape == (B, 16, 5)
    assert out["bbox_pred"].shape == (B, 16, 4)
    assert "batch_stats" in mutated
    # at least one fg roi for the planted GT
    labels = np.asarray(out["rcnn_labels"])
    assert (labels == 2).sum() >= 1


def test_infer_forward_shapes(tiny_detector):
    model, variables, (data, im_info, *_) = tiny_detector
    out = model.apply(variables, data, im_info, train=False)
    assert out["rois"].shape == (B, 16, 5)
    assert out["cls_prob"].shape == (B, 16, 5)
    assert out["bbox_pred"].shape == (B, 16, 4)
    probs = np.asarray(out["cls_prob"])
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


# slow set: full fwd+bwd grad-finiteness; the fast set's train-step
# test (test_train_step.py) covers grads through the same graph
@pytest.mark.slow
def test_loss_and_grads_finite(tiny_detector):
    model, variables, (data, im_info, gt, vr) = tiny_detector
    n_total = A * FH * FW
    rng = np.random.RandomState(0)
    labels = rng.choice([-1, 0, 1], (B, n_total), p=[0.8, 0.15, 0.05])
    batch = {
        "label": jnp.asarray(labels, jnp.float32),
        "bbox_target": jnp.asarray(rng.randn(B, 4 * A, FH, FW), jnp.float32) * 0.1,
        "bbox_weight": jnp.zeros((B, 4 * A, FH, FW)),
    }

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, im_info, gt, vr, train=True,
            rngs={"sampling": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
        )
        loss, metrics = total_loss(out, batch, batch_images=B)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total_norm = sum(float((np.asarray(g) ** 2).sum()) for g in flat)
    assert total_norm > 0
    for k in ("rpn_cls_loss", "rpn_bbox_loss", "rcnn_cls_loss", "rcnn_bbox_loss"):
        assert np.isfinite(float(metrics[k]))


def test_frozen_stem_params_exist(tiny_detector):
    model, variables, _ = tiny_detector
    p = variables["params"]["trunk"]
    assert "conv0" in p and "bn0" in p and "bn_data" in p
    assert "stage1_unit1" in p
    # deformable offsets initialized to zero
    off = p["stage4_unit1"]["offset"]["kernel"]
    assert float(jnp.abs(off).max()) == 0.0
