"""Generate the train-step golden fixture (the train-plane analog of
gen_golden_detections.py).

Loss normalizations are parity-critical (SURVEY §7 hard part 6): the
valid-count CE normalization, the RPN 3/(B*RPN_BATCH_SIZE) and RCNN
1/(188*B) grad scales, the fused proposal-target sampler, and the LR
arithmetic (reference /root/reference/symbols/faster/
resnet_mx_101_e2e.py:279-319) were until round 5 guarded only by
per-component oracles and AP>0 overfit smokes — silent drift of the
ASSEMBLED step (a normalization moved, a sampler reordered, an lr
misapplied) would slip past both. This script freezes an exact step
trajectory: a PRNGKey-seeded tiny detector with ALL SIX losses live
(rpn_cls / rpn_bbox / rcnn_cls / rcnn_bbox / focus / mask), a
deterministic 2-chip batch built through the real AnchorTargetAssigner
(sparse ChipLoader form) + rasterize_gt_masks (non-rectangular L-shaped
polygons), stepped 3x by the real make_train_step on CPU fp32. Per-step
losses go to tests/fixtures/golden_train.json;
tests/test_golden_train.py re-runs the identical trajectory and asserts
agreement to ~1e-5.

Regenerate (ONLY after an intentional semantic change; the diff is the
review surface):
    python scripts/gen_golden_train.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same environment contract as gen_golden_detections.py: the fixture is
# a CPU artifact and must be generated under the exact backend + XLA
# flags the test suite uses (tests/conftest.py), before first backend init
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

if jax.config.jax_platforms and \
        jax.config.jax_platforms.split(",")[0] != "cpu":
    jax.config.update("jax_platforms", "cpu")

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "golden_train.json")

H = W = 64
A = 9
B = 2
N_STEPS = 3
RPN_BATCH = 64
LOSS_KEYS = ("rpn_cls_loss", "rpn_bbox_loss", "rcnn_cls_loss",
             "rcnn_bbox_loss", "focus_loss", "mask_loss", "loss")

# per-image GT boxes (chip coords == image coords: crop [0,0,63,63],
# im_scale 1.0) and classes; sizes straddle the AutoFocus thresholds so
# the focus map has BOTH positive and don't-care pixels
_GT = [
    (np.array([[8.0, 8, 40, 40], [30, 20, 60, 56]]), np.array([2, 3])),
    (np.array([[12.0, 16, 44, 52], [40, 6, 58, 22]]), np.array([1, 4])),
]


def _l_poly(box):
    """L-shaped polygon inside ``box`` — NOT the full rectangle, so the
    mask loss sees a target whose foreground fraction differs from the
    box and segm IoU genuinely diverges from bbox IoU."""
    x1, y1, x2, y2 = box
    xm, ym = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    return [np.array([x1, y1, xm, y1, xm, ym, x2, ym, x2, y2, x1, y2],
                     np.float32)]


def build_batch():
    from sniper_tpu.data.anchor_targets import (
        AnchorTargetAssigner,
        AutoFocusParams,
    )
    from sniper_tpu.data.mask_utils import rasterize_gt_masks

    rng = np.random.RandomState(7)
    data = (rng.randn(B, H, W, 3) * 0.1).astype(np.float32)
    asn = AnchorTargetAssigner(
        chip_size=H, anchor_scales=(2, 4, 7), anchor_ratios=(0.5, 1, 2),
        rpn_batch_size=RPN_BATCH, fg_fraction=0.5,
        pos_thresh=0.5, neg_thresh=0.4, max_n_gts=10,
        autofocus=AutoFocusParams(small_thresh=40.0, dc_low=5.0,
                                  dc_high=56.0),
        sparse=True,
    )
    batch = {
        "data": data,
        "im_info": np.tile([[H, W, 1.0]], (B, 1)).astype(np.float32),
        "valid_ranges": np.tile([[0.0, 512.0]], (B, 1)).astype(np.float32),
    }
    rows: dict[str, list] = {k: [] for k in
                             ("gt_boxes", "rpn_pids", "rpn_label_vals",
                              "fg_pids", "fg_targets", "scale_label",
                              "gt_masks")}
    for i, (boxes, classes) in enumerate(_GT):
        # plant per-box patterns so the image is learnable, seeded per image
        for b_, c_ in zip(boxes, classes):
            data[i, int(b_[1]):int(b_[3]), int(b_[0]):int(b_[2]),
                 int(c_) % 3] += 2.0
        nb = len(boxes)
        tgt = asn(
            np.array([0.0, 0, H - 1, W - 1]), 1.0, np.arange(nb),
            np.arange(nb), boxes, classes, np.random.RandomState(11 + i),
        )
        rows["gt_boxes"].append(tgt.gt_boxes)
        rows["rpn_pids"].append(tgt.rpn_pids)
        rows["rpn_label_vals"].append(tgt.rpn_label_vals)
        rows["fg_pids"].append(tgt.fg_pids)
        rows["fg_targets"].append(tgt.fg_targets)
        rows["scale_label"].append(tgt.focus_label)
        polys = [_l_poly(boxes[k]) for k in tgt.gt_keep]
        kept_boxes = tgt.gt_boxes[: len(tgt.gt_keep), :4]
        rows["gt_masks"].append(
            rasterize_gt_masks(polys, kept_boxes, grid=112, max_n_gts=10)
        )
    for k, v in rows.items():
        batch[k] = np.stack(v)
    return batch


def run_steps():
    import jax.numpy as jnp
    import optax

    from sniper_tpu.config import default_config
    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.parallel.mesh import make_mesh, shard_batch
    from sniper_tpu.train.optimizer import make_optimizer
    from sniper_tpu.train.trainer import create_train_state, make_train_step

    mesh = make_mesh(1)
    cfg = default_config()
    cfg.TRAIN.lr = 0.01
    cfg.TRAIN.warmup = True
    cfg.TRAIN.warmup_lr = 0.001
    cfg.TRAIN.warmup_step = 10  # steps 0-2 sit ON the warmup ramp: the
    # fixture pins the warmup arithmetic too, not just the base lr
    cfg.TRAIN.lr_step = "1.0"
    cfg.TRAIN.wd = 1e-4
    cfg.network.FIXED_PARAMS = ["conv0", "bn0", "stage1", "bn_data"]

    model = SNIPERDetector(
        num_classes=5, num_anchors=A, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1),
        pre_nms_top_n=128, post_nms_top_n=16, num_rois=16,
        autofocus=True, with_mask=True, num_mask_rois=4,
        dtype=jnp.float32,
    )
    batch = build_batch()
    state = create_train_state(model, cfg, batch, optax.sgd(0.1), seed=42)
    tx, _ = make_optimizer(cfg, epoch_size=100, params=state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(
        model, tx, mesh, batch_images_per_device=B, rpn_batch_size=RPN_BATCH,
        with_autofocus=True, with_mask=True,
    )

    key = jax.random.PRNGKey(123)
    out = []
    for _ in range(N_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, shard_batch(mesh, batch), sub)
        out.append({k: float(metrics[k]) for k in LOSS_KEYS})
    return out


if __name__ == "__main__":
    steps = run_steps()
    with open(FIXTURE, "w") as f:
        json.dump({"n_steps": N_STEPS, "loss_keys": list(LOSS_KEYS),
                   "steps": steps}, f, indent=1)
    print(f"wrote {FIXTURE}")
    for i, s in enumerate(steps):
        print(i, {k: round(v, 6) for k, v in s.items()})
