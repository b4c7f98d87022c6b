"""Per-scale post-NMS roi counts (list-valued TEST.N_PROPOSAL_PER_SCALE).

The reference ships N_PROPOSAL_PER_SCALE in every yml but never reads
it; here a list value sets the post-NMS roi count per test scale (the
small/coarse canvases only keep large detections via VALID_RANGES, so
they don't need the full 300 rois/img — the canvas-independent
proposal+head work is the measured small-canvas floor)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import main_test
from sniper_tpu.config import default_config
from sniper_tpu.models.detector import SNIPERDetector


def _tiny_model(post_nms=16):
    return SNIPERDetector(
        num_classes=3, num_anchors=9, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), units=(1, 1, 1, 1),
        pre_nms_top_n=200, post_nms_top_n=post_nms, num_rois=16,
        dtype=jnp.float32,
    )


def test_scale_post_nms_resolution():
    cfg = default_config()
    model = _tiny_model(16)
    # scalar (reference-compat): global model count everywhere
    cfg.TEST.N_PROPOSAL_PER_SCALE = 300
    assert main_test._scale_post_nms(cfg, 0, model) == 16
    assert main_test._scale_post_nms(cfg, 2, model) == 16
    # list: per-scale counts
    cfg.TEST.N_PROPOSAL_PER_SCALE = [16, 8, 4]
    assert [main_test._scale_post_nms(cfg, s, model) for s in range(3)] \
        == [16, 8, 4]
    # full USE_CACHE hit passes model=None
    assert main_test._scale_post_nms(cfg, 1, None) == 8
    cfg.TEST.N_PROPOSAL_PER_SCALE = 300
    assert main_test._scale_post_nms(cfg, 1, None) == 0


# slow set: builds per-scale forwards (~18s); the resolution unit test
# and the realdata smoke's AP-neutrality check cover the semantics
@pytest.mark.slow
def test_run_detection_clones_model_per_scale(tmp_path, monkeypatch):
    """run_detection builds a per-scale forward with the list's count
    (and reuses the base model where the count matches), and the rois
    tensor really shrinks."""
    import cv2

    from sniper_tpu.data.test_loader import init_inference_crops

    rng = np.random.RandomState(0)
    imgs = []
    for i in range(2):
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, rng.randint(0, 255, (96, 128, 3)).astype(np.uint8))
        imgs.append(p)
    roidb = [{"image": p, "width": 128, "height": 96, "flipped": False}
             for p in imgs]
    init_inference_crops(roidb)

    cfg = default_config()
    cfg.TEST.SCALES = [(-1, 128), (-1, 64)]
    cfg.TEST.BATCH_IMAGES = [1, 1]
    cfg.TEST.VALID_RANGES = [(-1, -1), (-1, -1)]
    cfg.TEST.USE_CACHE = [False, False]
    cfg.TEST.DO_PRUNING = False
    cfg.TEST.AUTO_FOCUS = False
    cfg.TEST.NMS = 0.5
    cfg.TEST.NMS_SIGMA = -1
    cfg.TEST.MAX_PER_IMAGE = 10
    cfg.TEST.N_PROPOSAL_PER_SCALE = [16, 8]

    model = _tiny_model(16)
    data = jnp.zeros((1, 64, 64, 3))
    im_info = jnp.asarray([[64.0, 64.0, 1.0]])
    variables = model.init({"params": jax.random.PRNGKey(0)}, data, im_info,
                           train=False)

    seen = []
    real_make_forward = main_test.make_forward

    def spy_make_forward(m, *a, **k):
        seen.append(int(m.post_nms_top_n))
        fwd = real_make_forward(m, *a, **k)

        def wrapped(data, im_info):
            out = fwd(data, im_info)
            shapes.append(int(out["rois"].shape[1]))
            return out

        return wrapped

    shapes = []
    monkeypatch.setattr(main_test, "make_forward", spy_make_forward)

    class DS:
        num_classes = 3

        def evaluate_detections(self, all_boxes, roidb):
            return {"AP": 0.0}

    stats = main_test.run_detection(cfg, model, variables, roidb, DS(),
                                    str(tmp_path))
    assert stats == {"AP": 0.0}
    # base forward (16) + the scale-1 clone (8)
    assert seen == [16, 8]
    assert set(shapes) == {16, 8}, shapes
