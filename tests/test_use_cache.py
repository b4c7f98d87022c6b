"""TEST.USE_CACHE: a killed multi-scale eval resumes from per-scale
detection pkls without touching the device (reference
inference.py:507-515)."""

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sniper_tpu.config import default_config


class SpyDataset:
    num_classes = 3

    def evaluate_detections(self, all_boxes, roidb):
        self.all_boxes = all_boxes
        return {"AP": 0.0}


def test_run_detection_reloads_all_scales_from_cache(tmp_path):
    import main_test

    cfg = default_config()
    cfg.TEST.SCALES = [(-1, 64), (-1, 128)]
    cfg.TEST.BATCH_IMAGES = [1, 1]
    cfg.TEST.VALID_RANGES = [(-1, -1), (-1, -1)]
    cfg.TEST.USE_CACHE = [True, True]
    cfg.TEST.NMS = 0.5
    cfg.TEST.NMS_SIGMA = -1
    cfg.TEST.AUTO_FOCUS = False
    cfg.TEST.DO_PRUNING = False
    cfg.TEST.MAX_PER_IMAGE = 10

    roidb = [{"width": 64, "height": 64, "image": "none.jpg"}]
    out_dir = str(tmp_path)
    # pre-seed both scales' caches (the new dict format)
    det = np.array([[5, 5, 30, 30, 0.9]], np.float32)
    for s in range(2):
        boxes = [[[np.zeros((0, 5), np.float32)]] for _ in range(3)]
        if s == 0:
            boxes[1][0][0] = det
        with open(os.path.join(out_dir, f"dets_scale{s}.pkl"), "wb") as f:
            pickle.dump({"dets": boxes, "maps": None, "masks": None}, f)

    ds = SpyDataset()
    # model=None proves the device path is never touched on a full cache
    # hit (make_forward wraps lazily; nothing traces unless called)
    stats = main_test.run_detection(cfg, None, None, roidb, ds, out_dir)
    assert stats == {"AP": 0.0}
    merged = ds.all_boxes[1][0]
    assert merged.shape[0] == 1
    np.testing.assert_allclose(merged[0, :4], det[0, :4])
