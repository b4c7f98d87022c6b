"""ProcessChipLoader: bit-parity with the in-process ChipLoader.

The process-staged assembly (data/shm_loader.py, TRAIN.LOADER_PROCESS)
must be a pure transport change: same seed -> same chips -> identical
batches, across multiple reset/epoch cycles and through the shm
slot-recycling protocol (which a stale-token or premature-recycle bug
would corrupt silently).
"""

import os

import numpy as np
import pytest

from sniper_tpu.config import default_config
from sniper_tpu.data.loader import ChipLoader
from sniper_tpu.data.shm_loader import ProcessChipLoader


@pytest.fixture
def setup(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    roidb = []
    for i in range(6):
        w, h = (640, 480) if i % 2 else (480, 640)
        im = cv2.GaussianBlur(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8), (11, 11), 5)
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, im)
        n_gt = 5
        x1 = rng.uniform(0, w - 260, n_gt)
        y1 = rng.uniform(0, h - 260, n_gt)
        s = rng.uniform(20, 250, n_gt)
        boxes = np.stack([x1, y1, np.minimum(x1 + s, w - 1),
                          np.minimum(y1 + s, h - 1)], 1).astype(np.float32)
        roidb.append({
            "image": p, "width": w, "height": h, "boxes": boxes,
            "max_overlaps": np.ones(n_gt),
            "max_classes": rng.randint(1, 5, n_gt),
            "flipped": False,
        })
    cfg = default_config()
    cfg.TRAIN.SCALES = [(1400, 2000), (800, 1280), (-1, 512)]
    cfg.TRAIN.VALID_RANGES = [(-1, 80), (32, 150), (120, -1)]
    cfg.TRAIN.USE_NEG_CHIPS = False
    cfg.network.ANCHOR_SCALES = (2, 4, 7)
    cfg.network.ANCHOR_RATIOS = (0.5, 1, 2)
    cfg.network.NUM_ANCHORS = 9
    return roidb, cfg


def test_process_loader_bit_parity_two_epochs(setup):
    roidb, cfg = setup
    ref = ChipLoader(roidb, cfg, batch_size=4, seed=7)
    got = ProcessChipLoader(roidb, cfg, batch_size=4, seed=7)
    try:
        for epoch in range(2):
            n_ref = ref.reset()
            n_got = got.reset()
            assert n_ref == n_got, (epoch, n_ref, n_got)
            assert len(ref) == len(got)
            ref_batches = list(iter(ref))
            got_batches = list(iter(got))
            assert len(ref_batches) == len(got_batches) == len(ref)
            for i, (a, b) in enumerate(zip(ref_batches, got_batches)):
                assert set(a) == set(b), (epoch, i)
                for k in a:
                    np.testing.assert_array_equal(
                        np.asarray(a[k]), np.asarray(b[k]),
                        err_msg=f"epoch {epoch} batch {i} key {k}",
                    )
    finally:
        got.close()


def test_process_loader_sample_batch_matches_inprocess(setup):
    """main_train's shape probe goes through sample_batch() on the
    process loader; it must return the same first batch (and advance
    the loader rng identically) as next(iter(loader)) in-process."""
    roidb, cfg = setup
    ref = ChipLoader(roidb, cfg, batch_size=4, seed=11)
    got = ProcessChipLoader(roidb, cfg, batch_size=4, seed=11)
    try:
        ref.reset()
        got.reset()
        a = next(iter(ref))
        b = got.sample_batch()
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)
    finally:
        got.close()


def test_process_loader_child_error_surfaces(setup):
    roidb, cfg = setup
    bad = [dict(r, image="/nonexistent/nope.jpg") for r in roidb]
    got = ProcessChipLoader(bad, cfg, batch_size=4, seed=7)
    try:
        got.reset()
        with pytest.raises(RuntimeError, match="loader process failed"):
            list(iter(got))
    finally:
        got.close()
