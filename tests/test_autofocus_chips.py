"""AutoFocus FocusChip generation tests."""

import numpy as np

from sniper_tpu.chips.autofocus import add_chips, gmask
from sniper_tpu.config import default_config


def test_gmask_single_blob():
    m = np.zeros((32, 32), np.float32)
    m[10:14, 8:12] = 0.9
    chips = gmask(m, d=2, thresh_value=0.5, ms=8, im_width=512, im_height=512,
                  cscale=1.0)
    assert len(chips) == 1
    x1, y1, x2, y2 = chips[0]
    # min chip size 8 cells * 16 px = 128 px
    assert x2 - x1 >= 8 * 16 and y2 - y1 >= 8 * 16
    # covers the blob (blob spans cols 8-12, rows 10-14 in grid cells)
    assert x1 <= 8 * 16 and x2 >= 12 * 16
    assert y1 <= 10 * 16 and y2 >= 14 * 16


def test_gmask_empty_map():
    m = np.zeros((32, 32), np.float32)
    assert gmask(m, d=2, thresh_value=0.5, ms=8, im_width=512, im_height=512) == []


def test_gmask_merges_nearby_blobs():
    m = np.zeros((32, 32), np.float32)
    m[5:7, 5:7] = 0.9
    m[9:11, 9:11] = 0.9  # within min-chip reach -> should merge
    chips = gmask(m, d=2, thresh_value=0.5, ms=10, im_width=512, im_height=512)
    assert len(chips) == 1


def test_gmask_respects_boundaries():
    m = np.zeros((16, 16), np.float32)
    m[0:2, 0:2] = 0.9
    chips = gmask(m, d=1, thresh_value=0.5, ms=8, im_width=256, im_height=256)
    for c in chips:
        assert c[0] >= 0 and c[1] >= 0
        assert c[2] <= 256 and c[3] <= 256


def test_add_chips_replaces_crops():
    cfg = default_config()
    cfg.TEST.SCALES = [(1400, 2000), (800, 1280), (480, 512)]
    cfg.TEST.CHIP_HYPERPARAMS = [(2, 0.35, 8), (2, 0.35, 8), (2, 0.35, 8)]
    roidb = [{
        "width": 640, "height": 480,
        "inference_crops": np.array([[0.0, 0, 640, 480]]),
    }]
    fh, fw = 30, 40  # coarse-scale map of the full image
    m = np.zeros((fh, fw), np.float32)
    m[10:14, 20:24] = 0.9
    maps = [[m]]
    chip_area, total_area = add_chips(roidb, maps, 0, cfg)
    crops = roidb[0]["inference_crops"]
    assert crops.shape[0] == 1
    assert chip_area < total_area  # focus chips shrink the processed area
    x1, y1, x2, y2 = crops[0]
    assert 0 <= x1 < x2 <= 640 and 0 <= y1 < y2 <= 480


def test_add_chips_no_focus_pixels():
    cfg = default_config()
    cfg.TEST.SCALES = [(1400, 2000), (800, 1280)]
    cfg.TEST.CHIP_HYPERPARAMS = [(2, 0.35, 8), (2, 0.35, 8)]
    roidb = [{
        "width": 640, "height": 480,
        "inference_crops": np.array([[0.0, 0, 640, 480]]),
    }]
    maps = [[np.zeros((30, 40), np.float32)]]
    add_chips(roidb, maps, 0, cfg)
    assert roidb[0]["inference_crops"].shape[0] == 0


def test_add_chips_negative_lo_scale_spec():
    """[-1, hi] coarse scales must not degenerate FocusChips.

    Regression: add_chips' private resize rule divided by lo even for
    [-1, hi] specs, producing a NEGATIVE im_scale; gmask then clipped
    every chip to the whole image, silently turning AutoFocus into
    full-pyramid inference (and reporting >=100% "percent of pixels").
    Now it shares data.test_loader.scale_for_image.
    """
    cfg = default_config()
    cfg.TEST.SCALES = [(-1, 240), (-1, 768)]
    cfg.TEST.CHIP_HYPERPARAMS = [(2, 0.35, 4), (-1, -1, -1)]
    roidb = [{
        "width": 960, "height": 768,
        "inference_crops": np.array([[0.0, 0, 960, 768]]),
    }]
    # coarse canvas 240x192 -> 12x15 cell map with one localized blob
    m = np.zeros((12, 15), np.float32)
    m[2:5, 3:7] = 0.9
    chip_area, total_area = add_chips(roidb, [[m]], 0, cfg)
    crops = roidb[0]["inference_crops"]
    assert crops.shape[0] == 1
    x1, y1, x2, y2 = crops[0]
    # chip is a LOCAL region around the blob, not the whole canvas
    assert 0 <= x1 < x2 <= 960 and 0 <= y1 < y2 <= 768
    assert (x2 - x1) * (y2 - y1) < 0.5 * 960 * 768
    assert 0 < chip_area < 0.5 * total_area
