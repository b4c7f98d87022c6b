"""mask_transform: box-frame mask intersection, IoU, VOC->COCO RLE."""

import numpy as np
import pytest

from sniper_tpu.data.mask_transform import (
    intersect_box_mask,
    mask_overlap,
    mask_voc2coco,
)
from sniper_tpu.infer.masks import rle_to_binary_mask


def test_intersect_box_mask_paste():
    # gt mask indexed in absolute image coordinates (reference quirk)
    gt_mask = np.zeros((100, 100), bool)
    gt_mask[20:41, 30:51] = True  # gt box (30,20)-(50,40) inclusive
    gt_box = [30, 20, 50, 40]
    ex_box = [40, 30, 60, 50]  # overlaps the lower-right gt quadrant
    out = intersect_box_mask(ex_box, gt_box, gt_mask)
    assert out.shape == (21, 21)
    # intersection (40,30)-(50,40) maps to ex-frame rows 0..10, cols 0..10
    assert out[:11, :11].all()
    assert not out[11:, :].any() and not out[:, 11:].any()


def test_intersect_box_mask_disjoint():
    out = intersect_box_mask([0, 0, 10, 10], [50, 50, 60, 60],
                             np.ones((100, 100), bool))
    assert out.shape == (21, 21) and not out.any()


def test_mask_overlap_identity_and_disjoint():
    box = [10, 10, 30, 30]
    mask = np.zeros((21, 21), bool)
    mask[5:15, 5:15] = True
    assert mask_overlap(box, box, mask, mask) == pytest.approx(1.0)
    assert mask_overlap(box, [100, 100, 120, 120], mask, mask) == 0.0
    # half-overlapping identical squares
    m_full = np.ones((21, 21), bool)
    iou = mask_overlap([0, 0, 20, 20], [0, 10, 20, 30], m_full, m_full)
    # intersection rows 10..20 (11 rows x 21 cols); union 2*441 - 231
    assert iou == pytest.approx(11 * 21 / (2 * 441 - 11 * 21))


def test_mask_voc2coco_rle_paste():
    mask = np.ones((7, 7), np.float32)
    boxes = np.array([[10, 20, 29, 39, 0.9]], np.float32)
    rles = mask_voc2coco([mask], boxes, im_height=60, im_width=50)
    assert len(rles) == 1
    dec = rle_to_binary_mask(rles[0])
    assert dec.shape == (60, 50)
    assert dec[20:40, 10:30].all()
    assert dec.sum() == 20 * 20
    # box poking past the image edge is clipped, not an error
    boxes2 = np.array([[40, 50, 60, 70, 0.9]], np.float32)
    dec2 = rle_to_binary_mask(
        mask_voc2coco([mask], boxes2, im_height=60, im_width=50)[0]
    )
    assert dec2[50:60, 40:50].all() and dec2.sum() == 100
