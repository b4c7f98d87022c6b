"""COCO dataset + native evaluator tests on a synthetic annotation file."""

import json
import os

import numpy as np
import pytest

from sniper_tpu.data.coco import COCODataset
from sniper_tpu.data.roidb import (
    append_flipped_images,
    filter_roidb,
    merge_gt_and_proposals,
)


@pytest.fixture
def coco_dir(tmp_path):
    ann = {
        "images": [
            {"id": 1, "width": 640, "height": 480, "file_name": "a.jpg"},
            {"id": 2, "width": 320, "height": 240, "file_name": "b.jpg"},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 18, "iscrowd": 0,
             "bbox": [100, 100, 50, 60], "area": 3000},
            {"id": 2, "image_id": 1, "category_id": 18, "iscrowd": 0,
             "bbox": [300, 50, 20, 20], "area": 400},
            {"id": 3, "image_id": 1, "category_id": 44, "iscrowd": 1,
             "bbox": [0, 0, 200, 200], "area": 40000},
            {"id": 4, "image_id": 2, "category_id": 44, "iscrowd": 0,
             "bbox": [10, 10, 150, 120], "area": 18000},
        ],
        "categories": [
            {"id": 18, "name": "dog"}, {"id": 44, "name": "bottle"},
        ],
    }
    d = tmp_path / "coco"
    (d / "annotations").mkdir(parents=True)
    with open(d / "annotations" / "instances_tiny.json", "w") as f:
        json.dump(ann, f)
    return str(d)


def test_roidb_construction(coco_dir, tmp_path):
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    assert ds.num_classes == 3
    assert ds.classes == ["__background__", "dog", "bottle"]
    roidb = ds.gt_roidb(use_cache=False)
    assert len(roidb) == 2
    r = roidb[0]
    assert r["boxes"].shape == (3, 4)
    # xywh -> xyxy with the -1 convention
    np.testing.assert_allclose(r["boxes"][0], [100, 100, 149, 159])
    # crowd row: overlaps -1, so max_overlaps != 1
    assert (r["gt_overlaps"][2] == -1).all()
    assert r["max_overlaps"][2] != 1
    assert (r["max_overlaps"][:2] == 1).all()
    assert r["gt_classes"].tolist() == [1, 1, 2]


def test_gt_roidb_cache(coco_dir, tmp_path):
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    r1 = ds.gt_roidb()
    assert os.path.exists(os.path.join(str(tmp_path), "cache"))
    r2 = ds.gt_roidb()
    assert len(r1) == len(r2)


def test_flipping(coco_dir, tmp_path):
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    roidb = ds.gt_roidb(use_cache=False)
    full = append_flipped_images(roidb)
    assert len(full) == 4
    orig, flip = full[0], full[2]
    w = orig["width"]
    np.testing.assert_allclose(
        flip["boxes"][0],
        [w - orig["boxes"][0][2] - 1, 100, w - orig["boxes"][0][0] - 1, 159],
    )
    assert flip["flipped"]


def test_merge_proposals(coco_dir, tmp_path):
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    r = ds.gt_roidb(use_cache=False)[0]
    props = np.array([[100, 100, 150, 160], [500, 400, 600, 470]], np.float32)
    merged = merge_gt_and_proposals(r, props, num_classes=3)
    assert merged["boxes"].shape[0] == 5
    # first proposal overlaps gt 0 highly -> high max_overlap, class 1
    assert merged["max_overlaps"][3] > 0.8
    assert merged["max_classes"][3] == 1
    # stray proposal -> zero overlap
    assert merged["max_overlaps"][4] == 0
    # GT rows still flagged by max_overlaps == 1
    assert (merged["max_overlaps"][:2] == 1).all()


def test_filter_roidb(coco_dir, tmp_path):
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    roidb = ds.gt_roidb(use_cache=False)
    kept = filter_roidb(roidb)
    assert len(kept) == 2  # both images have fg


def _perfect_results(ds, roidb):
    res = []
    for r in roidb:
        for box, cls, ov in zip(r["boxes"], r["gt_classes"], r["max_overlaps"]):
            if ov != 1:
                continue  # skip crowd
            x1, y1, x2, y2 = box
            res.append({
                "image_id": r["im_id"],
                "category_id": ds.class_to_cat_id[int(cls)],
                "bbox": [float(x1), float(y1), float(x2 - x1 + 1),
                         float(y2 - y1 + 1)],
                "score": 0.95,
            })
    return res


def test_eval_perfect_detections(coco_dir, tmp_path):
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    roidb = ds.gt_roidb(use_cache=False)
    from sniper_tpu.data.coco_eval import COCOEvaluator

    ev = COCOEvaluator(ds, roidb)
    stats = ev.evaluate(_perfect_results(ds, roidb))
    assert stats["AP"] == pytest.approx(1.0, abs=1e-6)
    assert stats["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_eval_missing_and_spurious(coco_dir, tmp_path):
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    roidb = ds.gt_roidb(use_cache=False)
    from sniper_tpu.data.coco_eval import COCOEvaluator

    res = _perfect_results(ds, roidb)
    res = res[:-1]  # drop the bottle detection entirely
    # add a high-scoring false positive for dog
    res.append({
        "image_id": 2, "category_id": 18,
        "bbox": [0.0, 0.0, 30.0, 30.0], "score": 0.99,
    })
    stats = COCOEvaluator(ds, roidb).evaluate(res)
    assert stats["AP"] < 0.8
    assert 0 < stats["AP50"] < 1.0


def test_eval_crowd_matching_not_penalized(coco_dir, tmp_path):
    """A det matching only a crowd region is ignored, not a FP."""
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    roidb = ds.gt_roidb(use_cache=False)
    from sniper_tpu.data.coco_eval import COCOEvaluator

    res = _perfect_results(ds, roidb)
    # detection entirely inside the crowd bottle region of image 1
    res.append({
        "image_id": 1, "category_id": 44,
        "bbox": [10.0, 10.0, 50.0, 50.0], "score": 0.99,
    })
    stats = COCOEvaluator(ds, roidb).evaluate(res)
    assert stats["AP"] == pytest.approx(1.0, abs=1e-6)


def test_results_json_format(coco_dir, tmp_path):
    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    roidb = ds.gt_roidb(use_cache=False)
    all_boxes = [
        [np.zeros((0, 5), np.float32) for _ in roidb]
        for _ in range(ds.num_classes)
    ]
    all_boxes[1][0] = np.array([[100, 100, 149, 159, 0.9]], np.float32)
    res = ds.detections_to_results(all_boxes, roidb)
    assert len(res) == 1
    assert res[0]["category_id"] == 18
    np.testing.assert_allclose(res[0]["bbox"], [100, 100, 50, 60])


def test_evaluate_recall(coco_dir, tmp_path):
    from sniper_tpu.data.roidb import evaluate_recall

    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    roidb = ds.gt_roidb(use_cache=False)
    # perfect proposals = the GT boxes themselves
    cands = [r["boxes"][r["max_overlaps"] == 1] for r in roidb]
    stats = evaluate_recall(roidb, candidate_boxes=cands)
    assert stats["ar"] == pytest.approx(1.0)
    # garbage proposals -> zero recall
    bad = [np.array([[0, 0, 5, 5]], np.float32) for _ in roidb]
    stats2 = evaluate_recall(roidb, candidate_boxes=bad)
    assert stats2["ar"] == 0.0


def test_load_rpn_proposals_nms_cache(coco_dir, tmp_path):
    """The per-image NMS of a loaded proposal pkl is cached next to it
    (reference imdb.py:83-117 Pool+pkl cache): a second load hits the
    cache and returns identical merges; rewriting the pkl invalidates
    the stale cache."""
    import pickle
    import time

    from sniper_tpu.data.roidb import load_rpn_proposals

    ds = COCODataset("tiny", str(tmp_path), coco_dir)
    roidb = ds.gt_roidb(use_cache=False)
    rng = np.random.RandomState(0)
    n = 60

    def write_pkl(seed):
        r2 = np.random.RandomState(seed)
        boxes = []
        for _ in roidb:
            # clustered boxes so the 0.7-IoU NMS really prunes
            x1 = r2.uniform(0, 60, n)
            y1 = r2.uniform(0, 50, n)
            d = np.stack([x1, y1, x1 + r2.uniform(90, 120, n),
                          y1 + r2.uniform(90, 120, n),
                          r2.uniform(0, 1, n)], axis=1).astype(np.float32)
            boxes.append(d)
        p = str(tmp_path / "tiny_rpn.pkl")
        with open(p, "wb") as f:
            pickle.dump({"boxes": boxes}, f)
        return p

    pkl = write_pkl(1)
    out1 = load_rpn_proposals(pkl, roidb, num_classes=3)
    # filename carries the full validity key (thresh, top_k, #images)
    # so differing callers don't thrash one shared file
    cache = f"{pkl}.nms_0.7.top-1.n{len(roidb)}.pkl"
    assert os.path.exists(cache), "NMS cache must be written"
    out2 = load_rpn_proposals(pkl, roidb, num_classes=3)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(a["boxes"], b["boxes"])
    # NMS actually pruned something (cache isn't caching a no-op)
    assert all(len(o["boxes"]) < n + len(r["boxes"])
               for o, r in zip(out1, roidb))

    # stale cache: rewrite the pkl with different proposals (force a
    # different mtime) -> the merge must reflect the NEW proposals
    time.sleep(0.02)
    pkl = write_pkl(2)
    os.utime(pkl, (time.time() + 5, time.time() + 5))
    out3 = load_rpn_proposals(pkl, roidb, num_classes=3)
    assert any(
        a["boxes"].shape != c["boxes"].shape
        or not np.array_equal(a["boxes"], c["boxes"])
        for a, c in zip(out1, out3)
    )
    # uncached path agrees with the (freshly rebuilt) cached path
    out4 = load_rpn_proposals(pkl, roidb, num_classes=3, use_cache=False)
    for c, d in zip(out3, out4):
        np.testing.assert_array_equal(c["boxes"], d["boxes"])
