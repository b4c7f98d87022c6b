"""Pascal VOC dataset + AP evaluation on synthetic devkit files."""

import os

import numpy as np
import pytest

from sniper_tpu.data.pascal_voc import PascalVOC, voc_ap


def make_devkit(tmp_path, year="2007"):
    base = tmp_path / "VOCdevkit" / f"VOC{year}"
    (base / "ImageSets" / "Main").mkdir(parents=True)
    (base / "Annotations").mkdir()
    (base / "JPEGImages").mkdir()
    (base / "ImageSets" / "Main" / "test.txt").write_text("000001\n000002\n")

    def xml(objs, w=640, h=480):
        items = "".join(
            f"<object><name>{n}</name><difficult>{d}</difficult>"
            f"<bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
            f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox></object>"
            for n, d, b in objs
        )
        return (
            f"<annotation><size><width>{w}</width><height>{h}</height>"
            f"<depth>3</depth></size>{items}</annotation>"
        )

    (base / "Annotations" / "000001.xml").write_text(
        xml([("dog", 0, (49, 50, 149, 150)), ("cat", 0, (201, 201, 301, 301)),
             ("person", 1, (11, 11, 61, 61))])
    )
    (base / "Annotations" / "000002.xml").write_text(
        xml([("car", 0, (101, 101, 401, 301))])
    )
    return str(tmp_path / "VOCdevkit")


def test_roidb(tmp_path):
    devkit = make_devkit(tmp_path)
    ds = PascalVOC("2007_test", str(tmp_path), devkit)
    assert ds.num_classes == 21
    roidb = ds.gt_roidb(use_cache=False)
    assert len(roidb) == 2
    # difficult object excluded; 1-based xml -> 0-based boxes
    assert roidb[0]["boxes"].shape[0] == 2
    np.testing.assert_allclose(roidb[0]["boxes"][0], [48, 49, 148, 149])
    assert ds.classes[roidb[0]["gt_classes"][0]] == "dog"
    assert (roidb[0]["max_overlaps"] == 1).all()


def _boxes_template(ds, roidb):
    return [
        [np.zeros((0, 5), np.float32) for _ in roidb]
        for _ in range(ds.num_classes)
    ]


def test_eval_perfect(tmp_path):
    devkit = make_devkit(tmp_path)
    ds = PascalVOC("2007_test", str(tmp_path), devkit)
    roidb = ds.gt_roidb(use_cache=False)
    all_boxes = _boxes_template(ds, roidb)
    for i, r in enumerate(roidb):
        for b, c in zip(r["boxes"], r["gt_classes"]):
            det = np.array([[b[0], b[1], b[2], b[3], 0.9]], np.float32)
            all_boxes[c][i] = np.vstack([all_boxes[c][i], det])
    stats = ds.evaluate_detections(all_boxes, roidb)
    assert stats["mAP"] == pytest.approx(1.0, abs=1e-3)


def test_eval_false_positive(tmp_path):
    devkit = make_devkit(tmp_path)
    ds = PascalVOC("2007_test", str(tmp_path), devkit)
    roidb = ds.gt_roidb(use_cache=False)
    all_boxes = _boxes_template(ds, roidb)
    dog = ds.classes.index("dog")
    # one hit + one higher-scoring miss
    all_boxes[dog][0] = np.array(
        [[48, 49, 148, 149, 0.5], [400, 400, 500, 470, 0.9]], np.float32
    )
    stats = ds.evaluate_detections(all_boxes, roidb)
    assert 0 < stats["per_class"]["dog"] < 1.0


def test_write_results_format(tmp_path):
    devkit = make_devkit(tmp_path)
    ds = PascalVOC("2007_test", str(tmp_path), devkit)
    roidb = ds.gt_roidb(use_cache=False)
    all_boxes = _boxes_template(ds, roidb)
    dog = ds.classes.index("dog")
    all_boxes[dog][0] = np.array([[48, 49, 148, 149, 0.7]], np.float32)
    paths = ds.write_results(all_boxes, roidb)
    line = open(paths["dog"]).read().strip().split()
    assert line[0] == "000001"
    assert float(line[2]) == 49.0  # back to 1-based


def test_voc_ap_metrics():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    ap07 = voc_ap(rec, prec, use_07_metric=True)
    ap12 = voc_ap(rec, prec, use_07_metric=False)
    # 07: 6 points at p=1 (t<=0.5), 5 at 0.5 -> (6 + 2.5)/11
    assert ap07 == pytest.approx((6 * 1.0 + 5 * 0.5) / 11)
    assert ap12 == pytest.approx(0.5 * 1.0 + 0.5 * 0.5)
