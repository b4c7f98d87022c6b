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


def test_selective_search_roidb(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    devkit = make_devkit(tmp_path)
    ds = PascalVOC("2007_test", str(tmp_path), devkit)
    gt = ds.gt_roidb(use_cache=False)
    # devkit-format .mat: boxes [y1 x1 y2 x2], 1-based, with a duplicate
    # and a tiny box that must be filtered
    per_image = [
        np.array([[50, 49, 150, 149], [50, 49, 150, 149],
                  [10, 10, 15, 15], [200, 220, 320, 340]], np.float64),
        np.array([[101, 101, 301, 401]], np.float64),
    ]
    cells = np.empty((len(per_image), 1), object)
    for i, b in enumerate(per_image):
        cells[i, 0] = b
    os.makedirs(tmp_path / "selective_search_data")
    scipy_io.savemat(
        str(tmp_path / "selective_search_data" / f"{ds.name}.mat"),
        {"boxes": cells},
    )
    ss = ds.selective_search_roidb(gt, use_cache=False)
    assert len(ss) == 2
    # dup removed, small box removed -> 2 proposals in image 0
    assert ss[0]["boxes"].shape[0] == 2
    # [y1 x1 y2 x2] 1-based -> [x1 y1 x2 y2] 0-based
    np.testing.assert_allclose(ss[0]["boxes"][0], [48, 49, 148, 149])
    # proposal identical to the dog GT gets max_overlap 1 @ class dog
    assert ss[0]["max_overlaps"][0] == 1.0
    assert ds.classes[ss[0]["max_classes"][0]] == "dog"
    assert (ss[0]["gt_classes"] == 0).all()

    merged = ds.selective_search_roidb(gt, append_gt=True, use_cache=False)
    assert merged[0]["boxes"].shape[0] == 2 + gt[0]["boxes"].shape[0]


def test_segmentation_eval(tmp_path):
    PIL_Image = pytest.importorskip("PIL.Image")
    devkit = make_devkit(tmp_path)
    ds = PascalVOC("2007_test", str(tmp_path), devkit)
    seg_dir = tmp_path / "VOCdevkit" / "VOC2007" / "SegmentationClass"
    seg_dir.mkdir()
    h, w = 48, 64
    gts, preds = [], []
    rng = np.random.RandomState(0)
    for index in ds.image_index:
        gt = rng.randint(0, 3, (h, w)).astype(np.uint8)
        gt[:4, :4] = 255  # ignore region
        PIL_Image.fromarray(gt).save(str(seg_dir / f"{index}.png"))
        gts.append(gt)
        preds.append(gt.copy())
    # perfect predictions: IU 1.0 for the 3 present classes, 0 for the
    # absent ones -> meanIU = 3/21
    out = ds.evaluate_segmentations([np.where(g == 255, 0, g) for g in gts])
    np.testing.assert_allclose(out["IU_array"][:3], 1.0)
    assert out["meanIU"] == pytest.approx(3.0 / ds.num_classes)
    # corrupt half of image 0's labels -> IU drops
    bad = [p.copy() for p in preds]
    bad[0][h // 2 :] = (bad[0][h // 2 :] + 1) % 3
    out2 = ds.evaluate_segmentations(
        [np.where(b == 255, 0, b) for b in bad]
    )
    assert out2["IU_array"][:3].mean() < 1.0

    res_dir = ds.write_segmentation_results(
        [np.where(g == 255, 0, g) for g in gts]
    )
    assert os.path.exists(os.path.join(res_dir, "000001.png"))
