"""Generate the COCO-eval golden fixture by running the REFERENCE's
vendored pycocotools protocol (read-only, out-of-repo) on a synthetic
detection set.

The reference evaluates through lib/dataset/pycocotools/cocoeval.py;
this repo reimplements that protocol natively (sniper_tpu/data/
coco_eval.py) because pycocotools is not installed here. To prove
numeric agreement, this script:

1. builds a deterministic synthetic GT + detections fixture (crowds,
   area bands, duplicate/false detections, RLE masks),
2. executes the reference cocoeval source (with mechanical py2->py3
   token fixes; the protocol logic is untouched) against a minimal
   COCO-API shim + a NumPy `mask` stub,
3. writes fixture + the 12 bbox stats + 12 segm stats to
   tests/fixtures/cocoeval_golden.json.

tests/test_coco_eval_golden.py then asserts the native evaluator
reproduces these numbers exactly. Regenerate with:
    python scripts/gen_cocoeval_golden.py
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np

REF = "/root/reference/lib/dataset/pycocotools/cocoeval.py"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "cocoeval_golden.json")


# ---------------------------------------------------------------------------
# fixture construction (pure numpy; RLE helpers from the repo)
# ---------------------------------------------------------------------------

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sniper_tpu.infer.masks import binary_mask_to_rle  # noqa: E402

CAT_IDS = [1, 3, 7]  # non-contiguous on purpose
IMG_SIZES = {101: (96, 128), 102: (120, 100), 103: (80, 80),
             104: (140, 140), 105: (64, 96), 106: (110, 130),
             107: (90, 90), 108: (128, 128)}


def make_mask(h, w, box):
    """Rectangle mask with a notched corner so segm IoU != bbox IoU."""
    x, y, bw, bh = box
    m = np.zeros((h, w), np.uint8)
    x1, y1 = int(round(x)), int(round(y))
    x2, y2 = min(int(round(x + bw)), w), min(int(round(y + bh)), h)
    x1, y1 = max(x1, 0), max(y1, 0)
    if x2 > x1 and y2 > y1:
        m[y1:y2, x1:x2] = 1
        nx, ny = max((x2 - x1) // 3, 1), max((y2 - y1) // 3, 1)
        m[y1 : y1 + ny, x1 : x1 + nx] = 0
    return m


def build_fixture(seed=20260816):
    rng = np.random.RandomState(seed)
    gts, dts_bbox, dts_segm = [], [], []
    gid, did = 1, 1  # ids start at 1 (dtm==0 means "unmatched")
    for im_id, (h, w) in IMG_SIZES.items():
        for cat in CAT_IDS:
            n_gt = rng.randint(0, 4)
            for _ in range(n_gt):
                # spread areas across the small/medium/large bands
                band = rng.choice([16, 48, 100])
                bw = float(np.clip(rng.normal(band, band / 3), 4, w - 2))
                bh = float(np.clip(rng.normal(band, band / 3), 4, h - 2))
                x = float(rng.uniform(0, w - bw))
                y = float(rng.uniform(0, h - bh))
                m = make_mask(h, w, (x, y, bw, bh))
                g = {
                    "id": gid, "image_id": im_id, "category_id": cat,
                    "bbox": [x, y, bw, bh],
                    "area": float(m.sum()),  # COCO gt area = mask area
                    "iscrowd": int(rng.rand() < 0.12),
                    "segmentation": binary_mask_to_rle(m),
                }
                gts.append(g)
                gid += 1
                # jittered detections (sometimes duplicated, sometimes none)
                for _ in range(rng.choice([0, 1, 1, 1, 2], p=[0.15, 0.25,
                                                              0.25, 0.25,
                                                              0.1])):
                    j = 0.15 * rng.randn(4) * [bw, bh, bw, bh]
                    db = [x + j[0], y + j[1], max(bw + j[2], 3),
                          max(bh + j[3], 3)]
                    dm = make_mask(h, w, db)
                    base = {
                        "id": did, "image_id": im_id, "category_id": cat,
                        "bbox": [float(v) for v in db],
                        "score": float(rng.uniform(0.1, 1.0)),
                        "iscrowd": 0,
                    }
                    dts_bbox.append({**base, "area": float(db[2] * db[3])})
                    dts_segm.append({
                        **base, "area": float(dm.sum()),
                        "segmentation": binary_mask_to_rle(dm),
                    })
                    did += 1
            # false positives
            for _ in range(rng.randint(0, 2)):
                bw = float(rng.uniform(5, 50))
                bh = float(rng.uniform(5, 50))
                x = float(rng.uniform(0, w - bw))
                y = float(rng.uniform(0, h - bh))
                dm = make_mask(h, w, (x, y, bw, bh))
                base = {
                    "id": did, "image_id": im_id, "category_id": cat,
                    "bbox": [x, y, bw, bh],
                    "score": float(rng.uniform(0.1, 1.0)),
                    "iscrowd": 0,
                }
                dts_bbox.append({**base, "area": float(bw * bh)})
                dts_segm.append({
                    **base, "area": float(dm.sum()),
                    "segmentation": binary_mask_to_rle(dm),
                })
                did += 1
    return gts, dts_bbox, dts_segm


# ---------------------------------------------------------------------------
# reference protocol runner
# ---------------------------------------------------------------------------

def _rle_decode(rle):
    h, w = rle["size"]
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in rle["counts"]:
        flat[pos : pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape(w, h).T


def _stub_mask_module():
    """NumPy stand-in for pycocotools' C `mask` module — only what
    cocoeval.py calls (iou / frPyObjects / merge)."""
    mod = types.ModuleType("mask")

    def iou(d, g, iscrowd):
        if len(d) == 0 or len(g) == 0:
            return []
        if isinstance(d[0], dict):  # RLE masks
            dm = np.stack([_rle_decode(x).reshape(-1) for x in d]) \
                .astype(np.float64)
            gm = np.stack([_rle_decode(x).reshape(-1) for x in g]) \
                .astype(np.float64)
            inter = dm @ gm.T
            da = dm.sum(1)[:, None]
            ga = gm.sum(1)[None, :]
        else:  # xywh boxes
            d = np.asarray(d, np.float64)
            g = np.asarray(g, np.float64)
            iw = (np.minimum(d[:, None, 0] + d[:, None, 2],
                             g[None, :, 0] + g[None, :, 2])
                  - np.maximum(d[:, None, 0], g[None, :, 0]))
            ih = (np.minimum(d[:, None, 1] + d[:, None, 3],
                             g[None, :, 1] + g[None, :, 3])
                  - np.maximum(d[:, None, 1], g[None, :, 1]))
            inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
            da = (d[:, 2] * d[:, 3])[:, None]
            ga = (g[:, 2] * g[:, 3])[None, :]
        crowd = np.asarray(iscrowd, bool)[None, :]
        union = np.where(crowd, da, da + ga - inter)
        return np.where(inter > 0, inter / np.maximum(union, 1e-12), 0.0)

    mod.iou = iou
    mod.frPyObjects = lambda objs, h, w: objs  # RLE dicts pass through
    mod.merge = lambda rles: rles[0]
    return mod


class MiniCOCO:
    """Just enough of the pycocotools COCO API for COCOeval."""

    def __init__(self, img_sizes, anns, cat_ids):
        self.imgs = {
            i: {"id": i, "height": h, "width": w}
            for i, (h, w) in img_sizes.items()
        }
        self.anns = list(anns)
        self._cat_ids = list(cat_ids)

    def getImgIds(self):
        return sorted(self.imgs)

    def getCatIds(self):
        return sorted(self._cat_ids)

    def getAnnIds(self, imgIds=None, catIds=None):
        im = set(imgIds) if imgIds else None
        ct = set(catIds) if catIds else None
        return [
            i for i, a in enumerate(self.anns)
            if (im is None or a["image_id"] in im)
            and (ct is None or a["category_id"] in ct)
        ]

    def loadAnns(self, ids):
        return [self.anns[i] for i in ids]


_PY3_FIXES = [
    # py2 print statements -> function calls (protocol untouched)
    ("print 'debug'", "print('debug')"),
    ("print 'Running per image evaluation...      '",
     "print('Running per image evaluation...')"),
    ("print 'DONE (t=%0.2fs).'%(toc-tic)", "print('DONE')"),
    ("print 'Accumulating evaluation results...   '",
     "print('Accumulating...')"),
    ("print 'Please run evaluate() first'", "print('run evaluate first')"),
    ("print 'DONE (t=%0.2fs).'%( toc-tic )", "print('DONE')"),
    ("print iStr.format(titleStr, typeStr, iouStr, areaStr, maxDetsStr, "
     "'%.3f'%(float(mean_s)))",
     "print(iStr.format(titleStr, typeStr, iouStr, areaStr, maxDetsStr, "
     "'%.3f'%(float(mean_s))))"),
    # py2 tuple-parameter lambda
    ("key=lambda (ind, g): g['_ignore']", "key=lambda ig: ig[1]['_ignore']"),
    # py3 removals
    ("E = filter(None, E)", "E = [e for e in E if e is not None]"),
    ("astype(dtype=np.float)", "astype(dtype=np.float64)"),
    ("np.round((0.95-.5)/.05)+1", "10"),
    ("np.round((1.00-.0)/.01)+1", "101"),
]


def load_reference_cocoeval():
    src = open(REF).read()
    for a, b in _PY3_FIXES:
        assert a in src, f"fixup target not found: {a!r}"
        src = src.replace(a, b)
    mask_mod = _stub_mask_module()
    g = {
        "__name__": "ref_cocoeval",
        "unicode": str,
        "mask": mask_mod,
    }
    sys.modules["mask"] = mask_mod
    exec(compile(src, REF, "exec"), g)
    return g["COCOeval"]


def run_reference(gts, dts, use_segm):
    COCOeval = load_reference_cocoeval()
    import copy

    cocoGt = MiniCOCO(IMG_SIZES, copy.deepcopy(gts), CAT_IDS)
    cocoDt = MiniCOCO(IMG_SIZES, copy.deepcopy(dts), CAT_IDS)
    E = COCOeval(cocoGt, cocoDt)
    E.params.useSegm = int(use_segm)
    E.evaluate()
    E.accumulate()
    E.summarize()
    return [float(s) for s in E.stats]


def main():
    gts, dts_bbox, dts_segm = build_fixture()
    stats_bbox = run_reference(gts, dts_bbox, use_segm=False)
    stats_segm = run_reference(gts, dts_segm, use_segm=True)
    fixture = {
        "provenance": (
            "generated by scripts/gen_cocoeval_golden.py running the "
            "reference vendored pycocotools cocoeval.py protocol"
        ),
        "images": [
            {"id": i, "height": h, "width": w}
            for i, (h, w) in IMG_SIZES.items()
        ],
        "cat_ids": CAT_IDS,
        "gts": gts,
        "dts_bbox": dts_bbox,
        "dts_segm": dts_segm,
        "stats_bbox": stats_bbox,
        "stats_segm": stats_segm,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(fixture, f)
    print(f"wrote {OUT}")
    print("bbox stats:", np.round(stats_bbox, 4))
    print("segm stats:", np.round(stats_segm, 4))


if __name__ == "__main__":
    main()
