"""Chip pipeline tests: candidate enumeration, greedy cover (py + C++),
scale computation, extraction, box assignment, negative mining."""

import numpy as np
import pytest

from sniper_tpu.chips import _native
from sniper_tpu.chips.assigner import assign_boxes, extract_chips
from sniper_tpu.chips.generator import (
    ChipGenerator,
    compute_im_scales,
    enumerate_candidate_chips,
    greedy_cover,
)
from sniper_tpu.ops.boxes import ignore_overlaps


def candidates_oracle(width, height, chipsize, stride):
    """Literal transliteration of the reference candidate enumeration."""
    chips = []
    chips.append([max(width - chipsize, 0), 0, width - 1, min(chipsize, height - 1)])
    chips.append([0, max(height - chipsize, 0), min(chipsize, width - 1), height - 1])
    chips.append(
        [max(width - chipsize, 0), max(height - chipsize, 0), width - 1, height - 1]
    )
    for i in range(0, width - int(chipsize), stride):
        for j in range(0, height - int(chipsize), stride):
            chips.append([i, j, i + chipsize - 1, j + chipsize - 1])
    for j in range(0, height - int(chipsize), stride):
        chips.append([max(width - chipsize - 1, 0), j, width - 1, j + chipsize - 1])
    for i in range(0, width - int(chipsize), stride):
        chips.append([i, max(height - chipsize - 1, 0), i + chipsize - 1, height - 1])
    return np.array(chips, dtype=np.float64)


@pytest.mark.parametrize(
    "w,h,cs,stride", [(1024, 768, 512, 57), (400, 300, 512, 57), (513, 512, 512, 32)]
)
def test_candidate_enumeration_matches_oracle(w, h, cs, stride):
    got = enumerate_candidate_chips(w, h, cs, stride)
    want = candidates_oracle(w, h, cs, stride)
    np.testing.assert_array_equal(got, want)


def greedy_cover_oracle(contain):
    """Literal set-based greedy cover like the reference (_pygenerate)."""
    chip_matches = [set(np.where(contain[j])[0].tolist()) for j in range(len(contain))]
    num_matches = [len(s) for s in chip_matches]
    picked = []
    while True:
        if max(num_matches) == 0:
            break
        mid = int(np.argmax(np.array(num_matches)))
        best = chip_matches[mid]
        picked.append(mid)
        for j in range(len(num_matches)):
            chip_matches[j] = chip_matches[j] - best
            num_matches[j] = len(chip_matches[j])
    return picked


def test_greedy_cover_matches_oracle(rng):
    for _ in range(10):
        contain = rng.rand(30, 50) > 0.8
        assert greedy_cover(contain) == greedy_cover_oracle(contain)


def test_cpp_cover_matches_python(rng):
    cpp = _native.load()
    assert cpp is not None, "native lib not built (scripts/build_native.sh)"
    for _ in range(10):
        cands = np.sort(rng.uniform(0, 500, (40, 4)), axis=1)[:, [0, 2, 1, 3]]
        # make candidates reasonably large so some contain boxes
        cands[:, 2] += 200
        cands[:, 3] += 200
        x1 = rng.uniform(0, 500, 70)
        y1 = rng.uniform(0, 500, 70)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(5, 100, 70), y1 + rng.uniform(5, 100, 70)], 1
        )
        contain = ignore_overlaps(cands, boxes) == 1.0
        assert cpp.greedy_cover(cands, boxes) == greedy_cover(contain)


def test_generate_covers_all_coverable(rng):
    gen = ChipGenerator(chip_stride=57, rng=np.random.RandomState(1))
    # boxes strictly smaller than chipsize are always coverable
    x1 = rng.uniform(0, 700, 40)
    y1 = rng.uniform(0, 500, 40)
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(5, 300, 40), y1 + rng.uniform(5, 300, 40)], 1
    )
    chips = gen.generate(boxes, 1024, 768, 512)
    assert len(chips) >= 1
    from sniper_tpu.ops.boxes import clip_boxes

    clipped = clip_boxes(boxes, np.array([768 - 1, 1024 - 1]))
    cov = ignore_overlaps(np.array(chips), clipped)
    assert (cov.max(axis=0) == 1.0).all(), "every box covered by some chip"


def test_generate_empty_boxes():
    gen = ChipGenerator(chip_stride=57, rng=np.random.RandomState(0))
    assert gen.generate(np.zeros((0, 4)), 800, 600, 512) == []


def test_cpp_generator_end_to_end_parity(rng):
    boxes = np.stack(
        [
            rng.uniform(0, 600, 30),
            rng.uniform(0, 400, 30),
            rng.uniform(610, 900, 30),
            rng.uniform(410, 700, 30),
        ],
        1,
    )
    a = ChipGenerator(chip_stride=57, use_cpp=False, rng=np.random.RandomState(7))
    b = ChipGenerator(chip_stride=57, use_cpp=True, rng=np.random.RandomState(7))
    ca = a.generate(boxes, 1200, 900, 512)
    cb = b.generate(boxes, 1200, 900, 512)
    np.testing.assert_array_equal(np.array(ca), np.array(cb))


def test_compute_im_scales_res_based():
    scales = [(1400, 2000), (800, 1280), (-1, 512)]
    s = compute_im_scales(640, 480, scales)
    # shortest side 480 -> 1400 gives 2.9167; 640*2.9167=1866 <= 2000 ok
    assert s[0] == pytest.approx(1400 / 480)
    # 800/480 = 1.667; 640*1.667 = 1066 <= 1280 ok
    assert s[1] == pytest.approx(800 / 480)
    # min -1 -> max-side rule: 512/640
    assert s[2] == pytest.approx(512 / 640)


def test_compute_im_scales_res_capped():
    # wide image where the max-side cap kicks in
    s = compute_im_scales(4000, 500, [(1400, 2000)])
    assert s[0] == pytest.approx(2000 / 4000)


def test_compute_im_scales_factor_based():
    s = compute_im_scales(1000, 600, [3.0, 1.667, 512.0])
    assert s == [3.0, 1.667, pytest.approx(512.0 / 1000)]


def _make_record(rng, width=1000, height=800, n_gt=12, n_props=0):
    """Synthetic roidb record: GTs (max_overlaps 1) + optional proposals."""
    sizes = np.concatenate(
        [
            rng.uniform(8, 60, n_gt // 3),  # small
            rng.uniform(60, 140, n_gt // 3),  # medium
            rng.uniform(140, 400, n_gt - 2 * (n_gt // 3)),  # large
        ]
    )
    x1 = rng.uniform(0, width - 410, n_gt)
    y1 = rng.uniform(0, height - 410, n_gt)
    gt = np.stack([x1, y1, x1 + sizes, y1 + sizes], 1)
    boxes = gt
    max_ov = np.ones(n_gt)
    if n_props:
        px = rng.uniform(0, width - 80, n_props)
        py = rng.uniform(0, height - 80, n_props)
        props = np.stack(
            [px, py, px + rng.uniform(10, 70, n_props), py + rng.uniform(10, 70, n_props)], 1
        )
        boxes = np.vstack([gt, props])
        max_ov = np.concatenate([max_ov, np.full(n_props, 0.1)])
    return {
        "width": width,
        "height": height,
        "boxes": boxes.astype(np.float32),
        "max_overlaps": max_ov,
    }


SCALES = [(1400, 2000), (800, 1280), (-1, 512)]
RANGES = [(-1, 80), (32, 150), (120, -1)]


def test_extract_chips_structure(rng):
    r = _make_record(rng)
    gen = ChipGenerator(chip_stride=57, rng=np.random.RandomState(3))
    chips = extract_chips(r, SCALES, RANGES, 512, gen)
    assert len(chips) > 0
    scales_seen = {c.scale_idx for c in chips}
    assert scales_seen <= {0, 1, 2}
    for c in chips:
        if c.scale_idx != 2:
            assert c.out_h == 512 and c.out_w == 512
        else:
            im_scales = compute_im_scales(r["width"], r["height"], SCALES)
            assert c.out_h == int(r["height"] * im_scales[2])
            assert c.out_w == int(r["width"] * im_scales[2])


def test_assign_boxes_covers_valid_gts(rng):
    r = _make_record(rng)
    gen = ChipGenerator(chip_stride=57, rng=np.random.RandomState(3))
    r["crops"] = extract_chips(r, SCALES, RANGES, 512, gen)
    props, negs, negp = assign_boxes(r, SCALES, RANGES, 512, gen, use_neg_chips=False)
    assert len(props) == len(r["crops"])
    assigned = np.concatenate([p for p in props if len(p)]) if any(len(p) for p in props) else []
    # every GT should land in at least one chip (GT-derived chips cover them)
    assert len(set(assigned.tolist())) >= r["boxes"].shape[0] * 0.9
    assert negs == [] and negp == []


def test_neg_chip_mining(rng):
    # many proposals far from GTs -> uncovered -> neg chips
    r = _make_record(rng, n_gt=3, n_props=200)
    gen = ChipGenerator(chip_stride=57, rng=np.random.RandomState(3))
    r["crops"] = extract_chips(r, SCALES, RANGES, 512, gen)
    props, negs, negp = assign_boxes(r, SCALES, RANGES, 512, gen, use_neg_chips=True)
    assert len(negs) == len(negp)
    assert len(negs) > 0, "200 stray proposals must mine at least one neg chip"
    for chip, ids in zip(negs, negp):
        assert len(ids) > 10
        assert chip.scale_idx in (0, 1, 2)
    assert "neg_chips" in r and "neg_props_in_chips" in r
