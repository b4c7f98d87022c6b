"""Test-time batch iterator: full images or AutoFocus chips per scale.

Rebuild of MNIteratorTest + MNIteratorTestAutoFocus
(/root/reference/lib/iterators/MNIteratorTest.py:22-66,
MNIteratorTestAutoFocus.py:19-139) under XLA's static-shape rules:

- the reference pads to per-orientation canvases and, for AutoFocus
  chips, to per-batch dynamic maxima — a recompilation storm under jit.
  Here every scale has a BOUNDED ladder of static canvases: two
  orientations (landscape / portrait) x three size tiers (1, 1/2, 1/4
  of each canvas dim, rounded up to multiples of 64). Full-image
  iteration always lands in tier 1 — identical programs to a plain
  two-canvas design — while AutoFocus FocusChips bin to the smallest
  tier that holds them, so a small chip costs a quarter/sixteenth-area
  program instead of the full canvas (the TPU analog of the
  reference's dynamic per-batch padding). Only tiers that actually
  occur compile; batches group by (orientation, tier) and are emitted
  in ascending canvas area (required by this TPU worker's
  compile-order discipline).
- iterates (image, chip) pairs from roidb['inference_crops'] (chips
  sorted by area then grouped, like the reference, so similarly-sized
  chips batch together), crops + resizes via the shared chip image
  worker, emits batch dicts for Tester.get_detections.
"""

from __future__ import annotations

import numpy as np

from sniper_tpu.data.loader import load_image_cv2, process_chip_image_rect


def init_inference_crops(roidb):
    """Start AutoFocus/multi-scale inference from full-image crops."""
    for r in roidb:
        r["inference_crops"] = np.array(
            [[0.0, 0.0, r["width"], r["height"]]], np.float64
        )
    return roidb


def scale_for_image(width, height, spec):
    """(min_res, max_res) resize rule (MNIteratorTest.py:31-46)."""
    lo, hi = float(spec[0]), float(spec[1])
    mn, mx = float(min(width, height)), float(max(width, height))
    if lo > 0:
        s = lo / mn
        if hi > 0 and np.round(s * mx) > hi:
            s = hi / mx
    else:
        s = hi / mx
    return s


def canvas_for_scale(spec, round_to=64):
    """(landscape_hw, portrait_hw) static canvases for a scale spec."""
    lo, hi = int(spec[0]), int(spec[1])
    short = lo if lo > 0 else hi
    lng = hi if hi > 0 else lo

    def r(v):
        return (v + round_to - 1) // round_to * round_to

    return (r(short), r(lng)), (r(lng), r(short))


# canvas size tiers (fractions of each full-canvas dim). Chips bin to
# the smallest tier that holds them; full images always hit tier 1.0.
CANVAS_TIERS = (0.25, 0.5, 1.0)


def tier_canvases(full_hw, round_to=64):
    """Ascending list of static canvases for one orientation."""
    def r(v):
        return max(round_to, (int(v) + round_to - 1) // round_to * round_to)

    out = []
    for f in CANVAS_TIERS:
        hw = (r(full_hw[0] * f), r(full_hw[1] * f))
        if hw not in out:
            out.append(hw)
    return out


class TestChipIterator:
    """Yields batch dicts over all (image, chip) pairs at one scale."""

    # "Test" prefix = test-TIME iterator (reference MNIteratorTest
    # naming), not a pytest test class
    __test__ = False

    def __init__(self, roidb, cfg, scale_idx, batch_size,
                 image_loader=load_image_cv2, pixel_means=None):
        self.roidb = roidb
        self.cfg = cfg
        self.scale_idx = scale_idx
        self.batch_size = batch_size
        self.image_loader = image_loader
        self.spec = cfg.TEST.SCALES[scale_idx]
        self.pixel_means = (
            pixel_means if pixel_means is not None
            else cfg.network.PIXEL_MEANS
        )
        self.land_hw, self.port_hw = canvas_for_scale(self.spec)
        land_tiers = tier_canvases(self.land_hw)
        port_tiers = tier_canvases(self.port_hw)

        # enumerate (im_id, chip_id, area) and bin each chip into the
        # smallest (orientation, tier) canvas that holds it; groups are
        # emitted in ascending canvas area, largest chips first within
        def smallest_tier(tiers, h, w):
            for k, (th, tw) in enumerate(tiers):
                if h <= th and w <= tw:
                    return k
            return len(tiers) - 1  # oversize clamps like before

        groups = {}  # (is_land, tier_idx) -> [(i, j, area), ...]
        for i, r in enumerate(roidb):
            s = scale_for_image(r["width"], r["height"], self.spec)
            for j, c in enumerate(r.get("inference_crops", [])):
                # bin by the ACTUAL content extent: the crop truncates
                # fractional chip coords to ints (can widen the span by
                # up to 1 px vs c2-c0) and cv2 rounds the resize — ceil
                # of the int-span upper-bounds it, so a tier never clips
                # content (process_chip_image_rect semantics)
                x1 = max(int(c[0]), 0)
                y1 = max(int(c[1]), 0)
                x2 = min(int(c[2]), int(r["width"]))
                y2 = min(int(c[3]), int(r["height"]))
                w = float(np.ceil((x2 - x1) * s))
                h = float(np.ceil((y2 - y1) * s))
                land = w >= h
                tiers = land_tiers if land else port_tiers
                k = smallest_tier(tiers, h, w)
                groups.setdefault((land, k), []).append((i, j, w * h))
        for g in groups.values():
            g.sort(key=lambda t: -t[2])
        # [(canvas_hw, items)] ascending canvas area
        self.groups = sorted(
            (
                ((land_tiers if land else port_tiers)[k], items)
                for (land, k), items in groups.items()
            ),
            key=lambda t: t[0][0] * t[0][1],
        )

    def __len__(self):
        bs = self.batch_size
        return sum(
            (len(items) + bs - 1) // bs for _, items in self.groups
        )

    def _emit(self, group, hw):
        bs = self.batch_size
        for start in range(0, len(group), bs):
            chunk = group[start : start + bs]
            n = len(chunk)
            # uint8 canvases: 4x fewer host->device bytes; the forward
            # wrapper normalizes on device (infer.tester.device_normalize)
            data = np.zeros((bs, hw[0], hw[1], 3), np.uint8)
            im_info = np.zeros((bs, 3), np.float32)
            im_scales = np.ones(bs, np.float32)
            im_ids = np.zeros(bs, int)
            chip_ids = np.zeros(bs, int)
            valid = np.zeros(bs, bool)
            for k, (i, j, _) in enumerate(chunk):
                r = self.roidb[i]
                chip = r["inference_crops"][j]
                s = scale_for_image(r["width"], r["height"], self.spec)
                im = self.image_loader(r["image"])
                img, out_h, out_w = process_chip_image_rect(
                    im, chip, s, hw, self.pixel_means,
                    flipped=r.get("flipped", False), as_uint8=True,
                )
                data[k] = img
                im_info[k] = [out_h, out_w, s]
                im_scales[k] = s
                im_ids[k] = i
                chip_ids[k] = j
                valid[k] = True
            if n < bs:  # pad the batch; padded entries carry valid=False
                im_info[n:] = [hw[0], hw[1], 1.0]
            yield {
                "data": data, "im_info": im_info, "im_scales": im_scales,
                "im_ids": im_ids, "chip_ids": chip_ids, "valid": valid,
            }

    def __iter__(self):
        for hw, items in self.groups:
            yield from self._emit(items, hw)
