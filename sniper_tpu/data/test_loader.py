"""Test-time batch iterator: full images or AutoFocus chips per scale.

Rebuild of MNIteratorTest + MNIteratorTestAutoFocus
(/root/reference/lib/iterators/MNIteratorTest.py:22-66,
MNIteratorTestAutoFocus.py:19-139) under XLA's static-shape rules:

- the reference pads to per-orientation canvases and, for AutoFocus
  chips, to per-batch dynamic maxima — a recompilation storm under jit.
  Here every scale has exactly TWO static canvases (landscape /
  portrait), rounded up to multiples of 64; batches are grouped by
  orientation, so the whole multi-scale run compiles at most
  2 * n_scales programs.
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


class TestChipIterator:
    """Yields batch dicts over all (image, chip) pairs at one scale."""

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

        # enumerate (im_id, chip_id, area, landscape?) and sort by area
        items = []
        for i, r in enumerate(roidb):
            s = scale_for_image(r["width"], r["height"], self.spec)
            for j, c in enumerate(r.get("inference_crops", [])):
                w = (c[2] - c[0]) * s
                h = (c[3] - c[1]) * s
                items.append((i, j, w * h, w >= h))
        items.sort(key=lambda t: -t[2])
        self.land = [t for t in items if t[3]]
        self.port = [t for t in items if not t[3]]

    def __len__(self):
        bs = self.batch_size
        return (len(self.land) + bs - 1) // bs + (len(self.port) + bs - 1) // bs

    def _emit(self, group, hw):
        bs = self.batch_size
        for start in range(0, len(group), bs):
            chunk = group[start : start + bs]
            n = len(chunk)
            data = np.zeros((bs, hw[0], hw[1], 3), np.float32)
            im_info = np.zeros((bs, 3), np.float32)
            im_scales = np.ones(bs, np.float32)
            im_ids = np.zeros(bs, int)
            chip_ids = np.zeros(bs, int)
            valid = np.zeros(bs, bool)
            for k, (i, j, _, _) in enumerate(chunk):
                r = self.roidb[i]
                chip = r["inference_crops"][j]
                s = scale_for_image(r["width"], r["height"], self.spec)
                im = self.image_loader(r["image"])
                img, out_h, out_w = process_chip_image_rect(
                    im, chip, s, hw, self.pixel_means,
                    flipped=r.get("flipped", False),
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
        yield from self._emit(self.land, self.land_hw)
        yield from self._emit(self.port, self.port_hw)
