"""Periodic training-time prediction dumps (VisMetric equivalent).

The reference's debug VisMetric
(/root/reference/lib/train_utils/metric.py:347-368) pickles the
network's current predictions on training batches at a fixed cadence.
Here, behind the same TRAIN.VISUALIZE flag that renders GT-side chips
(data/loader.py), a ``PredictionDumper`` runs the model's TEST branch
(which denormalizes BBOX_STDS in-graph, models/detector.py:286) on the
first chip of the current host batch, decodes boxes on host, and
writes

- ``preds_step{N}.pkl``: {step, per-class [M,5] detections, raw rois /
  cls_prob / bbox_pred} — the reference's pkl payload, and
- ``preds_step{N}.jpg``: the chip with its predictions drawn (GT-side
  rendering is the loader's chip_e*_s*.jpg next to it).

The test-mode forward is one extra jit compiled lazily on first use —
debug-only cost, never paid unless TRAIN.VISUALIZE is on.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


class PredictionDumper:
    def __init__(self, model, cfg):
        self.model = model
        self.cfg = cfg
        # same base as the loader's GT-side chip rendering
        # (data/loader.py vis_path — TRAIN.visualization_path, resolved
        # from the cwd like the reference's debug/visualization), so the
        # paired GT-vs-prediction artifacts land in one tree
        self.dir = os.path.join(str(cfg.TRAIN.visualization_path), "preds")
        self.freq = max(int(cfg.TRAIN.visualization_freq or 100), 1)
        self._fwd = None

    def _forward(self):
        if self._fwd is None:
            import jax

            from sniper_tpu.infer.tester import (
                device_normalize,
                pack_detections,
            )

            means = tuple(float(m) for m in self.cfg.network.PIXEL_MEANS)
            model = self.model

            @jax.jit
            def fwd(variables, data, im_info, extent):
                if data.dtype == np.uint8:
                    data = device_normalize(data, extent, means)
                return pack_detections(
                    model.apply(variables, data, im_info, train=False)
                )

            self._fwd = fwd
        return self._fwd

    def maybe_dump(self, state, host_batch, step: int,
                   batch_seq: int | None = None):
        """Dump iff ``step`` is on the cadence. Returns the pkl path or
        None. ``host_batch`` is the raw (pre-shard) loader batch;
        ``batch_seq`` is that batch's own loader sequence index — it can
        trail ``step`` by up to prefetch depth, and the pkl records both
        so the artifact never claims an alignment that isn't there."""
        if step % self.freq:
            return None
        import jax

        from sniper_tpu.infer.tester import unpack_detections
        from sniper_tpu.ops.boxes import bbox_pred as decode
        from sniper_tpu.ops.boxes import clip_boxes
        from sniper_tpu.utils.visualization import draw_detections

        data = np.asarray(host_batch["data"][:1])
        im_info = np.asarray(host_batch["im_info"][:1], np.float32)
        extent = np.asarray(
            host_batch.get(
                "data_extent", np.asarray(im_info[:, :2], np.float32)
            )[:1],
            np.float32,
        )
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if len(jax.devices()) > 1:
            # on a multi-device mesh the train state is sharded by the
            # partitioned step; this debug forward is a plain jit, so
            # pull the (replicated-or-sharded) variables to host first —
            # debug-only cost, paid once per cadence
            variables = jax.device_get(variables)
        out = np.asarray(self._forward()(variables, data, im_info, extent))
        d = unpack_detections(out, self.model.num_classes)
        # drop padded roi slots (the test branch pads rois to
        # post_nms_top_n; their garbage scores would draw phantom boxes)
        valid = np.asarray(d["roi_valid"][0])
        rois = d["rois"][0][valid]
        probs = d["cls_prob"][0][valid]
        deltas = d["bbox_pred"][0][valid]
        boxes = decode(rois[:, 1:], deltas)
        boxes = clip_boxes(boxes, im_info[0][:2])

        per_class = [np.zeros((0, 5), np.float32)]
        for c in range(1, self.model.num_classes):
            keep = probs[:, c] > 0.05
            per_class.append(
                np.hstack([boxes[keep], probs[keep, c : c + 1]]).astype(
                    np.float32
                )
            )

        os.makedirs(self.dir, exist_ok=True)
        pkl = os.path.join(self.dir, f"preds_step{step}.pkl")
        with open(pkl, "wb") as f:
            pickle.dump(
                {
                    "step": step,
                    # loader sequence index of THIS batch (may trail
                    # `step` by prefetch depth; see docstring)
                    "batch_seq": batch_seq,
                    "dets": per_class,
                    "rois": rois,
                    "cls_prob": probs,
                    "bbox_pred": deltas,
                },
                f,
            )
        # rendered chip: uint8 batches are already RGB
        import cv2

        im = data[0]
        if im.dtype != np.uint8:
            im = np.clip(
                im + np.asarray(self.cfg.network.PIXEL_MEANS,
                                np.float32)[::-1],
                0, 255,
            ).astype(np.uint8)
        drawn = draw_detections(im, per_class, threshold=0.1)
        cv2.imwrite(os.path.join(self.dir, f"preds_step{step}.jpg"),
                    cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
        return pkl
