"""Quantify the deformable-pooling sub-cell approximation on the TPU.

Two measurements, closing the last unquantified reference-semantics
deviation (ARCHITECTURE "Known deviations"):

1. op-level: deformable_psroi_pool_fast (shipped stencil/einsum path)
   vs ops.deform.deformable_psroi_pool — the EXACT per-sample bilinear
   contract of the reference fork's CUDA kernel
   (/root/reference/symbols/faster/resnet_mx_101_e2e.py:286-293) — at
   trained offset magnitudes (|off|<=0.32, overfit-checkpoint
   telemetry) and near the margin-1 clamp (|off|=1.4 vs clamp 1.43),
   on smoothed (C5-like) and raw-noise features.
2. end-to-end: bbox AP of a TRAINED checkpoint (the learned-AutoFocus
   run's epoch-40 resnet-50, scripts/run_autofocus_learned_tpu.py)
   evaluated through main_test twice — shipped fast head vs an exact-
   pooling head (same params, reference two-pass composition over
   deformable_psroi_pool) — plus the max |offset| the trained
   offset-FC actually emits on this data.

  python scripts/profile_pool_approx.py [workdir]

workdir defaults to /tmp/af_learned2 (regenerate it with
scripts/run_autofocus_learned_tpu.py /tmp/af_learned2 if absent).
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P, S = 7, 4


def op_level():
    import cv2

    from sniper_tpu.ops.deform import (
        deformable_psroi_pool,
        deformable_psroi_pool_fast,
    )

    H = W = 38
    C, R = 16, 24
    out = {}
    rng0 = np.random.RandomState(1)
    for smooth in (True, False):
        feat = rng0.randn(2, H, W, C).astype(np.float32)
        if smooth:
            for b in range(2):
                feat[b] = cv2.GaussianBlur(feat[b], (5, 5), 1.2)
        rois = np.zeros((R, 5), np.float32)
        rois[:, 0] = rng0.randint(0, 2, R)
        x1 = rng0.uniform(0, 200, R)
        y1 = rng0.uniform(0, 200, R)
        rois[:, 1], rois[:, 2] = x1, y1
        rois[:, 3] = np.minimum(x1 + rng0.uniform(48, 400, R), 16 * W - 2)
        rois[:, 4] = np.minimum(y1 + rng0.uniform(48, 400, R), 16 * H - 2)
        for mag in (0.32, 1.4):
            trans = np.random.RandomState(2).uniform(
                -mag, mag, (R, P, P, 2)).astype(np.float32)
            a = np.asarray(deformable_psroi_pool_fast(
                feat, rois, trans, pooled_size=P, sample_per_part=S,
                margin_bins=1))
            b = np.asarray(deformable_psroi_pool(
                feat, rois, trans, pooled_size=P, sample_per_part=S))
            key = f"{'smooth' if smooth else 'noise'}_mag{mag}"
            out[key] = {
                "max_rel": round(float(
                    np.abs(a - b).max() / np.abs(b).max()), 4),
                "mean_abs_over_rms": round(float(
                    np.abs(a - b).mean() / np.sqrt((b ** 2).mean())), 4),
            }
            print(f"op {key}: {out[key]}", flush=True)
    return out


def make_exact_head():
    """rcnn_head_fused-compatible wrapper computing the head through
    the EXACT per-sample bilinear pool (reference two-pass
    composition), reusing the same packed params. Also records the max
    |offset| the trained offset-FC emits."""
    import jax.numpy as jnp
    from flax import linen as nn

    from sniper_tpu.ops.deform import deformable_psroi_pool

    seen = {"max_off": 0.0}

    def exact_head(feat, rois, params, *, rois_per_image=None,
                   pooled_size=7, spatial_scale=0.0625,
                   offset_grad_mult=0.01, margin_bins=1, roi_chunk=16,
                   extract=None, return_offset_stats=False):
        (off_k, off_b, fc1k, fc1b, fc2k, fc2b, ck, cb, bk, bb) = params
        Pp = pooled_size
        t0 = deformable_psroi_pool(
            feat, rois, None, pooled_size=Pp, spatial_scale=spatial_scale)
        off = t0.reshape(rois.shape[0], -1) @ off_k + off_b
        # (no in-graph |off| capture: axon_pjrt rejects host callbacks;
        # the checkpoint's trained magnitude comes from its own training
        # logs' offset telemetry instead — see ap_delta)
        trans = off.reshape(-1, 2, Pp, Pp).transpose(0, 2, 3, 1)
        pooled = deformable_psroi_pool(
            feat, rois, trans, pooled_size=Pp,
            spatial_scale=spatial_scale)
        h = pooled.reshape(rois.shape[0], -1)
        h = nn.relu(h @ fc1k + fc1b)
        h = nn.relu(h @ fc2k + fc2b)
        cls_score = h @ ck + cb
        bbox_pred = h @ bk + bb
        if return_offset_stats:
            return cls_score, bbox_pred, off
        return cls_score, bbox_pred

    return exact_head, seen


def ap_delta(workdir, cfg_name="autofocus_learned.yml", extra_set=()):
    """fast-vs-exact AP on any trained workdir. cfg_name selects the
    yml (default: the learned-AutoFocus run; pass
    minicoco_campaign.yml + TRAIN.AUTO_FOCUS True for the 300-image
    campaign checkpoint)."""
    cfg_path = os.path.join(workdir, cfg_name)
    ckpts = glob.glob(os.path.join(workdir, "output", "**",
                                   "checkpoints", "*"), recursive=True)
    if not (os.path.exists(cfg_path) and ckpts):
        print(f"no trained checkpoint under {workdir}; run "
              "scripts/run_autofocus_learned_tpu.py (or the minicoco "
              "campaign) first", flush=True)
        return {}

    import main_test
    from sniper_tpu.models import heads

    stats = {}
    orig_det = main_test.run_detection

    def run_once(tag):
        old_argv = sys.argv
        # full pyramid, no caches — isolate the pooling backend
        n_scales = 2
        from sniper_tpu.config import load_config as _lc

        n_scales = len(_lc(cfg_path).TEST.SCALES)
        sys.argv = ["main_test.py", "--cfg", cfg_path, "--set",
                    "TEST.AUTO_FOCUS", "False",
                    "TEST.DO_PRUNING", str([False] * n_scales),
                    "TEST.USE_CACHE", str([False] * n_scales),
                    *extra_set]
        got = {}

        def det(*a, **kw):
            got["stats"] = orig_det(*a, **kw)
            return got["stats"]

        main_test.run_detection = det
        try:
            main_test.main()
        finally:
            main_test.run_detection = orig_det
            sys.argv = old_argv
        stats[tag] = got["stats"]
        print(f"{tag}: {got['stats']}", flush=True)

    run_once("fast")
    exact_head, seen = make_exact_head()
    orig_fused = heads.rcnn_head_fused
    heads.rcnn_head_fused = exact_head
    try:
        run_once("exact")
    finally:
        heads.rcnn_head_fused = orig_fused
    # trained offset magnitude: the checkpoint's own epoch-end
    # telemetry (main_train logs "offset telemetry max |trans|=...")
    import re

    mx = 0.0
    for lg in glob.glob(os.path.join(workdir, "output", "**", "*.log"),
                        recursive=True):
        for line in open(lg, errors="ignore"):
            m = re.search(r"offset telemetry max \|trans\|=([0-9.]+)",
                          line)
            if m:
                mx = max(mx, float(m.group(1)))
    stats["trained_max_off_from_logs"] = mx
    print(f"trained offset telemetry max |trans| (training logs): "
          f"{mx:.3f} (clamp {1 / (0.1 * P):.2f})", flush=True)
    return stats


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/af_learned2"
    cfg_name = sys.argv[2] if len(sys.argv) > 2 else "autofocus_learned.yml"
    extra = tuple(sys.argv[3:])
    results = {"op": op_level(),
               "e2e": ap_delta(workdir, cfg_name, extra)}
    print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()
