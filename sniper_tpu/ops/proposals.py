"""Fused RPN proposal ops — TPU-native equivalents of the reference
MXNet-fork CUDA ops ``MultiProposal`` and ``MultiProposalTarget``
(call sites: /root/reference/symbols/faster/resnet_mx_101_e2e.py:283-284,
347-355; contract documented in SURVEY.md §2.9).

Everything is static-shape and jittable; batching is ``jax.vmap`` over
images. Inputs use the framework's device layout:
- ``fg_probs  [A, H, W]``  — RPN objectness (foreground prob per anchor),
- ``deltas    [4A, H, W]`` — box regression, 4 consecutive channels per
  anchor (conv channel c = a*4 + k),
- anchors are baked in as a constant in the same (A, H, W) order.

multi_proposal:        decode → clip → min-size filter → top-k → NMS →
                       fixed ``post_nms_top_n`` rois per image.
multi_proposal_target: the same proposal path fused with R-CNN target
                       sampling: GT boxes are appended as candidate rois,
                       labels come from IoU matching, and SNIPER's
                       per-chip ``valid_ranges`` turn proposals matched
                       to out-of-range GTs into ignore (-1) labels — the
                       point where scale-validity reaches the loss.
                       Regression targets are normalized by BBOX_STDS
                       (BBOX_NORMALIZATION_PRECOMPUTED), so inference
                       must multiply predictions back by the stds.

Sampling detail: the fork op's exact internal sampling is not vendored in
the reference checkout (empty submodule); we use the standard
Faster-R-CNN stratified sampler (fg capped at FG_FRACTION, bg fill,
leftover slots ignored) with an explicit PRNG key, which reproduces the
documented interface (300 rois/img, -1 ignore semantics, ~47 fg/img
average that the reference's 188 = 4*47 bbox normalizer implies).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sniper_tpu.ops.anchors import generate_anchors, shift_anchors
from sniper_tpu.ops.boxes import bbox_pred, bbox_transform, clip_boxes
from sniper_tpu.ops.nms import NEG_INF, nms_jax


def make_anchors_ahw(feat_h: int, feat_w: int, feat_stride: int,
                     ratios, scales) -> np.ndarray:
    """Anchor grid in (A, H, W)-flattened order, matching conv channels."""
    base = generate_anchors(feat_stride, list(ratios), list(scales))
    a_khw = shift_anchors(base, feat_h, feat_w, feat_stride)  # [K*A,4] pos-major
    A = base.shape[0]
    k = feat_h * feat_w
    return (
        a_khw.reshape(k, A, 4).transpose(1, 0, 2).reshape(A * k, 4).astype(np.float32)
    )


def anchors_ahw_on_device(feat_h: int, feat_w: int, feat_stride: int,
                          ratios, scales) -> jax.Array:
    """Same grid as make_anchors_ahw, built in-graph from iota.

    Baking the dense grid as an HLO constant costs A*H*W*4 floats per
    compiled program (multi-MB at test canvases — it overflowed the
    remote-compile transport); only the tiny [A,4] base anchor table is
    a constant here, the shifts come from broadcasted_iota.
    """
    base = jnp.asarray(
        generate_anchors(feat_stride, list(ratios), list(scales)),
        jnp.float32,
    )  # [A,4]
    A = base.shape[0]
    sy = jax.lax.broadcasted_iota(jnp.float32, (feat_h, feat_w), 0) * feat_stride
    sx = jax.lax.broadcasted_iota(jnp.float32, (feat_h, feat_w), 1) * feat_stride
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # [H,W,4]
    grid = base[:, None, None, :] + shifts[None]  # [A,H,W,4]
    return grid.reshape(A * feat_h * feat_w, 4)


def _decode_single(fg_probs, deltas, im_info, anchors, min_size):
    """Decode one image's RPN output into scored proposals [N,4],[N]."""
    A4 = deltas.shape[0]
    h, w = deltas.shape[1], deltas.shape[2]
    n_anchor = A4 // 4
    scores = fg_probs.reshape(-1)  # (A,H,W) flat
    d = deltas.reshape(n_anchor, 4, h, w).transpose(0, 2, 3, 1).reshape(-1, 4)
    props = bbox_pred(anchors, d)
    props = clip_boxes(props, (im_info[0], im_info[1]))
    ws = props[:, 2] - props[:, 0] + 1.0
    hs = props[:, 3] - props[:, 1] + 1.0
    ms = min_size * im_info[2]
    ok = (ws >= ms) & (hs >= ms)
    scores = jnp.where(ok, scores, NEG_INF)
    return props, scores


def _proposal_single(fg_probs, deltas, im_info, anchors, pre_nms, post_nms,
                     thresh, min_size):
    props, scores = _decode_single(fg_probs, deltas, im_info, anchors, min_size)
    k = min(pre_nms, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_props = props[top_idx]
    keep, valid = nms_jax(top_props, top_scores, post_nms, thresh)
    safe = jnp.maximum(keep, 0)
    rois = jnp.where(valid[:, None], top_props[safe], 0.0)
    roi_scores = jnp.where(valid, top_scores[safe], 0.0)
    return rois, roi_scores, valid


@partial(jax.jit, static_argnames=("pre_nms", "post_nms", "thresh", "min_size"))
def multi_proposal(fg_probs, deltas, im_info, anchors, *, pre_nms=6000,
                   post_nms=300, thresh=0.7, min_size=0.0):
    """Batched proposal generation.

    fg_probs [B,A,H,W], deltas [B,4A,H,W], im_info [B,3] (h, w, scale).
    Returns rois [B, post_nms, 5] (batch idx + xyxy), scores
    [B, post_nms], valid [B, post_nms] bool.
    """
    f = partial(_proposal_single, anchors=anchors, pre_nms=pre_nms,
                post_nms=post_nms, thresh=thresh, min_size=min_size)
    rois, scores, valid = jax.vmap(f)(fg_probs, deltas, im_info)
    b = rois.shape[0]
    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=rois.dtype)[:, None, None], (b, rois.shape[1], 1)
    )
    return jnp.concatenate([batch_idx, rois], axis=-1), scores, valid


class ProposalTargets(NamedTuple):
    rois: jax.Array          # [B, R, 5] (batch idx + xyxy)
    labels: jax.Array        # [B, R] int32, -1 ignore / 0 bg / class id fg
    bbox_targets: jax.Array  # [B, R, 4] std-normalized deltas
    bbox_weights: jax.Array  # [B, R, 4] 1.0 at fg rois
    matched_gt: jax.Array    # [B, R] int32 gt index of fg rois, -1 else


def _sample_rois_single(
    props, prop_scores, prop_valid, gt_boxes, valid_range, key,
    *, num_rois, fg_fraction, fg_thresh, bg_thresh_hi, bg_thresh_lo,
    bbox_stds, bbox_means,
):
    """Label + sample candidate rois for one image (static shapes).

    Candidates = NMS proposals + GT boxes (standard Faster-R-CNN trick so
    fg examples exist early in training). Out-of-valid-range GTs still
    participate in matching but force label -1 on whatever matches them.
    """
    gt = gt_boxes[:, :4]
    gt_cls = gt_boxes[:, 4]
    gt_valid = gt_cls >= 0  # -1 padded rows

    # GT size validity in chip-scaled pixels (reference srange semantics)
    gt_area = jnp.sqrt(
        jnp.maximum(gt[:, 2] - gt[:, 0], 0.0) * jnp.maximum(gt[:, 3] - gt[:, 1], 0.0)
    )
    gt_in_range = (gt_area >= valid_range[0]) & (gt_area <= valid_range[1])

    cand = jnp.concatenate([props, gt], axis=0)  # [P+G, 4]
    cand_is_gt = jnp.concatenate(
        [jnp.zeros(props.shape[0], bool), gt_valid], axis=0
    )
    cand_live = jnp.concatenate([prop_valid, gt_valid & gt_in_range], axis=0)

    # IoU against valid GTs only
    iw = (
        jnp.minimum(cand[:, None, 2], gt[None, :, 2])
        - jnp.maximum(cand[:, None, 0], gt[None, :, 0]) + 1.0
    )
    ih = (
        jnp.minimum(cand[:, None, 3], gt[None, :, 3])
        - jnp.maximum(cand[:, None, 1], gt[None, :, 1]) + 1.0
    )
    inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
    area_c = (cand[:, 2] - cand[:, 0] + 1) * (cand[:, 3] - cand[:, 1] + 1)
    area_g = (gt[:, 2] - gt[:, 0] + 1) * (gt[:, 3] - gt[:, 1] + 1)
    iou = inter / (area_c[:, None] + area_g[None, :] - inter)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)

    max_iou = iou.max(axis=1)
    argmax_gt = iou.argmax(axis=1)
    matched_cls = gt_cls[argmax_gt]
    matched_in_range = gt_in_range[argmax_gt]

    is_fg = (max_iou >= fg_thresh) & cand_live & matched_in_range
    # anchors/proposals leaning on out-of-range GTs are poisoned: neither
    # fg nor bg (mirrors the RPN-side invalid-GT 0.3 rule)
    iou_invalid = jnp.where(
        (gt_valid & ~gt_in_range)[None, :], iou, 0.0
    ).max(axis=1)
    is_bg = (
        (max_iou < bg_thresh_hi) & (max_iou >= bg_thresh_lo)
        & cand_live & ~cand_is_gt & (iou_invalid <= 0.3)
    )

    n_cand = cand.shape[0]
    kf, kb = jax.random.split(key)
    # random priorities; invalid mass pushed to the bottom
    fg_pri = jnp.where(is_fg, jax.random.uniform(kf, (n_cand,)), -1.0)
    bg_pri = jnp.where(is_bg, jax.random.uniform(kb, (n_cand,)), -1.0)

    max_fg = int(np.round(num_rois * fg_fraction))
    fg_p, fg_idx = jax.lax.top_k(fg_pri, max_fg)
    fg_take = fg_p > 0
    n_fg = fg_take.sum()

    bg_p, bg_idx = jax.lax.top_k(bg_pri, num_rois)
    bg_rank = jnp.arange(num_rois)
    bg_take = (bg_p > 0) & (bg_rank < (num_rois - n_fg))

    # compose output slots: fg first, then bg, leftovers = ignore
    sel_idx = jnp.concatenate([fg_idx, bg_idx])[:num_rois + max_fg]
    sel_take = jnp.concatenate([fg_take, bg_take])[:num_rois + max_fg]
    sel_is_fg = jnp.concatenate(
        [jnp.ones(max_fg, bool), jnp.zeros(num_rois, bool)]
    )[:num_rois + max_fg]
    # compact the taken slots to the front
    order = jnp.argsort(~sel_take)  # stable: taken first, fg before bg
    sel_idx = sel_idx[order][:num_rois]
    sel_take = sel_take[order][:num_rois]
    sel_is_fg = sel_is_fg[order][:num_rois]

    rois = cand[sel_idx]
    labels = jnp.where(
        sel_take,
        jnp.where(sel_is_fg, matched_cls[sel_idx].astype(jnp.int32), 0),
        -1,
    )

    tgt = bbox_transform(rois, gt[argmax_gt[sel_idx]])
    tgt = (tgt - jnp.asarray(bbox_means)) / jnp.asarray(bbox_stds)
    w = (sel_is_fg & sel_take).astype(jnp.float32)[:, None] * jnp.ones((1, 4))
    tgt = tgt * w  # zero out non-fg targets
    matched_gt = jnp.where(sel_take & sel_is_fg, argmax_gt[sel_idx], -1)
    return rois, labels, tgt, w, matched_gt


@partial(
    jax.jit,
    static_argnames=(
        "pre_nms", "post_nms", "thresh", "min_size", "num_rois",
        "fg_fraction", "fg_thresh", "bg_thresh_hi", "bg_thresh_lo",
        "bbox_stds", "bbox_means",
    ),
)
def multi_proposal_target(
    fg_probs, deltas, im_info, gt_boxes, valid_ranges, anchors, key,
    *, pre_nms=6000, post_nms=300, thresh=0.7, min_size=0.0, num_rois=300,
    fg_fraction=0.25, fg_thresh=0.5, bg_thresh_hi=0.5, bg_thresh_lo=0.0,
    bbox_stds=(0.1, 0.1, 0.2, 0.2), bbox_means=(0.0, 0.0, 0.0, 0.0),
):
    """Fused proposal + R-CNN target op (train-time).

    fg_probs [B,A,H,W], deltas [B,4A,H,W], im_info [B,3],
    gt_boxes [B,G,5] (-1 padded, class in col 4), valid_ranges [B,2]
    (chip-scaled sqrt-area bounds). RPN gradients are stopped through the
    proposal path (the reference computes proposals from the *output* of
    SoftmaxOutput, which doesn't backprop through the target op either).
    """
    fg_probs = jax.lax.stop_gradient(fg_probs)
    deltas_sg = jax.lax.stop_gradient(deltas)

    prop_fn = partial(
        _proposal_single, anchors=anchors, pre_nms=pre_nms, post_nms=post_nms,
        thresh=thresh, min_size=min_size,
    )
    props, scores, valid = jax.vmap(prop_fn)(fg_probs, deltas_sg, im_info)

    b = props.shape[0]
    keys = jax.random.split(key, b)
    sample_fn = partial(
        _sample_rois_single, num_rois=num_rois, fg_fraction=fg_fraction,
        fg_thresh=fg_thresh, bg_thresh_hi=bg_thresh_hi,
        bg_thresh_lo=bg_thresh_lo, bbox_stds=bbox_stds, bbox_means=bbox_means,
    )
    rois, labels, tgts, ws, matched = jax.vmap(sample_fn)(
        props, scores, valid, gt_boxes, valid_ranges, keys
    )
    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=rois.dtype)[:, None, None], (b, num_rois, 1)
    )
    rois = jnp.concatenate([batch_idx, rois], axis=-1)
    return ProposalTargets(rois, labels, tgts, ws, matched)
