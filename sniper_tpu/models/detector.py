"""The assembled SNIPER detector: trunk + RPN + fused proposal ops + heads.

One flax module whose ``__call__`` covers both modes of the reference
symbols (resnet_mx_101_e2e.get_symbol_rcnn train/test,
/root/reference/symbols/faster/resnet_mx_101_e2e.py:227-389):

train:  trunk -> C4||C5 -> RPN -> multi_proposal_target (fused decode/
        NMS/sampling with SNIPER valid_ranges) -> deformable-ROI head ->
        logits; returns everything the loss needs.
infer:  trunk -> RPN -> multi_proposal -> head -> per-roi class probs +
        class-agnostic deltas (+ FocusPixel probs for AutoFocus).

Everything lives in a single jitted apply; the proposal ops are plain
functions (no params) so the module stays a pytree of parameters only.
Anchor grids are baked as compile-time constants from static shapes.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sniper_tpu.models.heads import AutoFocusHead, RCNNHead, RPNHead
from sniper_tpu.models.resnet import ResNetTrunk
from sniper_tpu.ops.proposals import (
    anchors_ahw_on_device,
    multi_proposal,
    multi_proposal_target,
)


class SNIPERDetector(nn.Module):
    num_classes: int = 81
    num_anchors: int = 21
    anchor_ratios: Sequence[float] = (0.5, 1, 2)
    anchor_scales: Sequence[float] = (2, 4, 7, 10, 13, 16, 24)
    feat_stride: int = 16
    trunk_type: str = "resnet"  # 'resnet' | 'resnext' | 'mobilenetv2'
    units: Sequence[int] = (3, 4, 23, 3)
    head_fc_dim: int = 1024
    num_trunk_groups: int = 1  # >1 -> ResNeXt grouped convs
    # ResNeXt grouped-3x3 formulation: lane-aligned supergroup count
    # (network.RESNEXT_SUPERGROUPS; models/resnext.py). 1 = full
    # block-diagonal dense expansion; 2 = two 128-lane-aligned
    # feature groups at half the dense FLOPs.
    trunk_supergroups: int = 1
    autofocus: bool = False
    with_mask: bool = False
    rpn_only: bool = False  # TRAIN.ONLY_PROPOSAL: RPN phase of the
    # neg-chip pipeline (reference get_symbol_rpn, :157-227)
    num_mask_rois: int = 50
    mask_size: int = 28
    # mask-head kernel init override (None = the reference-faithful
    # normal(0.01); see models/heads.MaskHead.kernel_init for the
    # measured burn-in rationale — smokes pass a He init)
    mask_head_init: Any = None
    # R-CNN head stencil-pool halo in bins (network.HEAD_MARGIN_BINS);
    # trained offsets beyond it clamp — see ops.deform.rcnn_head_fused.
    # Default 1 (patch 44->36 cells/axis, head ~25-35% faster): trained
    # offsets measured on the overfit checkpoint peak at |trans|=0.32,
    # 4.4x below the margin-1 clamp (scripts/profile_margin.py)
    head_margin_bins: int = 1
    # pooling backend for the 7x7 head (network.POOL_KERNEL, resolved
    # by the registry): "einsum" or "fused" (composed-tent Pallas
    # kernel + hand-written transposed-pool VJP, 1.3-2.0x faster on
    # v5e). Applies to inference and training; the 14x14 mask-branch
    # pool always uses einsum (its patches exceed the kernel's VMEM
    # budget at the large canvas).
    pool_kernel: str = "einsum"
    dtype: Any = jnp.bfloat16
    # proposal op params. The TEST.* RPN keys drive the inference branch
    # (reference MultiProposal attrs, resnet_mx_101_e2e.py:347-355); the
    # TRAIN.* keys drive multi_proposal_target (reference
    # MultiProposalTarget attrs, :283-284). num_rois is the sampled roi
    # count per image — the reference op emits exactly RPN_POST_NMS_TOP_N
    # rois, so the registry ties num_rois to TRAIN.RPN_POST_NMS_TOP_N.
    pre_nms_top_n: int = 6000
    post_nms_top_n: int = 300
    nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    train_pre_nms: int = 6000
    train_post_nms: int = 300
    train_nms_thresh: float = 0.7
    train_min_size: float = 0.0
    num_rois: int = 300
    fg_fraction: float = 0.25
    fg_thresh: float = 0.5
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.0
    bbox_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    bbox_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    # network.BN_MODE: "sync" (XLA global-batch statistics, quality
    # superset) or "local" (per-device statistics like the reference's
    # per-GPU BN, README.md:10). bn_groups = data-parallel device count
    # (the registry resolves it); only training statistics change.
    bn_mode: str = "sync"
    bn_groups: int = 1

    def _anchors(self, fh: int, fw: int):
        return anchors_ahw_on_device(
            fh, fw, self.feat_stride, self.anchor_ratios, self.anchor_scales
        )

    @nn.compact
    def __call__(self, data, im_info, gt_boxes=None, valid_ranges=None,
                 gt_masks=None, train: bool = True):
        """data [B,H,W,3] (mean-subtracted), im_info [B,3] (h, w, scale);
        train also needs gt_boxes [B,G,5], valid_ranges [B,2] and a
        'sampling' PRNG stream; with_mask training additionally takes
        gt_masks [B,G,D,D] dense box-normalized GT masks."""
        if self.trunk_type == "mobilenetv2":
            from sniper_tpu.models.mobilenetv2 import MobileNetV2Trunk

            feat, _ = MobileNetV2Trunk(
                bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                dtype=self.dtype, name="trunk",
            )(data, train=train)
            feat = feat.astype(jnp.float32)
        elif self.trunk_type == "resnext":
            from sniper_tpu.models.resnext import ResNeXtTrunk

            c4, c5 = ResNeXtTrunk(
                units=self.units, num_groups=self.num_trunk_groups,
                bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                supergroups=self.trunk_supergroups,
                dtype=self.dtype, name="trunk",
            )(data, train=train)
            # concat stays in trunk dtype: the RPN/conv_new convs over the
            # 3072-ch map run in self.dtype (fp32 accumulation on the MXU)
            # and cast their outputs fp32 — the reference's fp32 cast here
            # (resnet_mx_101_e2e.py:173-175) was a GPU-fp16 safety measure
            feat = jnp.concatenate(
                [c4.astype(self.dtype), c5.astype(self.dtype)], axis=-1
            )
        else:
            c4, c5 = ResNetTrunk(
                units=self.units, bn_mode=self.bn_mode,
                bn_groups=self.bn_groups, dtype=self.dtype, name="trunk",
            )(data, train=train)
            feat = jnp.concatenate(
                [c4.astype(self.dtype), c5.astype(self.dtype)], axis=-1
            )

        rpn_cls_logits, rpn_bbox = RPNHead(self.num_anchors, dtype=self.dtype,
                                           name="rpn")(feat)
        # objectness: softmax over the {bg, fg} axis -> fg prob [B,A,H,W]
        rpn_probs = jax.nn.softmax(rpn_cls_logits, axis=3)[..., 1, :]
        rpn_fg = rpn_probs.transpose(0, 3, 1, 2)

        if self.rpn_only:
            if train:
                return {
                    "rpn_cls_logits": rpn_cls_logits,
                    "rpn_bbox_pred": rpn_bbox,
                }
            fh0, fw0 = feat.shape[1], feat.shape[2]
            rois, scores, valid = multi_proposal(
                rpn_fg, rpn_bbox, im_info, self._anchors(fh0, fw0),
                pre_nms=self.pre_nms_top_n, post_nms=self.post_nms_top_n,
                thresh=self.nms_thresh, min_size=self.rpn_min_size,
            )
            return {"rois": rois, "roi_scores": scores, "roi_valid": valid}

        roi_feat_map = nn.relu(
            nn.Conv(256, (1, 1), kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name="conv_new_1")(feat)
        ).astype(jnp.float32)
        focus_logits = (
            AutoFocusHead(dtype=self.dtype, name="autofocus")(feat)
            if self.autofocus else None
        )

        b, fh, fw = feat.shape[0], feat.shape[1], feat.shape[2]
        anchors = self._anchors(fh, fw)

        head = RCNNHead(
            self.num_classes, spatial_scale=1.0 / self.feat_stride,
            fc_dim=self.head_fc_dim, margin_bins=self.head_margin_bins,
            name="rcnn",
        )

        if train:
            key = self.make_rng("sampling")
            tgt = multi_proposal_target(
                rpn_fg, rpn_bbox, im_info, gt_boxes, valid_ranges, anchors,
                key, pre_nms=self.train_pre_nms, post_nms=self.train_post_nms,
                thresh=self.train_nms_thresh, min_size=self.train_min_size,
                num_rois=self.num_rois, fg_fraction=self.fg_fraction,
                fg_thresh=self.fg_thresh, bg_thresh_hi=self.bg_thresh_hi,
                bg_thresh_lo=self.bg_thresh_lo,
                bbox_stds=tuple(self.bbox_stds),
                bbox_means=tuple(self.bbox_means),
            )
            rois_flat = jax.lax.stop_gradient(tgt.rois.reshape(-1, 5))
            # roi_chunk=32: the einsum-path train fwd+bwd optimum
            # (profile_head_train); ignored by the fused Pallas backend
            # offset-clamp telemetry (HEAD_MARGIN_BINS halo monitoring)
            # sows into 'intermediates'; the train step surfaces it as
            # offset_max / offset_clamp_frac metrics
            # 'pallas' is the forward-only per-roi parity oracle
            # (ops/deform.py) with no VJP — only 'fused' carries the
            # hand-written backward, so train falls back to einsum
            # rather than crash in jax.grad
            train_extract = ("einsum" if self.pool_kernel == "pallas"
                             else self.pool_kernel)
            cls_score, bbox_pred = head(roi_feat_map, rois_flat,
                                        roi_chunk=32,
                                        extract=train_extract,
                                        sow_offset_stats=True)
            out = {
                "rpn_cls_logits": rpn_cls_logits,  # [B,H,W,2,A]
                "rpn_bbox_pred": rpn_bbox,         # [B,4A,H,W]
                "rois": tgt.rois,
                "rcnn_labels": tgt.labels,         # [B,R]
                "rcnn_bbox_targets": tgt.bbox_targets,
                "rcnn_bbox_weights": tgt.bbox_weights,
                "cls_score": cls_score.reshape(b, self.num_rois, -1),
                "bbox_pred": bbox_pred.reshape(b, self.num_rois, 4),
                "focus_logits": focus_logits,
            }
            if self.with_mask:
                from sniper_tpu.models.heads import MaskHead, _Lin
                from sniper_tpu.ops.deform import fused_offset_pool
                from sniper_tpu.ops.mask_target import mask_targets_from_dense

                if gt_masks is None:
                    # fail with the cause, not an attribute error: the
                    # usual culprit is roidb entries without gt_masks
                    # (dataset built with load_mask=False, or a stale
                    # maskless roidb cache — see data/coco.gt_roidb)
                    raise ValueError(
                        "with_mask=True but the batch has no gt_masks "
                        "— build the dataset with load_mask=True "
                        "(TRAIN.WITH_MASK) and check the roidb cache"
                    )
                # the mask branch pools the first num_mask_rois sampled
                # rois (fg-first slot order); cap at the sampler's roi
                # count — tgt.rois[:, :m] would silently shrink otherwise
                # and desync the reshape below
                m = min(self.num_mask_rois, self.num_rois)
                # fg rois come first in the sampler's slot ordering
                mask_rois = jax.lax.stop_gradient(tgt.rois[:, :m])
                mask_gids = tgt.matched_gt[:, :m]
                mr_flat = mask_rois.reshape(-1, 5)
                # two-pass deformable 14x14 pooling (mask variant):
                # single patch extraction, offset FC inside the chunk
                # loop (_Lin keeps nn.Dense's param tree layout)
                C_m = roi_feat_map.shape[-1]
                offm = _Lin(14 * 14 * C_m, 14 * 14 * 2,
                            kernel_init=nn.initializers.zeros,
                            name="mask_offset")
                # roi_chunk=B -> 1 roi/img/lax.map step: the 14x14
                # pool's (T+2M)^2 patches are 4x the head's; measured
                # fastest at every shape (profile_head_train sweep)
                pooled = fused_offset_pool(
                    roi_feat_map, mr_flat, offm.kernel, offm.bias,
                    rois_per_image=m, pooled_size=14,
                    spatial_scale=1.0 / self.feat_stride,
                    margin_bins=self.head_margin_bins, roi_chunk=b,
                ).reshape(-1, 14, 14, C_m)
                mh_kw = ({"kernel_init": self.mask_head_init}
                         if self.mask_head_init is not None else {})
                logits = MaskHead(self.num_classes - 1, name="mask",
                                  **mh_kw)(pooled)
                # masks ship uint8 {0,1} (4x fewer host->device bytes);
                # the bilinear crop-resize needs float
                if jnp.issubdtype(gt_masks.dtype, jnp.integer):
                    gt_masks = gt_masks.astype(jnp.float32)
                targets, cls_ids = mask_targets_from_dense(
                    mask_rois, mask_gids, gt_boxes, gt_masks,
                    mask_size=self.mask_size,
                )
                # per-roi class channel pick: neg plane c-1, pos plane
                # c-1+num_fg (reference pick/concat, mask symbol :396-401)
                nfg = self.num_classes - 1
                cid = jnp.maximum(cls_ids.reshape(-1) - 1, 0)
                logits = logits.reshape(b * m, self.mask_size, self.mask_size,
                                        2 * nfg)
                neg = jnp.take_along_axis(
                    logits, cid[:, None, None, None], axis=-1
                )
                pos = jnp.take_along_axis(
                    logits, (cid + nfg)[:, None, None, None], axis=-1
                )
                out["mask_logits"] = jnp.concatenate([neg, pos], axis=-1)
                out["mask_targets"] = targets.reshape(
                    b * m, self.mask_size, self.mask_size
                )
            return out

        rois, scores, valid = multi_proposal(
            rpn_fg, rpn_bbox, im_info, anchors,
            pre_nms=self.pre_nms_top_n, post_nms=self.post_nms_top_n,
            thresh=self.nms_thresh, min_size=self.rpn_min_size,
        )
        rois_flat = rois.reshape(-1, 5)
        cls_score, bbox_pred = head(roi_feat_map, rois_flat,
                                    extract=self.pool_kernel)
        n = self.post_nms_top_n
        cls_prob = jax.nn.softmax(cls_score, axis=-1).reshape(b, n, -1)
        out = {
            "rois": rois,                           # [B,N,5]
            "roi_scores": scores,
            "roi_valid": valid,
            "cls_prob": cls_prob,
            # undo BBOX_STDS normalization here instead of folding weights
            # at checkpoint time like the reference (_test params)
            "bbox_pred": (
                bbox_pred * jnp.asarray(self.bbox_stds)
                + jnp.asarray(self.bbox_means)
            ).reshape(b, n, 4),
        }
        if self.autofocus:
            out["focus_prob"] = jax.nn.softmax(focus_logits, axis=-1)[..., 1]
        if self.with_mask:
            # mask branch at inference: pool every kept roi, predict the
            # 2-channel plane of its argmax class only (fetching all 80
            # class planes would be 80x the bytes)
            from sniper_tpu.models.heads import MaskHead, _Lin
            from sniper_tpu.ops.deform import fused_offset_pool

            C_m = roi_feat_map.shape[-1]
            offm = _Lin(14 * 14 * C_m, 14 * 14 * 2,
                        kernel_init=nn.initializers.zeros,
                        name="mask_offset")
            # stays on the einsum backend regardless of pool_kernel: the
            # 14x14 pool's [P^2, H*C] per-roi intermediate (4x the 7x7
            # head's) exceeds VMEM at the large canvas in the fused
            # Pallas kernel
            pooled = fused_offset_pool(
                roi_feat_map, rois_flat, offm.kernel, offm.bias,
                rois_per_image=n, pooled_size=14,
                spatial_scale=1.0 / self.feat_stride,
                margin_bins=self.head_margin_bins, roi_chunk=b,
            ).reshape(-1, 14, 14, C_m)
            logits = MaskHead(self.num_classes - 1, name="mask")(pooled)
            nfg = self.num_classes - 1
            best_cls = jnp.argmax(cls_prob[..., 1:], axis=-1).reshape(-1)
            S = self.mask_size
            logits = logits.reshape(b * n, S, S, 2 * nfg)
            neg = jnp.take_along_axis(
                logits, best_cls[:, None, None, None], axis=-1
            )
            pos = jnp.take_along_axis(
                logits, (best_cls + nfg)[:, None, None, None], axis=-1
            )
            pair = jnp.concatenate([neg, pos], axis=-1)
            out["mask_prob"] = jax.nn.softmax(pair, axis=-1)[..., 1].reshape(
                b, n, S, S
            )
        return out
