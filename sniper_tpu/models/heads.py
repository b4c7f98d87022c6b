"""Detection heads: RPN, deformable-ROI R-CNN head, AutoFocus branch.

Mirrors the reference head topology
(/root/reference/symbols/faster/resnet_mx_101_e2e.py:147-155,256-303):
- RPN: 3x3 conv 512 -> 1x1 cls (2A) + 1x1 bbox (4A), all fp32,
- R-CNN: 1x1 conv 256 ("conv_new_1") feeds a two-pass deformable ROI
  pooling (offset predictor with no_trans + lr-dampened FC, then the
  offset-guided pool), 2x FC-1024, class softmax + class-agnostic 4-dim
  bbox regressor,
- AutoFocus: 3 convs on the trunk feature -> 2-channel FocusPixel logits.

Weight init follows the reference (normal(0.01) for new convs/FCs,
zeros for biases and all deformable offsets; the offset FC's 0.01
lr_mult is reproduced via an internal gradient scale so one optimizer
LR serves all params).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sniper_tpu.ops.deform import deformable_psroi_pool_fast as deformable_psroi_pool
from sniper_tpu.ops.deform import grad_scale, rcnn_head_fused

init_n01 = nn.initializers.normal(0.01)


class _Lin(nn.Module):
    """Param holder with nn.Dense's tree layout ({kernel, bias}).

    The R-CNN head runs its FCs inside ops.deform.rcnn_head_fused's
    chunk loop, so it needs the raw arrays rather than callable Dense
    modules; this keeps checkpoints/pretrained-import paths identical
    to the previous nn.Dense layout.
    """

    in_dim: int
    out_dim: int
    kernel_init: object = init_n01

    def setup(self):
        self.kernel = self.param(
            "kernel", self.kernel_init, (self.in_dim, self.out_dim)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.out_dim,)
        )


class RPNHead(nn.Module):
    num_anchors: int
    # compute dtype for the convs (params stay fp32). The reference runs
    # the RPN head in fp32 because GPU fp16 needed loss-scale care; on
    # TPU a bf16 conv accumulates in fp32 on the MXU, and the 3x3 conv
    # over the 3072-ch C4||C5 concat is one of the largest matmuls in
    # the whole forward — bf16 halves its cost. Outputs are cast fp32.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        """feat [B,H,W,C]. Returns cls logits [B,H,W,2,A] fp32, bbox
        deltas [B,4A,H,W] fp32 (conv channel = a*4+k, op layout)."""
        h = nn.Conv(512, (3, 3), padding="SAME", kernel_init=init_n01,
                    dtype=self.dtype, name="rpn_conv_3x3")(feat)
        h = nn.relu(h)
        cls = nn.Conv(2 * self.num_anchors, (1, 1), kernel_init=init_n01,
                      dtype=self.dtype, name="rpn_cls_score")(h)
        bbox = nn.Conv(4 * self.num_anchors, (1, 1), kernel_init=init_n01,
                       dtype=self.dtype, name="rpn_bbox_pred")(h)
        cls = cls.astype(jnp.float32)
        bbox = bbox.astype(jnp.float32)
        b, fh, fw, _ = cls.shape
        # channel layout (2, A): bg block then fg block (reference reshape)
        cls = cls.reshape(b, fh, fw, 2, self.num_anchors)
        bbox = bbox.transpose(0, 3, 1, 2)  # [B,4A,H,W]
        return cls, bbox


class RCNNHead(nn.Module):
    num_classes: int
    pooled_size: int = 7
    spatial_scale: float = 0.0625
    offset_lr_mult: float = 0.01
    fc_dim: int = 1024  # 512 for the MobileNetV2 variant
    # fused=True runs the whole two-pass head inside one chunked loop
    # (single patch extraction; see ops.deform.rcnn_head_fused).
    # fused=False is the reference-shaped two-pool composition, kept as
    # the numerical oracle for the fused path.
    fused: bool = True
    # patch halo (in bins) the stencil pool can shift into; offsets
    # beyond it clamp. See ops.deform.rcnn_head_fused / config
    # network.HEAD_MARGIN_BINS.
    margin_bins: int = 1

    @nn.compact
    def __call__(self, roi_feat_map, rois, roi_chunk: int | None = None,
                 extract: str = "einsum", sow_offset_stats: bool = False):
        """roi_feat_map [B,H,W,256] fp32 (conv_new_1 output), rois [R,5].
        Returns (cls_score [R,num_classes], bbox_pred [R,4]).

        ``sow_offset_stats`` sows 'offset_max' / 'offset_clamp_frac'
        into the 'intermediates' collection (visible when the caller
        applies with mutable=['intermediates']): the max |trans| the
        offset FC produced and the fraction at/over the margin clamp
        threshold margin_bins / (trans_std * P) — where EDGE bins hit
        the patch rail (interior bins have more headroom, so this is a
        conservative early warning). HEAD_MARGIN_BINS=1 is justified by
        measured offsets staying far below the halo — this telemetry
        detects silent clamping on real training runs (the clamp
        degrades quality without any crash).

        ``extract`` picks the pooling backend (see
        ops.deform.fused_offset_pool): "fused" runs the forward-only
        composed-tent Pallas kernel — inference only.

        ``roi_chunk`` bounds the pool's per-lax.map-step roi block.
        Swept on v5e (scripts/profile_head_train.py): inference forward
        bottoms at 16 across all three test canvases; the train-step
        fwd+bwd bottoms at 32 (B=16 chips -> 2 rois/img/step). Default
        (None) = 16; the detector passes 32 in train mode.

        When R is a multiple of B, rois are assumed IMAGE-CONTIGUOUS
        (roi i belongs to image i // (R/B), how the proposal ops emit
        them) and the fused single-extraction head runs; the rois'
        batch-index column is ignored on that path, so callers with
        arbitrarily ordered rois must pass R not divisible by B or set
        fused=False to get the general batch-index-respecting path."""
        P = self.pooled_size
        B = roi_feat_map.shape[0]
        contiguous = rois.shape[0] % B == 0 and B >= 1
        rpi = rois.shape[0] // B if contiguous else None
        C = roi_feat_map.shape[-1]
        offset = _Lin(P * P * C, P * P * 2,
                      kernel_init=nn.initializers.zeros, name="offset")
        fc1 = _Lin(P * P * C, self.fc_dim, name="fc_new_1")
        fc2 = _Lin(self.fc_dim, self.fc_dim, name="fc_new_2")
        cls = _Lin(self.fc_dim, self.num_classes, name="cls_score")
        bbx = _Lin(self.fc_dim, 4, name="bbox_pred")

        if self.fused and contiguous:
            out = rcnn_head_fused(
                roi_feat_map, rois,
                (offset.kernel, offset.bias, fc1.kernel, fc1.bias,
                 fc2.kernel, fc2.bias, cls.kernel, cls.bias,
                 bbx.kernel, bbx.bias),
                rois_per_image=rpi, pooled_size=P,
                spatial_scale=self.spatial_scale,
                offset_grad_mult=self.offset_lr_mult,
                margin_bins=self.margin_bins,
                roi_chunk=roi_chunk or 16,
                extract=extract,
                return_offset_stats=sow_offset_stats,
            )
            if sow_offset_stats:
                cls_score, bbox_pred, off = out
                self._sow_offset_stats(off, trans_std=0.1)
                return cls_score, bbox_pred
            return out

        # general path: respects the rois' batch-index column
        offset_t = deformable_psroi_pool(
            roi_feat_map, rois, None, pooled_size=P,
            spatial_scale=self.spatial_scale,
        )
        off = offset_t.reshape(rois.shape[0], -1) @ offset.kernel \
            + offset.bias
        off = grad_scale(off, self.offset_lr_mult)
        if sow_offset_stats:
            self._sow_offset_stats(jax.lax.stop_gradient(off),
                                   trans_std=0.1)
        # reference reshape (-1, 2, 7, 7): plane 0 = y, plane 1 = x
        trans = off.reshape(-1, 2, P, P).transpose(0, 2, 3, 1)
        pooled = deformable_psroi_pool(
            roi_feat_map, rois, trans, pooled_size=P,
            spatial_scale=self.spatial_scale,
        )
        h = pooled.reshape(rois.shape[0], -1)
        h = nn.relu(h @ fc1.kernel + fc1.bias)
        h = nn.relu(h @ fc2.kernel + fc2.bias)
        cls_score = h @ cls.kernel + cls.bias
        bbox_pred = h @ bbx.kernel + bbx.bias
        return cls_score, bbox_pred

    def _sow_offset_stats(self, off, trans_std):
        """off [R, 2*P*P] raw offset-FC output. The stencil pool clips
        window shifts at margin_bins*S cells; in offset units (shift =
        off * trans_std * P * S cells, roi-size-independent) that is
        margin_bins / (trans_std * P)."""
        thr = self.margin_bins / (trans_std * self.pooled_size)
        ab = jnp.abs(off.astype(jnp.float32))
        self.sow("intermediates", "offset_max", jnp.max(ab))
        self.sow("intermediates", "offset_clamp_frac",
                 jnp.mean((ab >= thr).astype(jnp.float32)))
        # sow the threshold itself so downstream telemetry (epoch-end
        # warnings in main_train) reads the model's actual clamp rather
        # than re-deriving it from assumed trans_std/pooled_size
        self.sow("intermediates", "offset_clamp_thr", jnp.float32(thr))


class MaskHead(nn.Module):
    """Mask branch (resnet_mx_101_e2e_mask.get_mask_head, :238-254):
    4x conv3x3-256 -> 2x2 stride-2 deconv (14 -> 28) -> 1x1 conv with
    2*num_fg_classes channels (per-class neg/pos logit planes)."""

    num_fg_classes: int = 80
    num_layers: int = 4
    # reference-faithful init: normal(0, 0.01) on every mask layer
    # (init_weight_mask, resnet_mx_101_e2e_mask.py:524-539). Measured
    # burn-in cost (round 5): five stacked 0.01-scale layers suppress
    # spatial gradients so hard that overfit-scale runs sit at the
    # constant-majority CE for 300+ steps (only the output bias
    # learns) — production-scale schedules (~90k steps) escape it, but
    # small smokes override this with a He init to test the mask
    # CHAIN rather than the init's burn-in.
    kernel_init: object = init_n01

    @nn.compact
    def __call__(self, pooled):
        """pooled [R, 14, 14, C] -> logits [R, 28, 28, 2*num_fg_classes]."""
        h = pooled
        for i in range(self.num_layers):
            h = nn.relu(
                nn.Conv(256, (3, 3), padding="SAME",
                        kernel_init=self.kernel_init,
                        name=f"mask_conv_3x3_{i + 1}")(h)
            )
        h = nn.relu(
            nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                             kernel_init=self.kernel_init,
                             name="mask_deconv")(h)
        )
        return nn.Conv(self.num_fg_classes * 2, (1, 1),
                       kernel_init=self.kernel_init, name="mask_out")(h)


class AutoFocusHead(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        """feat [B,H,W,C] -> FocusPixel logits [B,H,W,2] fp32."""
        h = nn.relu(nn.Conv(256, (3, 3), padding="SAME", kernel_init=init_n01,
                            dtype=self.dtype, name="conv_new_2")(feat))
        h = nn.relu(nn.Conv(256, (1, 1), kernel_init=init_n01,
                            dtype=self.dtype, name="conv_new_3")(h))
        out = nn.Conv(2, (1, 1), kernel_init=init_n01, dtype=self.dtype,
                      name="conv_new_out")(h)
        return out.astype(jnp.float32)
