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

init_n01 = nn.initializers.normal(0.01)


def grad_scale(x, scale: float):
    """Identity with scaled gradient (reference lr_mult emulation)."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


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

    @nn.compact
    def __call__(self, roi_feat_map, rois):
        """roi_feat_map [B,H,W,256] fp32 (conv_new_1 output), rois [R,5].
        Returns (cls_score [R,num_classes], bbox_pred [R,4])."""
        P = self.pooled_size
        # pass 1: predict per-bin offsets from an undeformed pool
        offset_t = deformable_psroi_pool(
            roi_feat_map, rois, None, pooled_size=P,
            spatial_scale=self.spatial_scale,
        )
        off = nn.Dense(P * P * 2, kernel_init=nn.initializers.zeros,
                       name="offset")(offset_t.reshape(rois.shape[0], -1))
        off = grad_scale(off, self.offset_lr_mult)
        # reference reshape (-1, 2, 7, 7): plane 0 = y, plane 1 = x
        trans = off.reshape(-1, 2, P, P).transpose(0, 2, 3, 1)
        pooled = deformable_psroi_pool(
            roi_feat_map, rois, trans, pooled_size=P,
            spatial_scale=self.spatial_scale,
        )
        h = pooled.reshape(rois.shape[0], -1)
        h = nn.relu(nn.Dense(self.fc_dim, kernel_init=init_n01,
                             name="fc_new_1")(h))
        h = nn.relu(nn.Dense(self.fc_dim, kernel_init=init_n01,
                             name="fc_new_2")(h))
        cls_score = nn.Dense(self.num_classes, kernel_init=init_n01,
                             name="cls_score")(h)
        bbox_pred = nn.Dense(4, kernel_init=init_n01, name="bbox_pred")(h)
        return cls_score, bbox_pred


class MaskHead(nn.Module):
    """Mask branch (resnet_mx_101_e2e_mask.get_mask_head, :238-254):
    4x conv3x3-256 -> 2x2 stride-2 deconv (14 -> 28) -> 1x1 conv with
    2*num_fg_classes channels (per-class neg/pos logit planes)."""

    num_fg_classes: int = 80
    num_layers: int = 4

    @nn.compact
    def __call__(self, pooled):
        """pooled [R, 14, 14, C] -> logits [R, 28, 28, 2*num_fg_classes]."""
        h = pooled
        for i in range(self.num_layers):
            h = nn.relu(
                nn.Conv(256, (3, 3), padding="SAME", kernel_init=init_n01,
                        name=f"mask_conv_3x3_{i + 1}")(h)
            )
        h = nn.relu(
            nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                             kernel_init=init_n01, name="mask_deconv")(h)
        )
        return nn.Conv(self.num_fg_classes * 2, (1, 1), kernel_init=init_n01,
                       name="mask_out")(h)


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
