"""Loss functions with the reference's exact normalizations.

Reference: /root/reference/symbols/faster/resnet_mx_101_e2e.py:279-338.
- softmax CE with ignore-label -1 and 'valid' normalization (sum over
  non-ignored / max(count, 1)),
- smooth-L1 (sigma=1) box losses with the reference's grad scales:
  RPN 3/(B*RPN_BATCH_SIZE), RCNN 1/(188*B) — 188 = 4 coords * ~47
  expected fg rois,
- AutoFocus FocusPixel CE, valid-normalized with -1 don't-care.

bf16-safe: logits are cast to fp32 before log-softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def softmax_ce_ignore(logits, labels):
    """Valid-normalized CE. logits [..., C] fp, labels [...] int with -1
    ignore. Returns scalar."""
    logits = logits.astype(jnp.float32)
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def rpn_cls_loss(rpn_cls_logits, rpn_labels):
    """rpn_cls_logits [B,H,W,2,A]; rpn_labels [B, A*H*W] in {-1,0,1}
    ((A,H,W)-flat, the loader layout)."""
    b, h, w, _, a = rpn_cls_logits.shape
    logits = rpn_cls_logits.transpose(0, 4, 1, 2, 3).reshape(b, a * h * w, 2)
    return softmax_ce_ignore(logits, rpn_labels.astype(jnp.int32))


def rpn_bbox_loss(rpn_bbox_pred, bbox_targets, bbox_weights, batch_images,
                  rpn_batch_size=256):
    """All [B,4A,H,W]. Reference scale 3/(B*RPN_BATCH_SIZE)."""
    diff = (rpn_bbox_pred - bbox_targets).astype(jnp.float32)
    loss = (bbox_weights * smooth_l1(diff)).sum()
    return loss * 3.0 / float(batch_images * rpn_batch_size)


def rpn_cls_loss_sparse(rpn_cls_logits, rpn_pids, rpn_label_vals):
    """Sparse-target form: gather the sampled anchors' logits instead of
    scoring the full grid. rpn_pids [B,S] (A,H,W)-flat indices padded
    -1; rpn_label_vals [B,S] in {-1,0,1}. Same value as rpn_cls_loss on
    the densified targets (the dense grid is -1 everywhere else)."""
    b, h, w, _, a = rpn_cls_logits.shape
    logits = rpn_cls_logits.transpose(0, 4, 1, 2, 3).reshape(b, a * h * w, 2)
    idx = jnp.maximum(rpn_pids, 0)
    picked = jnp.take_along_axis(logits, idx[..., None], axis=1)
    labels = jnp.where(rpn_pids >= 0, rpn_label_vals, -1.0)
    return softmax_ce_ignore(picked, labels.astype(jnp.int32))


def rpn_bbox_loss_sparse(rpn_bbox_pred, fg_pids, fg_targets, batch_images,
                         rpn_batch_size=256):
    """Sparse form of rpn_bbox_loss: gather predictions at the fg
    anchors. rpn_bbox_pred [B,4A,H,W] (channel = a*4+coord, the dense
    target layout); fg_pids [B,F] (A,H,W)-flat padded -1; fg_targets
    [B,F,4]."""
    b, c4, h, w = rpn_bbox_pred.shape
    a = c4 // 4
    pred = rpn_bbox_pred.reshape(b, a, 4, h, w).transpose(0, 1, 3, 4, 2)
    pred = pred.reshape(b, a * h * w, 4)
    idx = jnp.maximum(fg_pids, 0)
    picked = jnp.take_along_axis(pred, idx[..., None], axis=1)
    per = smooth_l1((picked - fg_targets).astype(jnp.float32)).sum(-1)
    loss = jnp.where(fg_pids >= 0, per, 0.0).sum()
    return loss * 3.0 / float(batch_images * rpn_batch_size)


def rcnn_cls_loss(cls_score, labels):
    """cls_score [B,R,C], labels [B,R] with -1 ignore."""
    return softmax_ce_ignore(cls_score, labels)


def rcnn_bbox_loss(bbox_pred, bbox_targets, bbox_weights, batch_images):
    """All [B,R,4]. Reference scale 1/(188*B)."""
    diff = (bbox_pred - bbox_targets).astype(jnp.float32)
    loss = (bbox_weights * smooth_l1(diff)).sum()
    return loss / (188.0 * float(batch_images))


def focus_loss(focus_logits, focus_labels):
    """focus_logits [B,H,W,2], labels [B,H*W] in {-1,0,1}."""
    b, h, w, _ = focus_logits.shape
    return softmax_ce_ignore(
        focus_logits.reshape(b, h * w, 2), focus_labels.astype(jnp.int32)
    )


def mask_loss(mask_logits, mask_targets):
    """mask_logits [M,S,S,2], targets [M,S,S] in {-1,0,1}; valid-norm CE
    with -1 ignore (reference mask SoftmaxOutput, mask symbol :403-405)."""
    return softmax_ce_ignore(mask_logits, mask_targets.astype(jnp.int32))


def total_loss(outputs, batch, batch_images, rpn_batch_size=256,
               with_autofocus=False, with_mask=False, rpn_only=False,
               ohem_rois=0):
    """Compose the training loss from detector outputs + loader batch.

    batch needs either dense RPN targets ('label' [B,A*H*W],
    'bbox_target'/'bbox_weight' [B,4A,H,W]) or ChipLoader's default
    sparse form ('rpn_pids'/'rpn_label_vals' [B,S], 'fg_pids' [B,F],
    'fg_targets' [B,F,4]) (+ 'scale_label' [B,H*W] for AutoFocus).
    ohem_rois > 0 enables Online Hard Example Mining over the sampled
    rois (TRAIN.ENABLE_OHEM + BATCH_ROIS_OHEM; reference
    box_annotator_ohem.py:27-78): only the top-k hardest rois per image
    keep their labels/bbox weights before the loss.
    Returns (loss, metrics dict).
    """
    if "rpn_pids" in batch:
        l_rpn_cls = rpn_cls_loss_sparse(
            outputs["rpn_cls_logits"], batch["rpn_pids"],
            batch["rpn_label_vals"],
        )
        l_rpn_bbox = rpn_bbox_loss_sparse(
            outputs["rpn_bbox_pred"], batch["fg_pids"], batch["fg_targets"],
            batch_images, rpn_batch_size,
        )
    else:
        l_rpn_cls = rpn_cls_loss(outputs["rpn_cls_logits"], batch["label"])
        l_rpn_bbox = rpn_bbox_loss(
            outputs["rpn_bbox_pred"], batch["bbox_target"],
            batch["bbox_weight"], batch_images, rpn_batch_size,
        )
    if rpn_only:
        loss = l_rpn_cls + l_rpn_bbox
        return loss, {
            "rpn_cls_loss": l_rpn_cls,
            "rpn_bbox_loss": l_rpn_bbox,
            "loss": loss,
        }
    rcnn_labels = outputs["rcnn_labels"]
    rcnn_weights = outputs["rcnn_bbox_weights"]
    if ohem_rois:
        from sniper_tpu.ops.ohem import ohem_select

        logits = outputs["cls_score"].astype(jnp.float32)
        safe = jnp.maximum(rcnn_labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_cls = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        per_cls = jnp.where(rcnn_labels >= 0, per_cls, 0.0)
        diff = (
            outputs["bbox_pred"] - outputs["rcnn_bbox_targets"]
        ).astype(jnp.float32)
        per_bbox = (rcnn_weights * smooth_l1(diff)).sum(-1)
        rcnn_labels, rcnn_weights = ohem_select(
            per_cls, per_bbox, rcnn_labels, rcnn_weights, ohem_rois
        )
    l_rcnn_cls = rcnn_cls_loss(outputs["cls_score"], rcnn_labels)
    l_rcnn_bbox = rcnn_bbox_loss(
        outputs["bbox_pred"], outputs["rcnn_bbox_targets"],
        rcnn_weights, batch_images,
    )
    loss = l_rpn_cls + l_rpn_bbox + l_rcnn_cls + l_rcnn_bbox
    metrics = {
        "rpn_cls_loss": l_rpn_cls,
        "rpn_bbox_loss": l_rpn_bbox,
        "rcnn_cls_loss": l_rcnn_cls,
        "rcnn_bbox_loss": l_rcnn_bbox,
    }
    if with_autofocus:
        l_focus = focus_loss(outputs["focus_logits"], batch["scale_label"])
        loss = loss + l_focus
        metrics["focus_loss"] = l_focus
    if with_mask:
        l_mask = mask_loss(outputs["mask_logits"], outputs["mask_targets"])
        loss = loss + l_mask
        metrics["mask_loss"] = l_mask
    metrics["loss"] = loss
    return loss, metrics
