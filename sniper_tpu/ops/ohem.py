"""Online Hard Example Mining over sampled rois.

Equivalent of the reference's BoxAnnotatorOHEM custom op
(/root/reference/lib/operator_py/box_annotator_ohem.py:27-78): given
per-roi classification + bbox losses, keep the top ``roi_per_img``
hardest rois per image and mark the rest ignore (-1 labels / zero bbox
weights). The reference registers it but the shipped e2e configs leave
it off (TRAIN.ENABLE_OHEM false, sampling happens in
MultiProposalTarget); provided here jittably for config parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ohem_select(cls_loss, bbox_loss, labels, bbox_weights, roi_per_img: int):
    """cls_loss [B,R], bbox_loss [B,R], labels [B,R], bbox_weights
    [B,R,4]. Returns (labels, bbox_weights) with only the top
    ``roi_per_img`` hardest (by summed loss) rois kept per image."""
    total = cls_loss + bbox_loss
    total = jnp.where(labels >= 0, total, -jnp.inf)
    thresh = jax.lax.top_k(total, roi_per_img)[0][:, -1:]
    keep = total >= thresh
    new_labels = jnp.where(keep, labels, -1)
    new_weights = jnp.where(keep[..., None], bbox_weights, 0.0)
    return new_labels, new_weights
