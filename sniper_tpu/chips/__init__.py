from sniper_tpu.chips.generator import ChipGenerator, compute_im_scales
from sniper_tpu.chips.assigner import Chip, extract_chips, assign_boxes

__all__ = [
    "ChipGenerator",
    "compute_im_scales",
    "Chip",
    "extract_chips",
    "assign_boxes",
]
