from sniper_tpu.ops import anchors, boxes, nms

__all__ = ["anchors", "boxes", "nms"]
