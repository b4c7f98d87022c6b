"""sniper_tpu — a TPU-native (JAX/XLA/Pallas) multi-scale detection framework.

A from-scratch rebuild of the capabilities of SNIPER/AutoFocus
(mahyarnajibi/SNIPER): efficient multi-scale training with image chips,
negative-chip mining, and coarse-to-fine AutoFocus inference — re-designed
for TPUs:

- static shapes everywhere (fixed-size chips, fixed ROI counts, padded
  GT tensors with validity masks),
- one jitted train step and one jitted inference step (trunk + RPN +
  fused proposal-target op + ROI heads + losses all on device),
- data parallelism via ``jax.sharding.Mesh`` + ``shard_map``/``pjit``
  with psum gradient reduction over ICI,
- bf16 trunk compute with fp32 master params (the reference's fp16 +
  static loss-scale machinery is unnecessary on TPU),
- Pallas kernels for the hot sequential ops (NMS).

Package layout:
  config/    typed config tree, YAML-compatible with reference configs
  ops/       geometry + fused detection ops (boxes, anchors, NMS,
             proposals, proposal targets, ROI pooling, deformable conv)
  chips/     SNIPER chip sampling (set-cover), box assignment, AutoFocus
  data/      roidb schema, datasets (COCO/VOC), anchor targets, loader
  models/    flax trunks (ResNet/ResNeXt/MobileNetV2), RPN/RCNN heads
  train/     pjit train step, optimizer, LR schedule, metrics, checkpoint
  infer/     multi-scale Tester, aggregation, proposal extraction
  parallel/  mesh + sharding helpers
"""

__version__ = "0.1.0"
