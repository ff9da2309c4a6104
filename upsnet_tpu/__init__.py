"""upsnet_tpu — a TPU-native panoptic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the public
``uber-research/UPSNet`` reference (CVPR 2019 "UPSNet: A Unified Panoptic
Segmentation Network"): caffe-style ResNet-FPN backbone, Mask R-CNN instance
branch, deformable-conv semantic head, and a parameter-free panoptic fusion
head — all with static padded shapes so every step compiles to a fixed set of
XLA programs, data-parallel via ``jax.sharding``, and custom Pallas kernels
for the reference's CUDA ops (ROIAlign, deformable convolution, NMS).

Layout (mirrors SURVEY.md §2's component inventory):
  config/    typed dataclass config tree + reference-yaml loader
  ops/       device ops: boxes, anchors, NMS, proposals, targets, ROIAlign,
             deformable conv, mask paste, panoptic fusion (jnp + Pallas)
  models/    ResNet, FPN, RPN, box/mask heads, FCN semantic head, UPSNet
  data/      dataset abstractions (COCO panoptic, Cityscapes) + input pipeline
  evaluation/ host-side metrics: COCO-style AP, mIoU, PQ, RLE codec
  parallel/  mesh construction, sharded train/predict steps
  train/     losses, optimizer, trainer loop, checkpointing
  convert/   PyTorch .pth -> JAX pytree converter for released checkpoints
  utils/     logging, meters, profiling
"""

__version__ = "0.1.0"
