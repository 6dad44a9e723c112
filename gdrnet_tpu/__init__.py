"""gdrnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for monocular 6D
object pose estimation with the capabilities of GDR-Net (CVPR 2021).

Reference capabilities (see SURVEY.md): given an RGB image and 2D detections of
known rigid objects, regress full 6D pose by predicting dense geometry
(object-coordinate XYZ maps, visible masks, surface-region attention) from ROI
crops and decoding through a learned Patch-PnP head into allocentric rot6d +
scale-invariant translation (SITE).

Layout:
  ops/       batched geometry math (rotations, pose decode, warps, FPS, rasterizer)
  models/    flax modules: ResNet backbone, geometry head, ConvPnPNet, GDRN
  losses/    point-matching / xyz / mask / region / rot losses
  solver/    optax optimizers (Ranger et al.) and LR schedules (flat_and_anneal)
  data/      BOP dataset registry, loaders, DZI/color/bg augmentation
  engine/    pjit train/test loops, checkpointing, config, writers
  eval/      BOP pose-error metrics, evaluators, CSV writers
  parallel/  device mesh + sharding helpers
"""

__version__ = "0.1.0"
