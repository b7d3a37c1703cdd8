"""tpuseg — TPU-native weakly-supervised 3D instance segmentation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
repo ``MeowMeowLady/InstanceSeg-Without-Voxelwise-Labeling`` (MICCAI 2019:
instance segmentation of volumetric microscopy without voxel-wise labels).

Capability spec: /root/repo/BASELINE.json (north_star + configs); structural
analysis: /root/repo/SURVEY.md. The reference mount was empty in every session
so far, so docstrings cite the NORTH-STAR spec instead of reference file:line.

Layout (maps to SURVEY.md §2 component inventory):
  core/      config dataclasses, dtype policy            (C15)
  models/    3D U-Net encoder-decoder, fg + peak heads   (C6)
  losses/    peak loss, box-derived foreground loss      (C7)
  data/      volume I/O, synthetic data, patch sampler,
             augmentation, weak-target synthesis         (C1-C5)
  ops/       on-device post-processing kernels: peak NMS,
             watershed, connected components, size filter,
             compact relabel                             (C11-C13)
  infer/     tiled halo-overlap whole-volume inference,
             fused pipeline, GSPMD-sharded inference     (C10)
  train/     weakly-supervised training loop, DP         (C8)
  parallel/  mesh helpers, halo exchange, cross-shard
             label reconciliation                        (new, config 5)
  ckpt/      orbax checkpointing + torch .pth import     (C9)
  eval/      instance-level F1                           (C14)
  cli/       train / infer / evaluate entry points       (script API)
"""

__version__ = "0.1.0"
