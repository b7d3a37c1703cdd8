"""Analytic FLOP count of the 3D U-Net forward pass (for MFU reporting).

Counts 2*k^3*Cin*Cout multiply-accumulate FLOPs per conv output voxel at each
level's resolution, per ORIGINAL input voxel (level l runs at 1/8^l voxels).
Matches tpuseg/models/unet3d.py: ConvBlock = two 3^3 convs, Down = 2^3
stride-2 conv, Up = nearest-up + 2^3 conv + ConvBlock on the concat, head
trunk ConvBlock + two 1x1x1 heads. Norms/activations excluded (bandwidth,
not FLOPs).
"""

from __future__ import annotations

from tpuseg.core import ModelConfig


def unet_flops_per_voxel(cfg: ModelConfig | None = None) -> float:
    cfg = cfg or ModelConfig()
    f = cfg.features
    c_in = cfg.in_channels
    total = 0.0

    def block(cin, cout, scale):
        return 2 * 27 * (cin * cout + cout * cout) / scale

    # encoder
    for i in range(len(f) - 1):
        cin = c_in if i == 0 else f[i]
        total += block(cin, f[i], 8**i)
        total += 2 * 8 * f[i] * f[i + 1] / 8 ** (i + 1)   # Down k=2 s=2
    # bottleneck
    lb = len(f) - 1
    total += block(f[-1], f[-1], 8**lb)
    # decoder
    for i in reversed(range(len(f) - 1)):
        total += 2 * 8 * f[i + 1] * f[i] / 8**i           # Up k=2 conv (post-upsample)
        total += 2 * 27 * (2 * f[i] * f[i] + f[i] * f[i]) / 8**i  # concat block
    # head trunk + 1x1x1 heads
    total += block(f[0], cfg.head_features, 1)
    total += 2 * 2 * cfg.head_features
    return total
