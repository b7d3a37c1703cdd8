"""Torch-CPU mirror of the 3D U-Net (SURVEY.md §4.2 golden-test oracle).

A numerically equivalent PyTorch implementation of models/unet3d.py with the
SAME module naming, so (a) ``.pth`` state_dicts round-trip to flax params
mechanically (ckpt/torch_import.py) and (b) the CPU-reference benchmark
(benchmarks/cpu_reference.py) runs the identical network the reference repo's
scripts would — giving the honest denominator for the >=5x NORTH-STAR target.

Padding note: XLA's SAME padding for even kernels pads low=floor((k-1)/2),
high=ceil((k-1)/2) (extra at the END); torch's padding="same" puts the extra
at the start, so the k=2 up_conv pads explicitly to match XLA.

Torch is imported lazily — jax-only users never touch it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from tpuseg.core import ModelConfig

if TYPE_CHECKING:  # pragma: no cover
    import torch


def build_torch_mirror(cfg: ModelConfig | None = None):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    cfg = cfg or ModelConfig()
    assert cfg.norm in ("batch", "group"), "mirror implements batch/group norm"

    def make_norm(cout):
        if cfg.norm == "batch":
            # eps matches flax nn.BatchNorm(epsilon=1e-5); running stats are
            # the tile-independent statistics used at eval (SURVEY.md #4)
            return nn.BatchNorm3d(cout, eps=1e-5)
        return nn.GroupNorm(min(cfg.num_groups, cout), cout, eps=1e-6)

    class ConvBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv0 = nn.Conv3d(cin, cout, 3, padding=1, bias=False)
            self.norm0 = make_norm(cout)
            self.conv1 = nn.Conv3d(cout, cout, 3, padding=1, bias=False)
            self.norm1 = make_norm(cout)

        def forward(self, x):
            x = F.relu(self.norm0(self.conv0(x)))
            x = F.relu(self.norm1(self.conv1(x)))
            return x

    class Down(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.down = nn.Conv3d(cin, cout, 2, stride=2)

        def forward(self, x):
            return self.down(x)

    class Up(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.up_conv = nn.Conv3d(cin, cout, 2)
            self.block = ConvBlock(2 * cout, cout)

        def forward(self, x, skip):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = F.pad(x, (0, 1, 0, 1, 0, 1))  # XLA SAME for k=2: extra at end
            x = self.up_conv(x)
            x = torch.cat([x, skip], dim=1)
            return self.block(x)

    class UNet3DMirror(nn.Module):
        def __init__(self):
            super().__init__()
            f = cfg.features
            for i in range(len(f) - 1):
                setattr(self, f"enc{i}", ConvBlock(cfg.in_channels if i == 0 else f[i], f[i]))
                setattr(self, f"down{i}", Down(f[i], f[i + 1]))
            self.bottleneck = ConvBlock(f[-1], f[-1])
            for i in reversed(range(len(f) - 1)):
                setattr(self, f"up{i}", Up(f[i + 1], f[i]))
            self.head_trunk = ConvBlock(f[0], cfg.head_features)
            self.fg_head = nn.Conv3d(cfg.head_features, 1, 1)
            self.peak_head = nn.Conv3d(cfg.head_features, 1, 1)

        def forward(self, x):
            # x: (N, C, D, H, W)
            f = cfg.features
            skips = []
            for i in range(len(f) - 1):
                x = getattr(self, f"enc{i}")(x)
                skips.append(x)
                x = getattr(self, f"down{i}")(x)
            x = self.bottleneck(x)
            for i in reversed(range(len(f) - 1)):
                x = getattr(self, f"up{i}")(x, skips[i])
            t = self.head_trunk(x)
            return {
                "fg_logits": self.fg_head(t)[:, 0],
                "peak_logits": self.peak_head(t)[:, 0],
            }

    return UNet3DMirror()
