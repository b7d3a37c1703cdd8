"""3D U-Net encoder-decoder with foreground + peak heads (SURVEY.md C6, L3).

NORTH-STAR: "3D conv encoder-decoder (U-Net-style) forward/backward lowers to
XLA/Pallas 3D conv kernels in bf16", two output maps — foreground probability
and center/peak response (the weak-supervision targets of Dong et al. 2019).

The network takes NDHWC volumes and returns a dict of fp32 logits:
  fg_logits:   (N, D, H, W) — voxel is inside some instance
  peak_logits: (N, D, H, W) — instance-center response map
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.core import ModelConfig
from tpuseg.core.dtypes import resolve
from tpuseg.models.blocks import ConvBlock, Down, Up


class UNet3D(nn.Module):
    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        dtype = resolve(cfg.compute_dtype)
        pdtype = resolve(cfg.param_dtype)
        kw = dict(
            norm=cfg.norm,
            num_groups=cfg.num_groups,
            activation=cfg.activation,
            dtype=dtype,
            param_dtype=pdtype,
        )
        if x.ndim == 4:  # (N, D, H, W) -> add channel dim
            x = x[..., None]
        x = x.astype(dtype)

        feats = cfg.features
        skips = []
        for i, f in enumerate(feats[:-1]):
            x = ConvBlock(f, name=f"enc{i}", **kw)(x)
            skips.append(x)
            x = Down(feats[i + 1], dtype=dtype, param_dtype=pdtype, name=f"down{i}")(x)

        x = ConvBlock(feats[-1], name="bottleneck", **kw)(x)

        for i in reversed(range(len(feats) - 1)):
            x = Up(feats[i], name=f"up{i}", **kw)(x, skips[i])

        trunk = ConvBlock(cfg.head_features, name="head_trunk", **kw)(x)
        fg = nn.Conv(1, (1, 1, 1), dtype=dtype, param_dtype=pdtype, name="fg_head")(trunk)
        peak = nn.Conv(1, (1, 1, 1), dtype=dtype, param_dtype=pdtype, name="peak_head")(trunk)
        return {
            "fg_logits": fg[..., 0].astype(jnp.float32),
            "peak_logits": peak[..., 0].astype(jnp.float32),
        }


def build_model(config: ModelConfig | None = None) -> UNet3D:
    return UNet3D(config or ModelConfig())


def init_params(model: UNet3D, rng: jax.Array, patch_shape=(64, 64, 64)):
    """Initialize fp32 params with a dummy NDHWC batch of size 1."""
    x = jnp.zeros((1, *patch_shape, model.config.in_channels), jnp.float32)
    return model.init(rng, x)["params"]
