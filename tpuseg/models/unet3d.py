"""3D U-Net encoder-decoder with foreground + peak heads (SURVEY.md C6, L3).

NORTH-STAR: "3D conv encoder-decoder (U-Net-style) forward/backward lowers to
XLA/Pallas 3D conv kernels in bf16", two output maps — foreground probability
and center/peak response (the weak-supervision targets of Dong et al. 2019).

The network takes NDHWC volumes and returns a dict of fp32 logits:
  fg_logits:   (N, D, H, W) — voxel is inside some instance
  peak_logits: (N, D, H, W) — instance-center response map

Variable collections: ``params`` (fp32 weights) and, for the default
BatchNorm variant, ``batch_stats`` (running mean/var — the tile-independent
statistics that make sliding-window inference voxel-exact; see models.blocks).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.core import ModelConfig
from tpuseg.core.dtypes import resolve
from tpuseg.models.blocks import ConvBlock, Down, Up


class UNet3D(nn.Module):
    config: ModelConfig = ModelConfig()
    bn_axis: Optional[str] = None  # set under DP shard_map for stat sync

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        dtype = resolve(cfg.compute_dtype)
        pdtype = resolve(cfg.param_dtype)
        kw = dict(
            norm=cfg.norm,
            num_groups=cfg.num_groups,
            activation=cfg.activation,
            dtype=dtype,
            param_dtype=pdtype,
            bn_axis=self.bn_axis,
            conv_impl=cfg.conv_impl,
        )
        if x.ndim == 4:  # (N, D, H, W) -> add channel dim
            x = x[..., None]
        x = x.astype(dtype)

        feats = cfg.features
        skips = []
        for i, f in enumerate(feats[:-1]):
            x = ConvBlock(f, name=f"enc{i}", **kw)(x, train=train)
            skips.append(x)
            x = Down(feats[i + 1], dtype=dtype, param_dtype=pdtype,
                     conv_impl=cfg.conv_impl, name=f"down{i}")(x)

        x = ConvBlock(feats[-1], name="bottleneck", **kw)(x, train=train)

        for i in reversed(range(len(feats) - 1)):
            x = Up(feats[i], name=f"up{i}", **kw)(x, skips[i], train=train)

        trunk = ConvBlock(cfg.head_features, name="head_trunk", **kw)(x, train=train)
        from tpuseg.models.conv3d import Conv3D

        fg = Conv3D(1, (1, 1, 1), impl=cfg.conv_impl, dtype=dtype,
                    param_dtype=pdtype, name="fg_head")(trunk)
        peak = Conv3D(1, (1, 1, 1), impl=cfg.conv_impl, dtype=dtype,
                      param_dtype=pdtype, name="peak_head")(trunk)
        return {
            "fg_logits": fg[..., 0].astype(jnp.float32),
            "peak_logits": peak[..., 0].astype(jnp.float32),
        }


def build_model(config: ModelConfig | None = None, bn_axis: Optional[str] = None) -> UNet3D:
    return UNet3D(config or ModelConfig(), bn_axis=bn_axis)


def init_variables(model: UNet3D, rng: jax.Array, patch_shape=(64, 64, 64)) -> dict:
    """Initialize all variable collections with a dummy NDHWC batch of 1.
    Returns {"params": ..., "batch_stats": ...} (batch_stats only for BN)."""
    x = jnp.zeros((1, *patch_shape, model.config.in_channels), jnp.float32)
    return jax.tree.map(lambda a: a, model.init(rng, x))  # unfreeze-safe copy


def init_params(model: UNet3D, rng: jax.Array, patch_shape=(64, 64, 64)):
    """fp32 params only (convenience for norm-free / group-norm configs)."""
    return init_variables(model, rng, patch_shape)["params"]
