"""Eval-mode U-Net forward with the full-resolution ConvBlocks fused into
single Mosaic/Pallas kernels (ops/pallas_convblock.py).

Why this exists (ARCHITECTURE.md "layout waterbed"): at the full-res levels
(C=32) XLA's schedules are layout-equilibrated — ~60 ms/tile of conv work
plus ~90 ms of relayout taxes that every local fix only relocates. The fused
kernel runs (conv3x3x3 -> BN-affine -> ReLU) x2 in one VMEM-resident pass in
a fixed (z, h, C, W) layout, so the taxes vanish instead of moving.

``make_fused_apply(model)`` returns an ``apply_fn(variables, x)`` with the
same signature and output contract as ``model.apply`` (eval mode) that the
tile sweep (infer/tiles.py) can use directly:

  * enc0, up0.block and head_trunk (the three CO=32 full-res ConvBlocks)
    run as fused Pallas kernels in channel-sublane/width-lane layout;
  * the mid U-Net (down0 .. up0.up_conv) reuses the exact flax modules via
    per-submodule ``apply`` on the matching parameter subtrees — no second
    implementation of those layers;
  * the 1x1x1 heads contract the channel sublanes directly in cw layout
    (one einsum), so the trunk never transposes back to NDHWC.

Only two relayouts remain per tile: enc0-out -> NDHWC for the mid net, and
up0.up_conv-out -> cw for the decoder concat. The function computed is the
same as ``model.apply`` up to bf16 reassociation (BN folded to an affine,
f32 accumulation, same rounding points); tiled self-consistency (tiles vs
direct forward) is exact because both sides use the same apply_fn.

Eval only: BatchNorm running stats are folded into per-channel affines, so
there is no train-mode or gradient path here — training keeps the flax
forward (models/blocks.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuseg.core import ModelConfig
from tpuseg.core.dtypes import resolve
from tpuseg.models.blocks import ConvBlock, Down
from tpuseg.models.conv3d import Conv3D
from tpuseg.ops.pallas_convblock import (WPAD, fused_convblock_chw, pad_flat,
                                         to_chw)


def fused_apply_supported(config: ModelConfig) -> bool:
    """The Pallas block is specialized to the flagship family: CO=32
    full-res blocks, eval BatchNorm, ReLU."""
    return (
        config.norm == "batch"
        and config.activation == "relu"
        and len(config.features) >= 2
        and config.features[0] == 32
        and config.head_features == 32
    )


def _fold_bn_jnp(scale, bias, mean, var, eps=1e-5):
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    s = scale.astype(jnp.float32) * inv
    return s, bias.astype(jnp.float32) - mean.astype(jnp.float32) * s


def _block_args(params, stats):
    """ConvBlock param/stat subtrees -> fused_convblock_cw weight args."""
    out = []
    for i in (0, 1):
        s, b = _fold_bn_jnp(
            params[f"norm{i}"]["scale"], params[f"norm{i}"]["bias"],
            stats[f"norm{i}"]["mean"], stats[f"norm{i}"]["var"])
        out += [params[f"conv{i}"]["kernel"], s, b]
    return out


def make_fused_apply(model, *, h_splits: int | None = None,
                     interpret: bool = False):
    """Build ``apply_fn(variables, x) -> {"fg_logits", "peak_logits"}``
    matching ``model.apply`` in eval mode, with Pallas full-res blocks.

    ``model`` is a models.unet3d.UNet3D; raises ValueError for configs the
    fused kernel does not cover (fused_apply_supported).
    """
    cfg = model.config
    if not fused_apply_supported(cfg):
        raise ValueError(
            "fused eval apply requires norm='batch', activation='relu', "
            f"features[0]==head_features==32; got {cfg}")
    dtype = resolve(cfg.compute_dtype)
    feats = cfg.features
    kw = dict(norm=cfg.norm, num_groups=cfg.num_groups,
              activation=cfg.activation, dtype=dtype,
              param_dtype=resolve(cfg.param_dtype), conv_impl=cfg.conv_impl)

    # the mid net reuses the REAL flax modules on their parameter subtrees
    downs = [Down(feats[i + 1], dtype=dtype, conv_impl=cfg.conv_impl)
             for i in range(len(feats) - 1)]
    encs = [ConvBlock(f, **kw) for f in feats[1:-1]]
    bottleneck = ConvBlock(feats[-1], **kw)
    up_convs = [Conv3D(feats[i], (2, 2, 2), impl=cfg.conv_impl, dtype=dtype,
                       pre_upsample2x=True) for i in range(len(feats) - 1)]
    up_blocks = [ConvBlock(feats[i], **kw) for i in range(1, len(feats) - 1)]

    def sub(module, p, s=None, **akw):
        v = {"params": p}
        if s is not None:
            v["batch_stats"] = s
        return module.apply(v, **akw)

    def one(variables, x):  # (bd, bh, bw, C_in)
        params = variables["params"]
        stats = variables["batch_stats"]

        # --- enc0 (fused, chw layout). C_in is tiny: to_chw is a cheap
        # relayout (a pure reshape for C_in == 1). flat_out: the output
        # stays in the kernel's (d, 32, h*wp) layout — the decoder chain
        # below links blocks through pad_flat (one minor-dim pad copy)
        # instead of the 4-D pad+reshape relayouts (~10 ms/GB, Perfetto r4).
        dd, hh, ww = x.shape[0], x.shape[1], x.shape[2]
        wp = -(-(ww + 2 * WPAD) // 128) * 128
        x_chw = to_chw(x.astype(dtype))
        skip0_flat = fused_convblock_chw(
            x_chw, *_block_args(params["enc0"], stats["enc0"]),
            compute_dtype=cfg.compute_dtype, h_splits=h_splits,
            flat_out=True, interpret=interpret)         # (d, 32, h*wp)
        skip0 = skip0_flat.reshape(dd, 32, hh, wp)      # mid net needs 4-D

        # --- mid net in NDHWC via the flax modules (one relayout in)
        h = jnp.transpose(skip0[:, :, :, WPAD:WPAD + ww],
                          (0, 2, 3, 1))[None]           # (1, d, h, w, 32)
        skips = []
        for i in range(1, len(feats) - 1):
            h = sub(downs[i - 1], params[f"down{i-1}"], x=h)
            h = sub(encs[i - 1], params[f"enc{i}"], stats[f"enc{i}"],
                    x=h, train=False)
            skips.append(h)
        h = sub(downs[-1], params[f"down{len(feats)-2}"], x=h)
        h = sub(bottleneck, params["bottleneck"], stats["bottleneck"],
                x=h, train=False)
        for i in reversed(range(1, len(feats) - 1)):
            h = sub(up_convs[i], params[f"up{i}"]["up_conv"], x=h)
            h = jnp.concatenate([h, skips[i - 1].astype(dtype)], axis=-1)
            h = sub(up_blocks[i - 1], params[f"up{i}"]["block"],
                    stats[f"up{i}"]["block"], x=h, train=False)

        # --- up0: upsampled conv in NDHWC, then concat + block chained FLAT
        h = sub(up_convs[0], params["up0"]["up_conv"], x=h)[0]  # (d,h,w,32)
        h_flat = jnp.pad(to_chw(h.astype(dtype)),
                         ((0, 0), (0, 0), (0, 0), (WPAD, wp - ww - WPAD))
                         ).reshape(dd, 32, hh * wp)
        t = pad_flat(jnp.concatenate([h_flat, skip0_flat], axis=1), wp)
        t = fused_convblock_chw(
            t, *_block_args(params["up0"]["block"], stats["up0"]["block"]),
            compute_dtype=cfg.compute_dtype, h_splits=h_splits,
            flat_in=(hh, wp, ww), flat_out=True, interpret=interpret)
        t = fused_convblock_chw(
            pad_flat(t, wp),
            *_block_args(params["head_trunk"], stats["head_trunk"]),
            compute_dtype=cfg.compute_dtype, h_splits=h_splits,
            flat_in=(hh, wp, ww), flat_out=True, interpret=interpret)
        t = t.reshape(dd, 32, hh, wp)

        # --- 1x1x1 heads: contract the channel sublanes in chw layout
        def head(p):
            k = p["kernel"].reshape(-1).astype(dtype)      # (32,)
            b = p["bias"].astype(jnp.float32)
            logits = jnp.einsum("dchw,c->dhw", t, k,
                                preferred_element_type=jnp.float32) + b
            return logits[:, :, WPAD:WPAD + ww].astype(jnp.float32)

        return {"fg_logits": head(params["fg_head"]),
                "peak_logits": head(params["peak_head"])}

    def apply_fn(variables, x):  # (N, bd, bh, bw, C) or (N, bd, bh, bw)
        if x.ndim == 4:
            x = x[..., None]
        if x.shape[0] == 1:
            out = one(variables, x[0])
            return jax.tree.map(lambda a: a[None], out)
        return jax.lax.map(lambda b: one(variables, b), x)

    return apply_fn
