"""Train-mode U-Net forward with the full-resolution convs on the packed
Mosaic training kernel (ops/pallas_convtrain.py) — the fwd+bwd half of the
NORTH-STAR clause "forward/backward lowers to XLA/Pallas 3D conv kernels in
bf16" (VERDICT r4 "next" #1).

``make_fused_train_apply(model)`` returns

    apply_fn(variables, x) -> (out_dict, new_batch_stats)

with the same results contract as ``model.apply(variables, x, train=True,
mutable=["batch_stats"])`` (fg/peak f32 logits + updated running stats):

* the six full-res convs (enc0, up0.block, head_trunk) run as
  ``conv3x3_p2`` custom_vjp Pallas kernels in the packed flat layout
  (two samples per 128-lane segment at W=64 — see pallas_convtrain);
* train-mode BatchNorm runs in XLA on the flat (P, D, C, S) layout — C in
  sublanes is the layout where XLA's per-channel reduces/affines are
  efficient — with the same f32 statistics/EMA formulas as
  models.blocks.TrainBatchNorm (bitwise-same value set, different
  summation order: stats match to f32 roundoff);
* the mid net (down0 .. up1) reuses the EXACT flax modules on their
  parameter subtrees, train-mode, so deeper levels keep their autodiff
  path and stat updates;
* only two relayouts per step: skip0 -> NDHWC for the mid net, and
  up0.up_conv out -> packed for the decoder concat (same seams as
  models/fused_eval.py).

Gradients: JAX differentiates straight through this function — the Pallas
convs via their custom_vjp (dx kernel + XLA tap-dot dw), everything else
by autodiff. Parity with the flax train path (values, grads, stats) is
asserted in tests/unit/test_fused_train.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpuseg.core import ModelConfig
from tpuseg.core.dtypes import resolve
from tpuseg.models.blocks import ConvBlock, Down
from tpuseg.models.conv3d import Conv3D
from tpuseg.models.unet3d import UNet3D
from tpuseg.ops.pallas_convtrain import (LANE, conv3x3_p2,
                                         convtrain_supported, pack2_w,
                                         unpack2_w)


def fused_train_supported(config: ModelConfig, batch: int, patch) -> bool:
    """Kernel family check: flagship CO=32 full-res blocks, BatchNorm,
    ReLU, and a (batch, patch) the lane packing covers."""
    return (
        config.norm == "batch"
        and config.activation == "relu"
        and len(config.features) >= 2
        and config.features[0] == 32
        and config.head_features == 32
        and convtrain_supported(batch, patch, config.in_channels, 32)
    )


def _bn_relu_flat(y, params, stats, axis_name: Optional[str],
                  momentum: float = 0.9, eps: float = 1e-5):
    """Train-mode BN + ReLU on the flat (P, D, C, S) layout. Returns
    (bf16 activations, {"mean","var"} updated running stats). Same math as
    models.blocks.TrainBatchNorm (f32 stats from the bf16 tensor, f32-arith
    folded application so gradient reductions accumulate f32)."""
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 3))
    mean2 = jnp.mean(jnp.square(yf), axis=(0, 1, 3))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean2 = jax.lax.pmean(mean2, axis_name)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    a = params["scale"].astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    b = params["bias"].astype(jnp.float32) - mean * a
    out = jnp.maximum(yf * a[None, None, :, None] + b[None, None, :, None],
                      0.0).astype(y.dtype)
    new = {
        "mean": momentum * stats["mean"] + (1.0 - momentum) * mean,
        "var": momentum * stats["var"] + (1.0 - momentum) * var,
    }
    return out, new


def make_fused_train_apply(model: UNet3D, *, axis_name: Optional[str] = None,
                           interpret: bool = False):
    """Build the fused train-mode ``apply_fn(variables, x) -> (out,
    new_batch_stats)``; raises ValueError at call time for (batch, patch)
    shapes outside ``fused_train_supported``.

    ``axis_name``: DP mesh axis for cross-shard BN stat sync (the fused
    twin of UNet3D's ``bn_axis``)."""
    cfg = model.config
    if not (cfg.norm == "batch" and cfg.activation == "relu"
            and cfg.features[0] == 32 and cfg.head_features == 32):
        raise ValueError(f"fused train apply requires the flagship family; "
                         f"got {cfg}")
    dtype = resolve(cfg.compute_dtype)
    feats = cfg.features
    kw = dict(norm=cfg.norm, num_groups=cfg.num_groups,
              activation=cfg.activation, dtype=dtype,
              param_dtype=resolve(cfg.param_dtype), bn_axis=axis_name,
              conv_impl=cfg.conv_impl)

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
            out, mut = module.apply(v, mutable=["batch_stats"], **akw)
            return out, mut["batch_stats"]
        return module.apply(v, **akw), None

    def fused_block(xf, p, s, valid_w):
        """(conv3x3 -> BN(train) -> ReLU) x2 on the flat layout."""
        new = {}
        y = conv3x3_p2(xf, p["conv0"]["kernel"].astype(dtype), valid_w,
                       interpret, cfg.compute_dtype)
        y, new["norm0"] = _bn_relu_flat(y, p["norm0"], s["norm0"], axis_name)
        y = conv3x3_p2(y, p["conv1"]["kernel"].astype(dtype), valid_w,
                       interpret, cfg.compute_dtype)
        y, new["norm1"] = _bn_relu_flat(y, p["norm1"], s["norm1"], axis_name)
        return y, new

    def apply_fn(variables, x):
        params = variables["params"]
        stats = variables["batch_stats"]
        if x.ndim == 4:
            x = x[..., None]
        n, dd, hh, ww, ci = x.shape
        if not fused_train_supported(cfg, n, (dd, hh, ww)) or ci != cfg.in_channels:
            raise ValueError(
                f"fused train apply does not cover batch={n} patch="
                f"{(dd, hh, ww)} ci={ci}; guard with fused_train_supported")
        new_stats = {}

        # --- enc0 fused (packed flat layout) ---
        xf = pack2_w(x.astype(dtype))                 # (P, D, Ci, S)
        skip0, new_stats["enc0"] = fused_block(
            xf, params["enc0"], stats["enc0"], ww)

        # --- mid net on NDHWC via the real flax modules ---
        h = unpack2_w(skip0, n, ww)                   # (N, D, H, W, 32)
        skips = []
        for i in range(1, len(feats) - 1):
            h = sub(downs[i - 1], params[f"down{i-1}"], x=h)[0]
            h, st = sub(encs[i - 1], params[f"enc{i}"], stats[f"enc{i}"],
                        x=h, train=True)
            new_stats[f"enc{i}"] = st
            skips.append(h)
        h = sub(downs[-1], params[f"down{len(feats)-2}"], x=h)[0]
        h, st = sub(bottleneck, params["bottleneck"], stats["bottleneck"],
                    x=h, train=True)
        new_stats["bottleneck"] = st
        for i in reversed(range(1, len(feats) - 1)):
            h = sub(up_convs[i], params[f"up{i}"]["up_conv"], x=h)[0]
            h = jnp.concatenate([h, skips[i - 1].astype(dtype)], axis=-1)
            h, st = sub(up_blocks[i - 1], params[f"up{i}"]["block"],
                        stats[f"up{i}"]["block"], x=h, train=True)
            new_stats[f"up{i}"] = {"block": st}

        # --- up0: flax up_conv, then fused concat block + head trunk ---
        h = sub(up_convs[0], params["up0"]["up_conv"], x=h)[0]  # (N,D,H,W,32)
        t = jnp.concatenate([pack2_w(h.astype(dtype)), skip0], axis=2)
        t, st = fused_block(t, params["up0"]["block"],
                            stats["up0"]["block"], ww)
        new_stats["up0"] = {"block": st}
        t, new_stats["head_trunk"] = fused_block(
            t, params["head_trunk"], stats["head_trunk"], ww)

        # --- 1x1x1 heads: channel contraction in the flat layout ---
        def head(p):
            k = p["kernel"].reshape(-1).astype(dtype)          # (32,)
            b = p["bias"].astype(jnp.float32)
            logits = jnp.einsum("pdcs,c->pds", t, k,
                                preferred_element_type=jnp.float32) + b
            return unpack2_w(logits[:, :, None, :], n, ww)[..., 0]

        out = {"fg_logits": head(params["fg_head"]),
               "peak_logits": head(params["peak_head"])}
        return out, new_stats

    return apply_fn
