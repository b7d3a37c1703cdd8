"""Building blocks for the 3D U-Net (SURVEY.md C6).

TPU-first choices (vs. the reference's Conv3d+BatchNorm3d+trilinear-up torch
stack, per SURVEY.md L3):

* NDHWC layout — XLA's TPU conv emitter wants channels-last; it tiles the
  (spatial, C) dims onto the (8,128)/MXU lanes.
* BatchNorm with running statistics as the default norm, matching the
  reference's BatchNorm3d. This is a correctness requirement, not just
  parity: eval-mode BN is the only activation norm whose output is
  independent of the inference tile, which is what makes tiled halo-overlap
  inference voxel-exact vs. whole-volume inference (NORTH-STAR: "voxel-level
  output fidelity" under sliding-window). GroupNorm stays available for
  experiments (``norm="group"``) but is tile-dependent at inference.
  Under data parallelism BN batch statistics sync across shards via
  ``axis_name`` (lax.pmean over ICI).
* Nearest-neighbor 2x upsample + conv instead of ConvTranspose3d — lowers to a
  cheap broadcast-reshape plus a regular conv, no checkerboard artifacts.
* bf16 compute / fp32 params+norm-stats via the ``dtype``/``param_dtype``
  split.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.models.conv3d import Conv3D

Dtype = Any


def _activation(name: str) -> Callable:
    return {"relu": nn.relu, "silu": nn.silu, "gelu": nn.gelu}[name]


class EvalBatchNorm(nn.Module):
    """Inference-mode BatchNorm: frozen running stats folded to a per-channel
    affine ``x * s + b`` applied in ``dtype`` (one fused FMA, no f32
    promotion of the activation). Declares the SAME variable tree as
    ``nn.BatchNorm`` (params: scale/bias; batch_stats: mean/var, f32), so
    checkpoints and the training path are interchangeable."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        s = jnp.asarray(
            jax.lax.rsqrt(ra_var.value + self.epsilon), jnp.float32
        ) * scale.astype(jnp.float32)
        b = bias.astype(jnp.float32) - ra_mean.value * s
        return (x.astype(self.dtype) * s.astype(self.dtype)
                + b.astype(self.dtype))


class TrainBatchNorm(nn.Module):
    """Train-mode BatchNorm with bf16 folded application (r5 train-MFU fix).

    ``nn.BatchNorm(use_running_average=False, dtype=f32)`` on an f32-cast
    input materializes full f32 copies of the activation around every
    norm: the c4 train-step trace shows ~57 ms/step (43% of the 132 ms
    device step) in convert/reduce fusions from exactly this pattern.
    Here the f32 statistics are reduced DIRECTLY from the bf16 input (the
    bf16->f32 convert is exact and fuses INTO the reduction — no f32
    activation is ever stored), and the normalization collapses to a
    per-channel affine applied in the compute dtype, which XLA fuses into
    the surrounding bf16 chain (ReLU / next conv) — the train-mode analog
    of :class:`EvalBatchNorm`'s fold.

    Contract vs flax's module: SAME variable tree (params: scale/bias;
    batch_stats: mean/var, f32) so checkpoints interchange; statistics and
    running-stat updates are computed with the same formulas (mean,
    E[x^2]-mean^2 variance, ``momentum`` EMA, ``axis_name`` pmean sync) on
    the same values, so the updated stats match flax's to f32 roundoff;
    the OUTPUT differs only by bf16 rounding of the folded (scale, bias)
    — tested against flax at bf16 tolerance (tests/unit/test_model.py).
    Gradients flow through mean/var exactly as in standard train-mode BN
    (autodiff of this expression IS the BN backward)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        red = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)  # fuses into the reduces; never stored
        mean = jnp.mean(xf, axis=red)
        mean2 = jnp.mean(jnp.square(xf), axis=red)
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        a = scale.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        b = bias.astype(jnp.float32) - mean * a
        # apply in f32 ARITHMETIC with bf16 boundaries: the converts fuse
        # (no f32 tensor is stored), and — decisive for training — the
        # backward cotangents stay f32, so autodiff's per-channel
        # scale/bias-gradient reductions accumulate in f32. A bf16-applied
        # fold was measured to push those reduces to bf16 accumulation
        # (~40% scale-grad error on a 32k-element layer).
        return (xf * a + b).astype(self.dtype)


class ConvBlock(nn.Module):
    """(Conv3x3x3 -> norm -> act) twice."""

    features: int
    norm: str = "batch"
    num_groups: int = 8
    activation: str = "relu"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_axis: Optional[str] = None  # mesh axis for cross-shard stat sync
    conv_impl: str = "zdecomp"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _activation(self.activation)
        for i in range(2):
            x = Conv3D(
                self.features,
                kernel_size=(3, 3, 3),
                padding="SAME",
                use_bias=(self.norm == "none"),
                impl=self.conv_impl,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv{i}",
            )(x)
            # Train: batch statistics in fp32 for stability. Eval: BN is just
            # an affine map from frozen stats — run it in the compute dtype so
            # no fp32 round-trip materializes (the forward is HBM-bandwidth
            # bound; each avoided fp32 pass is 3x the tensor's bytes) and XLA
            # fuses it into the surrounding bf16 chain.
            if self.norm == "batch":
                if train:
                    # f32 stats reduced straight from bf16, normalization
                    # folded to a bf16 affine — see TrainBatchNorm (the
                    # flax module's f32 round-trips cost 43% of the c4
                    # train step, measured benchmarks/profile_train.py r5)
                    x = TrainBatchNorm(
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        axis_name=self.bn_axis,
                        name=f"norm{i}",
                    )(x)
                else:
                    # Eval-mode BN as a folded per-channel affine in the
                    # COMPUTE dtype. flax's nn.BatchNorm always forms
                    # `x - mean` against f32 running stats (normalization.py
                    # _normalize; force_float32_reductions only switches f32
                    # -> param_dtype, also f32 here), silently promoting the
                    # whole activation to f32 — at the single-tile flagship
                    # stack that is a 12 GB intermediate (measured as the
                    # largest allocation in an HBM-OOM'd compile) plus a
                    # 3x-bytes HBM round trip per BN. The stats are frozen
                    # constants at eval, so fold them (in f32, per-channel —
                    # C elements, free) and apply one bf16 FMA that fuses
                    # into the conv epilogue. Same fold as
                    # models.fused_eval._fold_bn_jnp.
                    x = EvalBatchNorm(
                        epsilon=1e-5,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"norm{i}",
                    )(x)
            elif self.norm == "group":
                x = nn.GroupNorm(
                    num_groups=min(self.num_groups, self.features),
                    dtype=jnp.float32,
                    param_dtype=self.param_dtype,
                    name=f"norm{i}",
                )(x.astype(jnp.float32)).astype(self.dtype)
            x = act(x)
        return x


class Down(nn.Module):
    """Stride-2 conv downsample (keeps everything on the conv unit)."""

    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    conv_impl: str = "zdecomp"

    @nn.compact
    def __call__(self, x):
        return Conv3D(
            self.features,
            kernel_size=(2, 2, 2),
            strides=(2, 2, 2),
            padding="VALID",
            impl=self.conv_impl,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="down",
        )(x)


def upsample2x(x):
    """Nearest-neighbor 2x upsample in D,H,W for NDHWC tensors.

    Broadcast-reshape only — XLA fuses it into the following conv's input.
    """
    n, d, h, w, c = x.shape
    x = x[:, :, None, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, d, 2, h, 2, w, 2, c))
    return x.reshape(n, 2 * d, 2 * h, 2 * w, c)


class Up(nn.Module):
    """Upsample 2x -> conv -> concat skip -> ConvBlock."""

    features: int
    norm: str = "batch"
    num_groups: int = 8
    activation: str = "relu"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_axis: Optional[str] = None
    conv_impl: str = "zdecomp"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        # upsample2x folds into the conv: under impl="auto" the parity
        # decomposition (conv3d.upconv2x_parity) never materializes the 2x
        # volume; other impls upsample explicitly inside Conv3D. The param
        # tree ("up_conv": kernel/bias) is identical either way.
        x = Conv3D(
            self.features,
            kernel_size=(2, 2, 2),
            padding="SAME",
            impl=self.conv_impl,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            pre_upsample2x=True,
            name="up_conv",
        )(x)
        x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
        return ConvBlock(
            self.features,
            norm=self.norm,
            num_groups=self.num_groups,
            activation=self.activation,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            bn_axis=self.bn_axis,
            conv_impl=self.conv_impl,
            name="block",
        )(x, train=train)
