"""TPU-fast 3D convolution: z-decomposition into 2D convs.

Measured on a v5e: XLA's native 3D conv lowering runs the default U-Net
forward at ~1.7% MXU utilization (218 ms for a 4x(64,160,160) block). The
same convolution expressed as a sum of ``kd`` 2D convolutions — one per
z-tap, each over the merged (N*D, H, W, C) batch — hits the TPU's
well-optimized NHWC 2D conv path:

    y[:, z] = sum_dz conv2d(x[:, z*sz + dz], kernel[dz])

This is EXACTLY the same linear map with the same (kd, kh, kw, Ci, Co)
parameter layout as flax ``nn.Conv`` (so checkpoints are interchangeable);
only the compute schedule differs. ``Conv3D`` is a drop-in module with flax
Conv's param naming (kernel/bias) and XLA's SAME padding semantics
(lo = floor((k-1)/2), hi = ceil((k-1)/2)).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any


def conv3d_zpack(
    x: jnp.ndarray,        # (N, D, H, W, Ci)
    kernel: jnp.ndarray,   # (kd, kh, kw, Ci, Co)
    strides: Tuple[int, int, int] = (1, 1, 1),
    padding: str = "SAME",
) -> jnp.ndarray:
    """z-taps folded into channels: ONE 2D conv with Ci*kd input channels.

    vs. zdecomp's kd separate convs, this triples the contraction depth
    (K = kh*kw*kd*Ci), which matters on the MXU when Ci is small (the
    full-res U-Net levels have Ci=32 => K jumps 288 -> 864). Costs one extra
    materialized concat of the shifted planes; identical math.
    """
    n, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    sz, sy, sx = strides

    if padding == "SAME":
        lo = (kd - 1) // 2
        hi = kd - 1 - lo
        if lo or hi:
            x = jnp.pad(x, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
    elif padding != "VALID":
        raise ValueError(f"unsupported padding {padding!r}")

    dp = x.shape[1]
    do = (dp - kd) // sz + 1

    taps = []
    for dz in range(kd):
        limit = dz + sz * (do - 1) + 1
        taps.append(lax.slice_in_dim(x, dz, limit, stride=sz, axis=1))
    xcat = jnp.concatenate(taps, axis=-1)               # (N, do, H, W, kd*Ci)
    # channel blocks are ordered by dz, so fold kd into the I axis first:
    k2d = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(kh, kw, kd * ci, co)
    y = lax.conv_general_dilated(
        xcat.reshape(n * do, h, w, kd * ci),
        k2d,
        window_strides=(sy, sx),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(n, do, y.shape[1], y.shape[2], co)


def conv3d_s2patch(
    x: jnp.ndarray,        # (N, D, H, W, Ci)
    kernel: jnp.ndarray,   # (2, 2, 2, Ci, Co)
    strides: Tuple[int, int, int] = (2, 2, 2),
    padding: str = "SAME",
) -> jnp.ndarray:
    """Stride-2 2x2x2 conv as space-to-depth + ONE dense matmul.

    A k=2, s=2 conv has non-overlapping input windows, so it is exactly a
    (8*Ci -> Co) pointwise contraction over 2x2x2 patches. The v5e sweep
    (benchmarks/conv_schedule_bench.py) measured the general schedules at
    0.4-0.5% MFU on the U-Net's down convs (32.6 ms for down0's 34 GFLOP
    under zpack); this reshape+matmul form runs the same op near the matmul
    rate. Math is identical: for odd dims, SAME pads hi with zeros exactly
    like XLA's stride-2 SAME.
    """
    if tuple(strides) != (2, 2, 2) or kernel.shape[:3] != (2, 2, 2):
        raise ValueError("s2patch requires kernel (2,2,2) with strides (2,2,2)")
    n, d, h, w, ci = x.shape
    co = kernel.shape[-1]
    pads = [(0, d % 2), (0, h % 2), (0, w % 2)]
    if any(p != (0, 0) for p in pads):
        if padding != "SAME":
            raise ValueError("s2patch VALID requires even spatial dims")
        x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
        d, h, w = x.shape[1:4]
    x = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, ci)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)       # (N, do, ho, wo, 2,2,2, Ci)
    x = x.reshape(n, d // 2, h // 2, w // 2, 8 * ci)
    k2 = kernel.reshape(8 * ci, co)               # same (dz,dy,dx,ci) order
    return lax.dot_general(
        x, k2, dimension_numbers=(((4,), (0,)), ((), ())))


def upconv2x_parity(
    x: jnp.ndarray,        # (N, D, H, W, Ci)
    kernel: jnp.ndarray,   # (2, 2, 2, Ci, Co)
) -> jnp.ndarray:
    """conv2x2x2_SAME(nearest_upsample2x(x)) computed WITHOUT materializing
    the upsampled volume: 8 parity outputs at the LOW resolution, then one
    interleave.

    For output index 2i+a along an axis, the SAME (lo=0, hi=1) 2-tap window
    over the nearest-upsampled signal reads up[2i+a] and up[2i+a+1]:
      a=0 -> x[i] twice  -> one tap with summed weights (k0+k1)
      a=1 -> x[i], x[i+1] -> two taps [k0, k1] (hi zero-padded)
    so each of the 8 (az,ay,ax) parities is a (1|2)^3-kernel conv of x, and
    the useful MACs drop from 64*Ci*Co to 27*Ci*Co per low-res voxel (2.4x).
    Measured v5e (up0: 64->32 at (112,272,272) out): 21.3 ms as
    upsample+zpack-conv -> ~4 ms this way. Exactly equal (same adds in a
    different order) up to the usual bf16 reassociation.
    """
    n, d, h, w, ci = x.shape
    co = kernel.shape[-1]
    parts = []
    for az in (0, 1):
        for ay in (0, 1):
            for ax in (0, 1):
                k = kernel
                taps = []
                for axis, a in ((0, az), (1, ay), (2, ax)):
                    if a == 0:  # both window taps read the same voxel
                        k = k.sum(axis=axis, keepdims=True)
                    # a == 1 keeps both taps: x[i], x[i+1] (hi pad below)
                xa = x
                pad = ((0, 0), (0, az), (0, ay), (0, ax), (0, 0))
                if az or ay or ax:
                    xa = jnp.pad(xa, pad)
                y = lax.conv_general_dilated(
                    xa, k, window_strides=(1, 1, 1), padding="VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                parts.append(y)
    y = jnp.stack(parts, axis=-2)                 # (N, d, h, w, 8, Co)
    y = y.reshape(n, d, h, w, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)       # (N, d,2, h,2, w,2, Co)
    return y.reshape(n, 2 * d, 2 * h, 2 * w, co)


def conv3d_zdecomp(
    x: jnp.ndarray,        # (N, D, H, W, Ci)
    kernel: jnp.ndarray,   # (kd, kh, kw, Ci, Co)
    strides: Tuple[int, int, int] = (1, 1, 1),
    padding: str = "SAME",
) -> jnp.ndarray:
    n, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    sz, sy, sx = strides

    if padding == "SAME":
        lo = (kd - 1) // 2
        hi = kd - 1 - lo
        if lo or hi:
            x = jnp.pad(x, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
    elif padding != "VALID":
        raise ValueError(f"unsupported padding {padding!r}")

    dp = x.shape[1]
    do = (dp - kd) // sz + 1

    out = None
    for dz in range(kd):
        limit = dz + sz * (do - 1) + 1
        xs = lax.slice_in_dim(x, dz, limit, stride=sz, axis=1)  # (N, do, H, W, Ci)
        xs2 = xs.reshape(n * do, h, w, ci)
        y = lax.conv_general_dilated(
            xs2,
            kernel[dz],
            window_strides=(sy, sx),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(n, do, ho, wo, co)


def _auto_impl(kernel_size, strides, ci) -> str:
    """Measured per-shape schedule choice (benchmarks/conv_schedule_bench.py,
    v5e, flagship tile): k=s=2 convs are pathological under every general
    schedule (0.4-1.4% MFU) -> s2patch; 1-2-channel inputs prefer zpack
    (1.3 ms vs zdecomp 4.4 / native 20.3 on enc0_c1); everything else
    prefers zdecomp (wins every 3x3x3 case with ci >= 32)."""
    if tuple(kernel_size) == (2, 2, 2) and tuple(strides) == (2, 2, 2):
        return "s2patch"
    if ci < 8:
        return "zpack"
    return "zdecomp"


class Conv3D(nn.Module):
    """Drop-in 3D conv with flax nn.Conv's parameter layout, computed via
    z-decomposed 2D convs (``impl="zdecomp"``), z-taps folded into channels
    (``"zpack"``), patch-matmul for k=s=2 (``"s2patch"``), XLA's native 3D
    conv (``"native"``), or the measured per-shape best (``"auto"``).

    ``pre_upsample2x``: compute conv(nearest_upsample2x(x)) — under "auto"
    via the parity decomposition (upconv2x_parity) without materializing the
    upsampled volume; other impls materialize upsample2x(x) first. The
    parameter tree is identical either way."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    impl: str = "zdecomp"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    pre_upsample2x: bool = False

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kd, kh, kw, ci, self.features),
            self.param_dtype,
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        impl = self.impl
        if self.pre_upsample2x:
            if (impl == "auto" and (kd, kh, kw) == (2, 2, 2)
                    and tuple(self.strides) == (1, 1, 1)
                    and self.padding == "SAME"):
                impl = "upconv2x_parity"
            else:
                from tpuseg.models.blocks import upsample2x

                x = upsample2x(x)
        if impl == "auto":
            impl = _auto_impl(self.kernel_size, self.strides, ci)
        if impl == "upconv2x_parity":
            y = upconv2x_parity(x, kernel)
        elif impl == "s2patch":
            y = conv3d_s2patch(x, kernel, tuple(self.strides), self.padding)
        elif impl == "zdecomp":
            y = conv3d_zdecomp(x, kernel, tuple(self.strides), self.padding)
        elif impl == "zpack":
            y = conv3d_zpack(x, kernel, tuple(self.strides), self.padding)
        elif impl == "native":
            y = lax.conv_general_dilated(
                x, kernel,
                window_strides=tuple(self.strides),
                padding=self.padding,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        else:
            raise ValueError(f"unknown conv impl {self.impl!r}")
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y
