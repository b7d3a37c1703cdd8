"""Weak-target synthesis: boxes/centers -> training targets (SURVEY.md C5).

NORTH-STAR: "peak/box-style losses" — the weak supervision of Dong et al.
(MICCAI 2019): no voxel-wise masks, only instance center points and 3D
bounding boxes. From those this module builds, fully inside jit:

  peak_target: max over instances of a unit gaussian at each center — the
               regression target of the peak/center head.
  fg_target:   1 inside each box eroded by ``margin`` (confident foreground),
               0 outside every box dilated by ``margin`` (confident
               background).
  fg_weight:   0 on the uncertainty ring between eroded and dilated boxes
               (those voxels are excluded from the fg loss), 1 elsewhere.

Annotations arrive padded to a static ``max_instances`` with a validity mask
(static shapes under jit).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from jax import lax


def _coords(shape):
    zz = lax.broadcasted_iota(jnp.float32, shape, 0)
    yy = lax.broadcasted_iota(jnp.float32, shape, 1)
    xx = lax.broadcasted_iota(jnp.float32, shape, 2)
    return zz, yy, xx


def make_weak_targets(
    centers: jnp.ndarray,     # (M, 3) float32, padded
    half_sizes: jnp.ndarray,  # (M, 3) float32, padded
    valid: jnp.ndarray,       # (M,) bool
    shape,                    # static (D, H, W)
    peak_sigma: float = 3.0,
    margin: float = 2.0,
    aniso_sigma: bool = False,
) -> Dict[str, jnp.ndarray]:
    zz, yy, xx = _coords(shape)
    pos = jnp.stack([zz, yy, xx], axis=-1)                    # (D,H,W,3)
    c = centers.astype(jnp.float32)[:, None, None, None, :]   # (M,1,1,1,3)
    h = half_sizes.astype(jnp.float32)[:, None, None, None, :]
    vmask = valid[:, None, None, None]

    delta = jnp.abs(pos[None] - c)                            # (M,D,H,W,3)

    if aniso_sigma:
        # Per-instance anisotropic gaussian: scale sigma along each axis by
        # the instance's box aspect (geomean-normalized so isotropic boxes
        # reproduce peak_sigma exactly). On z-compressed acquisitions the
        # peak target then stays as flat as the instance — an isotropic
        # sigma wider than the instance fuses touching z-pairs' targets
        # into one blurred blob the peak head cannot separate.
        hsafe = jnp.maximum(half_sizes.astype(jnp.float32), 1e-3)  # (M,3)
        aspect = hsafe / jnp.exp(
            jnp.mean(jnp.log(hsafe), axis=1, keepdims=True))
        sig = peak_sigma * aspect[:, None, None, None, :]     # (M,1,1,1,3)
        d2s = jnp.sum(((pos[None] - c) / sig) ** 2, axis=-1)  # (M,D,H,W)
        g = jnp.exp(-0.5 * d2s)
    else:
        d2 = jnp.sum((pos[None] - c) ** 2, axis=-1)           # (M,D,H,W)
        g = jnp.exp(-0.5 * d2 / (peak_sigma**2))
    peak = jnp.max(jnp.where(vmask, g, 0.0), axis=0)

    inner = jnp.all(delta <= jnp.maximum(h - margin, 1.0), axis=-1) & vmask
    outer = jnp.all(delta <= (h + margin), axis=-1) & vmask
    any_inner = jnp.any(inner, axis=0)
    any_outer = jnp.any(outer, axis=0)

    fg_target = any_inner.astype(jnp.float32)
    # certain: inside an eroded box, or outside all dilated boxes
    fg_weight = (any_inner | (~any_outer)).astype(jnp.float32)
    return {"peak": peak, "fg": fg_target, "fg_weight": fg_weight}
