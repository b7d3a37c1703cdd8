"""3D max-pool peak NMS — seed detection (SURVEY.md C11).

NORTH-STAR: "3D max-pool NMS for seeds". The reference does this with
scipy-style ``maximum_filter``-equality on CPU; here it is a single
``lax.reduce_window`` max-pool plus elementwise compares, fully inside jit.

Plateau handling: on exact ties inside an NMS window, only the candidate with
the largest linear index within each window survives, so the op is
deterministic (SURVEY.md §7 "hard parts" #1 — deterministic tie-break).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpuseg.ops.neighbors import linear_index


def radius3(radius) -> tuple:
    """Normalize an NMS radius to a per-axis (rz, ry, rx) tuple.

    Anisotropic microscopy (z compressed by the PSF) needs anisotropic
    suppression footprints: with an isotropic radius, the z-separation of
    touching z-stacked instances can sit inside the window and NMS keeps
    only one of their peaks (measured on the aniso-0.35 bench fixture:
    ~19% of instances undetected at radius 2 isotropic).
    """
    if isinstance(radius, (tuple, list)):
        rz, ry, rx = (int(r) for r in radius)
        return rz, ry, rx
    return (int(radius),) * 3


def _maxpool_same(x: jnp.ndarray, radius, init) -> jnp.ndarray:
    rz, ry, rx = radius3(radius)
    return lax.reduce_window(
        x, init, lax.max,
        window_dimensions=(2 * rz + 1, 2 * ry + 1, 2 * rx + 1),
        window_strides=(1, 1, 1),
        padding="SAME",
    )


def peak_nms(peak_prob: jnp.ndarray, threshold: float, radius=2) -> jnp.ndarray:
    """Boolean seed mask: local maxima of ``peak_prob`` above ``threshold``.

    Args:
      peak_prob: (D, H, W) float map (post-sigmoid).
      threshold: minimum peak value for a seed.
      radius:    NMS half-window — int or per-axis (rz, ry, rx); a seed is
                 the max within its (2rz+1)x(2ry+1)x(2rx+1) window.
    """
    peak_prob = peak_prob.astype(jnp.float32)
    mx = _maxpool_same(peak_prob, radius, -jnp.inf)
    cand = (peak_prob >= threshold) & (peak_prob >= mx)
    # tie-break plateaus by max linear index within the window
    idx = linear_index(peak_prob.shape)
    cand_idx = jnp.where(cand, idx, -1)
    mi = _maxpool_same(cand_idx, radius, jnp.int32(-1))
    return cand & (cand_idx == mi)


def seed_labels_from_peaks(
    peak_prob: jnp.ndarray, threshold: float, radius=2
) -> jnp.ndarray:
    """int32 label volume: linear_index+1 at each NMS seed, 0 elsewhere.

    Labels are globally unique by construction (they ARE voxel coordinates),
    which is what makes the cross-shard reconciliation of config 5 possible
    without a host round-trip.
    """
    seeds = peak_nms(peak_prob, threshold, radius)
    idx = linear_index(peak_prob.shape)
    return jnp.where(seeds, idx + 1, 0).astype(jnp.int32)
