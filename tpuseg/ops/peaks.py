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


def _maxpool_same(x: jnp.ndarray, radius: int, init) -> jnp.ndarray:
    k = 2 * radius + 1
    return lax.reduce_window(
        x, init, lax.max,
        window_dimensions=(k, k, k),
        window_strides=(1, 1, 1),
        padding="SAME",
    )


def peak_nms(peak_prob: jnp.ndarray, threshold: float, radius: int = 2) -> jnp.ndarray:
    """Boolean seed mask: local maxima of ``peak_prob`` above ``threshold``.

    Args:
      peak_prob: (D, H, W) float map (post-sigmoid).
      threshold: minimum peak value for a seed.
      radius:    NMS half-window; a seed is the max within its (2r+1)^3 window.
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
    peak_prob: jnp.ndarray, threshold: float, radius: int = 2
) -> jnp.ndarray:
    """int32 label volume: linear_index+1 at each NMS seed, 0 elsewhere.

    Labels are globally unique by construction (they ARE voxel coordinates),
    which is what makes the cross-shard reconciliation of config 5 possible
    without a host round-trip.
    """
    seeds = peak_nms(peak_prob, threshold, radius)
    idx = linear_index(peak_prob.shape)
    return jnp.where(seeds, idx + 1, 0).astype(jnp.int32)
