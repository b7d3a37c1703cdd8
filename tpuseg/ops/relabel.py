"""Compact relabeling: sparse root-index labels -> dense 1..K (SURVEY.md C13).

The watershed/CC kernels emit labels that are root linear indices + 1 (sparse
but globally unique). The reference emits dense sequential ids; this op closes
that gap fully on device with static shapes: sort the flattened labels, mark
first-occurrences of nonzero values, prefix-sum those marks into dense ranks,
then map every voxel through searchsorted. O(N log N), no host round-trip, no
dynamic shapes — the jit-compatible replacement for np.unique(return_inverse).
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_relabel(labels: jnp.ndarray) -> jnp.ndarray:
    """Renumber labels to 1..K preserving order of label value; 0 stays 0."""
    flat = labels.ravel()
    s = jnp.sort(flat)
    prev = jnp.concatenate([jnp.full((1,), -1, s.dtype), s[:-1]])
    is_new = (s != prev) & (s > 0)
    rank = jnp.cumsum(is_new.astype(labels.dtype))          # dense id at each sorted pos
    pos = jnp.searchsorted(s, flat, side="left")             # first occurrence of value
    out = jnp.where(flat > 0, rank[pos], 0)
    return out.reshape(labels.shape).astype(labels.dtype)
