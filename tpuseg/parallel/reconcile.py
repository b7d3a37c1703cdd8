"""Cross-shard instance-label reconciliation (SURVEY.md §7 hard part #3 —
"the genuinely novel kernel in this build").

Shards label instances with GLOBAL root voxel indices (see infer/sharded.py),
so a basin whose peak both shards can see gets the SAME id on both — most of
the time no merging is needed at all. Two residual problems remain:

1. An instance reaching farther than the post-proc halo can be named by two
   different roots on the two sides of a shard boundary.
   -> ``merge_boundary_labels``: shards exchange their redundantly-computed
   overlap plane (``ppermute``), collect (my_name, their_name) pairs for the
   same voxels, ``all_gather`` the bounded edge table, and run a parallel
   union-find CLOSURE over label values: compact values to table positions
   (sort + searchsorted), hook positions with scatter-min, pointer-jump. The
   volume is then renamed through the closed table — a distributed union-find
   with zero host round-trips.

2. Final labels must be dense 1..K across the whole volume.
   -> ``global_compact_labels``: per-shard bounded unique tables,
   ``all_gather``, global sort + rank, searchsorted rename. Avoids any
   >32-bit arithmetic and any volume-sized gather.

All shapes static; all collectives are XLA collectives over the mesh axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

_SENTINEL = jnp.int32(2**31 - 1)


def _closure_table(edges: jnp.ndarray):
    """Union-find closure over an (E, 2) int32 edge list of label VALUES.

    Inactive edges are rows containing 0. Returns (keys, reps): sorted value
    table (2E,) and the canonical (minimal reachable) value for each key.
    """
    e = edges.shape[0]
    u, v = edges[:, 0], edges[:, 1]
    active = (u > 0) & (v > 0)

    flat = jnp.concatenate([jnp.where(active, u, _SENTINEL),
                            jnp.where(active, v, _SENTINEL)])
    keys = jnp.sort(flat)                                   # (2E,) ascending

    # first-occurrence position of each edge endpoint in the key table
    pu = jnp.searchsorted(keys, u)
    pv = jnp.searchsorted(keys, v)
    dummy = 2 * e  # extra slot absorbing inactive edges
    hi = jnp.where(active, jnp.maximum(pu, pv), dummy)
    lo = jnp.where(active, jnp.minimum(pu, pv), dummy)

    parent0 = jnp.arange(2 * e + 1, dtype=jnp.int32)
    rounds = max(2, math.ceil(math.log2(max(2 * e, 2))) + 1)

    def body(_, parent):
        ra = parent[hi]
        rb = parent[lo]
        h = jnp.maximum(ra, rb)
        l = jnp.minimum(ra, rb)
        parent = parent.at[h].min(l)
        for _ in range(2):
            parent = parent[parent]
        return parent

    parent = lax.fori_loop(0, rounds, body, parent0)
    # positions sorted by value => smaller position <=> smaller-or-equal value
    reps = keys[parent[:-1]]
    return keys, reps


def apply_label_map(labels: jnp.ndarray, keys: jnp.ndarray, reps: jnp.ndarray):
    """Rename ``labels`` through the (keys -> reps) table; misses unchanged."""
    pos = jnp.clip(jnp.searchsorted(keys, labels), 0, keys.shape[0] - 1)
    hit = keys[pos] == labels
    return jnp.where(hit & (labels > 0), reps[pos], labels)


def merge_boundary_labels(
    labels: jnp.ndarray,        # (Dl, H, W) core labels, global ids
    overlap_mine: jnp.ndarray,  # (H, W) my labels for the overlap plane
    overlap_theirs: jnp.ndarray,  # (H, W) neighbor's labels for the SAME plane
    axis: str,
) -> jnp.ndarray:
    """Union labels that name the same voxel differently across a shard
    boundary; returns the renamed core labels. Call inside shard_map."""
    both = (overlap_mine > 0) & (overlap_theirs > 0) & (overlap_mine != overlap_theirs)
    edges = jnp.stack(
        [
            jnp.where(both, overlap_mine, 0).ravel(),
            jnp.where(both, overlap_theirs, 0).ravel(),
        ],
        axis=-1,
    )
    all_edges = lax.all_gather(edges, axis).reshape(-1, 2)
    keys, reps = _closure_table(all_edges)
    return apply_label_map(labels, keys, reps)


def global_compact_labels(
    labels: jnp.ndarray, axis: str, max_labels_per_shard: int = 4096
) -> jnp.ndarray:
    """Rename shard-local label volumes to a globally dense 1..K numbering
    (ascending in original id, matching ops.compact_relabel's order).

    Each shard contributes its (bounded) unique-label table; overflow beyond
    ``max_labels_per_shard`` distinct ids per shard is an explicit cap —
    raise it in InferConfig for extremely instance-dense volumes.
    """
    flat = labels.ravel()
    s = jnp.sort(flat)
    prev = jnp.concatenate([jnp.full((1,), -1, s.dtype), s[:-1]])
    first = (s != prev) & (s > 0)
    # positions of the first occurrences, compacted into a bounded table
    posidx = jnp.where(first, jnp.arange(s.shape[0], dtype=jnp.int32), s.shape[0])
    order = jnp.sort(posidx)[:max_labels_per_shard]
    table = jnp.where(
        order < s.shape[0], s[jnp.clip(order, 0, s.shape[0] - 1)], _SENTINEL
    )

    gtable = jnp.sort(lax.all_gather(table, axis).ravel())   # (n*cap,)
    gprev = jnp.concatenate([jnp.full((1,), -1, gtable.dtype), gtable[:-1]])
    gnew = (gtable != gprev) & (gtable > 0) & (gtable < _SENTINEL)
    ranks = jnp.cumsum(gnew.astype(jnp.int32))

    pos = jnp.clip(jnp.searchsorted(gtable, flat), 0, gtable.shape[0] - 1)
    hit = (gtable[pos] == flat) & (flat > 0)
    return jnp.where(hit, ranks[pos], 0).reshape(labels.shape).astype(jnp.int32)
