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


def boundary_edges(overlap_mine: jnp.ndarray,
                   overlap_theirs: jnp.ndarray) -> jnp.ndarray:
    """(E, 2) int32 rename edges from two labelings of the SAME overlap
    plane; rows with 0 are inactive."""
    both = (overlap_mine > 0) & (overlap_theirs > 0) & (overlap_mine != overlap_theirs)
    return jnp.stack(
        [
            jnp.where(both, overlap_mine, 0).ravel(),
            jnp.where(both, overlap_theirs, 0).ravel(),
        ],
        axis=-1,
    )


def merge_boundary_labels(
    labels: jnp.ndarray,          # (Dl, Hl, W) core labels, global ids
    overlap_mine: jnp.ndarray,    # my labels for the overlap plane, or a list
    overlap_theirs=None,          # neighbor's labels for the SAME plane
    axis=None,                    # mesh axis name or tuple of names
) -> jnp.ndarray:
    """Union labels that name the same voxel differently across a shard
    boundary; returns the renamed core labels. Call inside shard_map.

    Either pass one (mine, theirs) plane pair, or — for multi-axis (z, y)
    sharding — ``overlap_mine`` as a list of (mine, theirs) pairs (one per
    sharded dimension); all edges go through ONE gathered closure so corner-
    crossing instances merge transitively."""
    if overlap_theirs is None:
        pairs = overlap_mine
    else:
        pairs = [(overlap_mine, overlap_theirs)]
    edges = jnp.concatenate([boundary_edges(m, t) for m, t in pairs], axis=0)
    all_edges = lax.all_gather(edges, axis).reshape(-1, 2)
    keys, reps = _closure_table(all_edges)
    return apply_label_map(labels, keys, reps)


def global_compact_labels(
    labels: jnp.ndarray,
    axis: str,
    max_labels_per_shard: int = 4096,
    min_size: int = 0,
) -> jnp.ndarray:
    """Rename shard-local label volumes to a globally dense 1..K numbering
    (ascending in original id, matching ops.compact_relabel's order), with an
    optional GLOBAL size filter.

    ``min_size > 0`` drops instances whose total CORE voxel count across all
    shards is below the threshold. Because cores partition the volume, the
    summed per-shard counts are exactly the single-device instance sizes, so
    filtering here (after reconciliation) matches single-device
    ``size_filter_and_compact`` even for instances spanning farther than the
    shard halo — per-shard pre-filtering could keep one side of such an
    instance and drop the other (ADVICE r1).

    Each shard contributes its (bounded) unique-label table; more than
    ``max_labels_per_shard`` distinct ids in one shard overflows the cap and
    silently drops the overflowed instances — so overflow is detected and
    surfaced via ``jax.debug.print`` (raise ``InferConfig.shard_max_labels``
    for extremely instance-dense volumes).
    """
    flat = labels.ravel()
    n = flat.shape[0]
    s = jnp.sort(flat)
    prev = jnp.concatenate([jnp.full((1,), -1, s.dtype), s[:-1]])
    first = (s != prev) & (s > 0)

    # surface cap overflow instead of silently truncating (ADVICE r1)
    n_distinct = jnp.sum(first.astype(jnp.int32))
    overflow = lax.pmax(n_distinct, axis) > max_labels_per_shard
    lax.cond(
        overflow,
        lambda c: jax.debug.print(
            "tpuseg: global_compact_labels OVERFLOW — a shard has {c} distinct "
            "labels > cap {cap}; overflowed instances are dropped. Raise "
            "InferConfig.shard_max_labels.", c=c, cap=max_labels_per_shard),
        lambda c: None,
        n_distinct,
    )

    # positions of the first occurrences, compacted into a bounded table;
    # per-entry count = next first position - my position (runs are
    # contiguous in the sorted array; unused slots get N - N = 0)
    posidx = jnp.where(first, jnp.arange(n, dtype=jnp.int32), n)
    order = jnp.sort(posidx)[:max_labels_per_shard]
    nexts = jnp.concatenate([order[1:], jnp.full((1,), n, order.dtype)])
    counts = jnp.maximum(nexts - order, 0)
    table = jnp.where(order < n, s[jnp.clip(order, 0, n - 1)], _SENTINEL)

    gt_ = lax.all_gather(table, axis).ravel()                # (nshards*cap,)
    gc_ = lax.all_gather(counts, axis).ravel()
    gtable, gcounts = lax.sort((gt_, gc_), num_keys=1)       # co-sorted by id
    gprev = jnp.concatenate([jnp.full((1,), -1, gtable.dtype), gtable[:-1]])
    valid = (gtable > 0) & (gtable < _SENTINEL)
    gnew = (gtable != gprev) & valid

    if min_size > 0:
        # total size per distinct id = segment-sum of per-shard counts
        run_id = jnp.cumsum(gnew.astype(jnp.int32))          # 1..R on valid
        totals = jnp.zeros(gtable.shape[0] + 1, jnp.int32).at[run_id].add(
            jnp.where(valid, gcounts, 0))
        kept_run = totals[run_id] >= min_size
        gnew = gnew & kept_run
        # ranks: cumsum over kept firsts; constant within a run, so any
        # entry of a kept run maps to its run's dense rank
        ranks = jnp.cumsum(gnew.astype(jnp.int32))
        entry_rank = jnp.where(kept_run & valid, ranks, 0)
    else:
        ranks = jnp.cumsum(gnew.astype(jnp.int32))
        entry_rank = jnp.where(valid, ranks, 0)

    pos = jnp.clip(jnp.searchsorted(gtable, flat), 0, gtable.shape[0] - 1)
    hit = (gtable[pos] == flat) & (flat > 0)
    return jnp.where(hit, entry_rank[pos], 0).reshape(labels.shape).astype(jnp.int32)
