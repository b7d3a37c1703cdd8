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

# Plain Python int (NOT jnp.int32(...)): a module-level jax scalar would
# initialize the XLA backend at import time, which breaks the multi-host
# bootstrap (jax.distributed.initialize must run before any backend touch —
# parallel/multihost.py). Weak typing keeps every use int32, same as before.
_SENTINEL = 2**31 - 1


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


def build_local_table(core: jnp.ndarray, planes, cap: int):
    """Bounded sorted table of the distinct local label ids occurring in
    ``core`` or any of the ``planes``, with per-entry CORE voxel counts.

    The packed-id sharding scheme (see infer/sharded.py) names instances
    (shard_rank, table_position) instead of global linear voxel indices, so
    volumes larger than 2^31 voxels never materialize a >31-bit id anywhere
    (VERDICT r2 #1a). ``planes`` are the boundary-overlap planes this shard
    will send to neighbors — their ids must be packable even when they have
    no core voxels here (count 0; the owning neighbor counts them).

    Returns ``(table, counts, n_distinct)``: ``table`` is (cap,) int32 sorted
    ascending with _SENTINEL padding; ``counts`` (cap,) int32 core sizes;
    ``n_distinct`` the true distinct count (for overflow surfacing).
    """
    flat = core.ravel()
    n = flat.shape[0]
    s = jnp.sort(flat)
    prev = jnp.concatenate([jnp.full((1,), -1, s.dtype), s[:-1]])
    first = (s != prev) & (s > 0)
    posidx = jnp.where(first, jnp.arange(n, dtype=jnp.int32), n)
    full_order = jnp.sort(posidx)
    order = full_order[:cap]
    # true next-first positions (not n) so a cap overflow can't inflate the
    # last retained entry's count — same fix as global_compact_labels
    nexts = jnp.concatenate(
        [full_order[1:], jnp.full((1,), n, full_order.dtype)])[:cap]
    core_counts = jnp.maximum(nexts - order, 0).astype(jnp.int32)
    core_ids = jnp.where(order < n, s[jnp.clip(order, 0, n - 1)], _SENTINEL)

    cand = [core_ids]
    for p in planes:
        pf = jnp.sort(p.ravel())
        m = pf.shape[0]
        pprev = jnp.concatenate([jnp.full((1,), -1, pf.dtype), pf[:-1]])
        pfirst = (pf != pprev) & (pf > 0)
        ppos = jnp.where(pfirst, jnp.arange(m, dtype=jnp.int32), m)
        porder = jnp.sort(ppos)[:cap]
        cand.append(
            jnp.where(porder < m, pf[jnp.clip(porder, 0, m - 1)], _SENTINEL))

    allc = jnp.sort(jnp.concatenate(cand))
    na = allc.shape[0]
    aprev = jnp.concatenate([jnp.full((1,), -1, allc.dtype), allc[:-1]])
    afirst = (allc != aprev) & (allc > 0) & (allc < _SENTINEL)
    n_distinct = jnp.sum(afirst.astype(jnp.int32))
    apos = jnp.where(afirst, jnp.arange(na, dtype=jnp.int32), na)
    aorder = jnp.sort(apos)[:cap]
    table = jnp.where(aorder < na, allc[jnp.clip(aorder, 0, na - 1)], _SENTINEL)

    cpos = jnp.clip(jnp.searchsorted(table, core_ids), 0, cap - 1)
    chit = (table[cpos] == core_ids) & (core_ids < _SENTINEL)
    counts = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(chit, cpos, cap)
    ].add(jnp.where(chit, core_counts, 0), mode="drop")
    return table, counts, n_distinct


def rename_to_packed(arr: jnp.ndarray, table: jnp.ndarray, shard_rank,
                     cap: int) -> jnp.ndarray:
    """Rename local label ids to packed ids ``shard_rank * cap + pos + 1``
    (0 background; ids missing from the bounded table — cap overflow — also
    map to 0, matching the dropped-instance overflow semantics)."""
    pos = jnp.clip(jnp.searchsorted(table, arr), 0, table.shape[0] - 1)
    hit = (table[pos] == arr) & (arr > 0)
    return jnp.where(
        hit, shard_rank * jnp.int32(cap) + pos.astype(jnp.int32) + 1, 0
    ).astype(jnp.int32)


def packed_compact_labels(
    core_packed: jnp.ndarray,    # volume of packed ids (0 background)
    hi: jnp.ndarray,             # (cap,) global root z-plane index per entry
    lo: jnp.ndarray,             # (cap,) global in-plane linear index per entry
    counts: jnp.ndarray,         # (cap,) core voxel counts per entry
    edges,                       # (E, 2) packed-value edge list, or None
    axes,                        # mesh axis name or tuple of names
    cap: int,
    n_shards: int,
    min_size: int = 0,
) -> jnp.ndarray:
    """Union packed labels across shard boundaries, globally size-filter, and
    rename to dense 1..K ordered by each instance's minimal global root
    coordinate (hi, lo) — i.e. ascending global linear root index, WITHOUT
    ever forming the >31-bit product hi*plane + lo. This keeps the sharded
    output elementwise identical to the single-device pipeline (whose dense
    numbering ascends in root linear index) for every instance whose basin
    fits within the shard halo, on volumes far beyond 2^31 voxels
    (capacity: D < 2^31 z-planes of < 2^31 voxels each).

    ``hi``/``lo`` must be _SENTINEL on unused table slots. Call inside
    shard_map; all collectives ride the mesh ``axes``.
    """
    M = n_shards * cap
    ghi = lax.all_gather(hi, axes).reshape(M)
    glo = lax.all_gather(lo, axes).reshape(M)
    gcnt = lax.all_gather(counts, axes).reshape(M)
    valid = ghi < _SENTINEL

    # representative per entry: closure over the gathered boundary edges
    packed_vals = jnp.arange(1, M + 1, dtype=jnp.int32)
    rep = packed_vals
    if edges is not None:
        all_edges = lax.all_gather(edges, axes).reshape(-1, 2)
        keys, reps_tab = _closure_table(all_edges)
        rep = apply_label_map(rep, keys, reps_tab)
    rep = jnp.where(valid, rep, _SENTINEL)

    # sort by (rep, hi, lo): each rep-run's FIRST entry holds the group's
    # minimal (hi, lo) — the instance's global ordering key
    midx = jnp.arange(M, dtype=jnp.int32)
    srep, shi, slo, scnt, smidx = lax.sort(
        (rep, ghi, glo, gcnt, midx), num_keys=3)
    sprev = jnp.concatenate([jnp.full((1,), -1, srep.dtype), srep[:-1]])
    newg = (srep != sprev) & (srep != _SENTINEL)
    gidx = jnp.cumsum(newg.astype(jnp.int32))        # 1..G on valid entries
    svalid = srep != _SENTINEL

    totals = jnp.zeros((M + 2,), jnp.int32).at[
        jnp.where(svalid, gidx, M + 1)
    ].add(jnp.where(svalid, scnt, 0))

    keep_entry = newg & (totals[gidx] >= min_size)
    khi = jnp.where(keep_entry, shi, _SENTINEL)
    klo = jnp.where(keep_entry, slo, _SENTINEL)
    kg = jnp.where(keep_entry, gidx, 0)
    ohi, _olo, og = lax.sort((khi, klo, kg), num_keys=2)
    pos_rank = jnp.where(ohi != _SENTINEL,
                         jnp.arange(1, M + 1, dtype=jnp.int32), 0)
    rank_of_group = jnp.zeros((M + 2,), jnp.int32).at[og].max(pos_rank)
    entry_rank = jnp.where(svalid, rank_of_group[gidx], 0)

    # rename table indexed directly by packed id (positions ARE the ids)
    rename = jnp.zeros((M + 1,), jnp.int32).at[smidx + 1].set(entry_rank)
    return rename[jnp.clip(core_packed, 0, M)].astype(jnp.int32)


def packed_merge_to_coord_labels(
    core_packed: jnp.ndarray,
    hi: jnp.ndarray,             # (cap,) root coordinate high part per entry
    lo: jnp.ndarray,             # (cap,) root coordinate low part per entry
    edges,                       # (E, 2) packed-value edge list, or None
    axes,
    cap: int,
    n_shards: int,
    encode_stride: int,
) -> jnp.ndarray:
    """Union packed labels across shard boundaries and rename every group to
    the int32 linear encoding ``min(hi, lo) -> hi * encode_stride + lo + 1``
    of its minimal root coordinate.

    Used by the streamed×sharded composition (infer/streaming.py): a
    y-sharded z-chunk renames its merged instances back to chunk-local ext
    linear root ids — bitwise what the single-device chunk kernel emits for
    every basin fitting the y halo — so the host-side z-reconciliation is
    oblivious to the mesh. ``encode_stride * max(hi) + max(lo)`` must stay
    below 2^31 (the chunk fits HBM, so it does).
    """
    M = n_shards * cap
    ghi = lax.all_gather(hi, axes).reshape(M)
    glo = lax.all_gather(lo, axes).reshape(M)
    valid = ghi < _SENTINEL

    rep = jnp.arange(1, M + 1, dtype=jnp.int32)
    if edges is not None:
        all_edges = lax.all_gather(edges, axes).reshape(-1, 2)
        keys, reps_tab = _closure_table(all_edges)
        rep = apply_label_map(rep, keys, reps_tab)
    rep = jnp.where(valid, rep, _SENTINEL)

    midx = jnp.arange(M, dtype=jnp.int32)
    srep, shi, slo, smidx = lax.sort((rep, ghi, glo, midx), num_keys=3)
    sprev = jnp.concatenate([jnp.full((1,), -1, srep.dtype), srep[:-1]])
    svalid = srep != _SENTINEL
    newg = (srep != sprev) & svalid
    gidx = jnp.cumsum(newg.astype(jnp.int32))
    # first entry of each (rep, hi, lo)-sorted run carries the group minimum
    firstpos = jnp.zeros((M + 2,), jnp.int32).at[
        jnp.where(newg, gidx, M + 1)
    ].set(jnp.arange(M, dtype=jnp.int32))
    ehi = shi[firstpos[gidx]]
    elo = slo[firstpos[gidx]]
    enc = jnp.where(svalid, ehi * jnp.int32(encode_stride) + elo + 1, 0)

    rename = jnp.zeros((M + 1,), jnp.int32).at[smidx + 1].set(enc)
    return rename[jnp.clip(core_packed, 0, M)].astype(jnp.int32)


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
    from tpuseg.utils.debug import cond_print

    overflow = lax.pmax(n_distinct, axis) > max_labels_per_shard
    cond_print(
        overflow,
        "tpuseg: global_compact_labels OVERFLOW — a shard has {c} distinct "
        "labels > cap {cap}; overflowed instances are dropped. Raise "
        "InferConfig.shard_max_labels.", c=n_distinct,
        cap=max_labels_per_shard)

    # positions of the first occurrences, compacted into a bounded table;
    # per-entry count = next first position - my position (runs are
    # contiguous in the sorted array; unused slots get N - N = 0)
    posidx = jnp.where(first, jnp.arange(n, dtype=jnp.int32), n)
    full_order = jnp.sort(posidx)
    order = full_order[:max_labels_per_shard]
    # next-first positions from the UNTRUNCATED order: on cap overflow the
    # last retained entry's run ends at the next (dropped) first occurrence,
    # not at n — otherwise that entry would absorb every truncated run's
    # voxels and pass the size filter with an inflated count (ADVICE r2)
    nexts = jnp.concatenate(
        [full_order[1:], jnp.full((1,), n, full_order.dtype)]
    )[:max_labels_per_shard]
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
