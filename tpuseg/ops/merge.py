"""Saddle-ratio basin agglomeration (hierarchical-watershed merge).

Motivation (r4, measured on the GVoxel streamed fixture): a peak head whose
targets match each instance's anisotropic aspect produces FLAT z-profiles on
z-compressed blobs, and bf16 ripple on the flat top can fire two NMS seeds
~4-6 planes apart — the watershed then splits one instance into two stacked
basins (diagnosed from FP centroids: |dz| ≈ 2.5, |dyx| ≈ 0.3 voxels from the
GT center). No NMS radius separates this failure from REAL touching pairs —
intra-instance duplicate peaks can be FARTHER apart than two touching
instances' true peaks. The discriminator that works is the SADDLE: between
duplicate peaks of one instance the peak map stays near the peak value
(shallow dip), while between distinct instances it falls toward zero.

This module implements the classic prominence criterion on-device: merge
adjacent basins (a, b) when

    saddle(a, b) >= ratio * min(peak[root_a], peak[root_b])

where ``saddle(a, b)`` is the highest pass over their shared interface
(max over face-adjacent voxel pairs of min(peak both sides)) and a basin's
maximum is EXACTLY its root voxel's value (steepest-ascent basins terminate
at their local max; labels are root linear indices + 1). Merging is the
transitive closure over all passing edges (one-shot agglomeration — saddles
are not re-evaluated after merging; document when comparing to sequential
agglomeration schemes).

TPU realization (static shapes, no host): per axis, face pairs
(lo, hi, min-side-value) are key-sorted by (lo, hi, saddle) so each equal
(lo, hi) run ends at its max — the interface saddle; run-end edges
compact (one more sort) into a bounded ``max_pairs`` table; basin maxima are
two tiny gathers of ``peak[root]``; the passing edges close under a
scatter-min union-find (log rounds over the bounded table) — the same
machinery as parallel/reconcile. ``apply_merge_table`` renames a label
volume through the table with a vectorized binary search.

Opt-in via ``PostprocConfig.merge_saddle_ratio`` (0 = off, bitwise-identical
pipelines); the streamed chunk kernels apply it per extended chunk, which is
exact across chunks for instances within the halo (identical windows ⇒
identical merges — the same argument as the watershed itself).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tpuseg.ops.neighbors import shift
from tpuseg.utils.debug import cond_print

_SENT = 2**31 - 1


@partial(jax.jit, static_argnames=("max_pairs",))
def saddle_merge_edges(labels, peak_prob, ratio, max_pairs: int = 1 << 17):
    """The PASSING merge edges, without closure or apply.

    Returns ``(e_lo, e_hi)`` int32 arrays of 3*max_pairs slots (SENT where
    unused): label pairs whose interface saddle passes the ratio test. The
    streamed path feeds these (offset-lifted to global ids) straight into
    its host union-find finalize — no on-device relabel at all; the
    on-device path closes them with :func:`saddle_merge_table`.

    Candidate edges beyond ``max_pairs`` per axis are dropped
    deterministically (largest (lo, hi) pairs first); the cap is a static
    bound on DISTINCT adjacent label pairs, which is O(instances), not
    O(voxels).
    """
    n = labels.size
    flat_peak = peak_prob.astype(jnp.float32).ravel()

    # per-axis passes (a pair adjacent on several axes yields several edges;
    # it merges iff ANY copy passes, which equals testing its max-saddle —
    # and N-sized sort buffers instead of a single 3N one, which OOM'd the
    # compiler at GVoxel chunk shapes)
    def axis_edges(axis):
        nb = shift(labels, axis, 1, jnp.int32(0))
        pv = shift(peak_prob.astype(jnp.float32), axis, 1, -jnp.inf)
        m = (labels > 0) & (nb > 0) & (labels != nb)
        lo = jnp.where(m, jnp.minimum(labels, nb), _SENT).ravel()
        hi = jnp.where(m, jnp.maximum(labels, nb), _SENT).ravel()
        sad = jnp.where(
            m, jnp.minimum(peak_prob.astype(jnp.float32), pv), -jnp.inf
        ).ravel()
        # 3-KEY sort: equal (lo, hi) pairs group together with saddle
        # ASCENDING inside each run, so the run-END element carries the
        # run's max saddle directly — no segmented scan needed (an
        # associative_scan here blew up the remote compiler at GVoxel
        # chunk shapes)
        slo, shi, ssad = lax.sort((lo, hi, sad), num_keys=3, is_stable=False)
        nxt_lo = jnp.concatenate([slo[1:], jnp.full((1,), -1, slo.dtype)])
        nxt_hi = jnp.concatenate([shi[1:], jnp.full((1,), -1, shi.dtype)])
        is_edge = ((slo != nxt_lo) | (shi != nxt_hi)) & (slo != _SENT)

        # compact this axis's edges into the bounded table; surface cap
        # overflow like the shard_max_labels diagnostics (ADVICE r4 —
        # dropped merges were silent before)
        n_edges = jnp.sum(is_edge.astype(jnp.int32))
        cond_print(
            n_edges > max_pairs,
            "saddle merge: {n} distinct adjacent label pairs on axis "
            + str(axis) + " exceed max_pairs=" + str(max_pairs)
            + "; largest pairs dropped — raise PostprocConfig."
            "merge_max_pairs", n=n_edges)
        ek, eh, es = lax.sort(
            (jnp.where(is_edge, slo, _SENT), shi, ssad), num_keys=2,
            is_stable=False)
        return ek[:max_pairs], eh[:max_pairs], es[:max_pairs]

    parts = [axis_edges(a) for a in range(3)]
    e_lo = jnp.concatenate([p[0] for p in parts])
    e_hi = jnp.concatenate([p[1] for p in parts])
    e_sad = jnp.concatenate([p[2] for p in parts])
    valid = e_lo != _SENT

    # basin maxima = peak at the root voxel (label - 1); tiny gathers
    p_lo = flat_peak[jnp.clip(e_lo - 1, 0, n - 1)]
    p_hi = flat_peak[jnp.clip(e_hi - 1, 0, n - 1)]
    passing = valid & (
        e_sad >= jnp.float32(ratio) * jnp.minimum(p_lo, p_hi))
    return jnp.where(passing, e_lo, _SENT), jnp.where(passing, e_hi, _SENT)


@partial(jax.jit, static_argnames=("max_pairs",))
def saddle_merge_table(labels, peak_prob, ratio, max_pairs: int = 1 << 17):
    """Edges + union-find closure for the saddle-ratio merge.

    Returns ``(keys, roots)`` — ascending label values (SENT-padded,
    6*max_pairs slots) and the label each merges into (its union-find root,
    = min label of the merged group). ``ratio`` may be a traced scalar.
    """
    u, v = saddle_merge_edges(labels, peak_prob, ratio, max_pairs)

    # union-find closure over the passing edges (scatter-min + pointer jump
    # over the bounded key table — parallel/reconcile's algorithm)
    keys = jnp.sort(jnp.concatenate([u, v]))           # (6*max_pairs,)
    pu = jnp.searchsorted(keys, u).astype(jnp.int32)
    pv = jnp.searchsorted(keys, v).astype(jnp.int32)
    m = keys.shape[0]
    parent = jnp.arange(m, dtype=jnp.int32)
    import math

    for _ in range(max(2, int(math.ceil(math.log2(max(m, 2)))) + 1)):
        ra = parent[pu]
        rb = parent[pv]
        hi_r = jnp.maximum(ra, rb)
        lo_r = jnp.minimum(ra, rb)
        parent = parent.at[hi_r].min(jnp.where(u != _SENT, lo_r, hi_r))
        parent = parent[parent[parent]]
    roots = keys[parent]
    return keys, roots


def apply_merge_table(labels, keys, roots):
    """Rename ``labels`` through the (keys, roots) table: labels found in
    ``keys`` become their merge root, others pass through. One vectorized
    binary search over the bounded sorted table."""
    flat = labels.ravel()
    pos = jnp.clip(jnp.searchsorted(keys, flat), 0, keys.shape[0] - 1)
    hit = (keys[pos] == flat) & (flat > 0)
    out = jnp.where(hit, roots[pos], flat)
    return out.reshape(labels.shape).astype(labels.dtype)


def saddle_merge(labels, peak_prob, ratio, max_pairs: int = 1 << 17):
    """Convenience: table + apply in one call (labels in, labels out)."""
    keys, roots = saddle_merge_table(labels, peak_prob, ratio, max_pairs)
    return apply_merge_table(labels, keys, roots)
