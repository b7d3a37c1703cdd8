"""Connected components via parallel union-find (SURVEY.md C13).

NORTH-STAR: "union-find connected components" on device. The sequential
union-find of scipy.ndimage.label is replaced by the Shiloach-Vishkin-style
parallel formulation:

  hook:     for every 6-neighborhood edge (v, u) inside the mask, scatter-min
            the smaller root onto the larger root's parent slot — entire trees
            merge per round, not single voxels;
  compress: ``p = p[p]`` pointer jumping flattens the trees.

This converges in O(log N) rounds (a changed-flag ``lax.while_loop`` with a
log-based cap), with one scatter-min per direction and gathers for the jumps —
all dense, static-shape XLA ops. A padded sentinel slot absorbs background and
out-of-range edges so there is no data-dependent shape anywhere.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

from tpuseg.ops.neighbors import linear_index, shift

#: positive-direction neighbors; each undirected edge visited exactly once.
_POS_DIRS = ((0, 1), (1, 1), (2, 1))


def connected_components(mask: jnp.ndarray, jump_rounds: int = 8) -> jnp.ndarray:
    """int32 labels: min-linear-index-of-component + 1 on mask, 0 off mask.

    6-connectivity (matches scipy.ndimage.label's default structure).
    """
    shape = mask.shape
    n = mask.size
    sent = jnp.int32(n)  # sentinel slot: background / out-of-range
    idx = linear_index(shape).ravel()

    p0 = jnp.where(mask.ravel(), idx, sent)
    p0 = jnp.concatenate([p0, jnp.full((1,), sent, jnp.int32)])  # slot n -> n

    max_rounds = math.ceil(math.log2(max(n, 2))) + 4

    def compress(p):
        return lax.fori_loop(0, jump_rounds, lambda _, q: q[q], p)

    def one_round(p):
        p = compress(p)
        roots = p[:-1].reshape(shape)  # per-voxel root; == n on background
        for axis, off in _POS_DIRS:
            rn = shift(roots, axis, off, sent)
            valid = (roots < sent) & (rn < sent)
            hi = jnp.where(valid, jnp.maximum(roots, rn), sent).ravel()
            lo = jnp.where(valid, jnp.minimum(roots, rn), sent).ravel()
            p = p.at[hi].min(lo)
        return p

    def cond(state):
        i, p, changed = state
        return (i < max_rounds) & changed

    def body(state):
        i, p, _ = state
        new = one_round(p)
        return i + 1, new, jnp.any(new != p)

    _, p, _ = lax.while_loop(cond, body, (jnp.int32(0), p0, jnp.bool_(True)))
    p = compress(p)
    labels = p[:-1]
    return jnp.where(mask, labels.reshape(shape) + 1, 0).astype(jnp.int32)


def label_components(labels: jnp.ndarray, jump_rounds: int = 8) -> jnp.ndarray:
    """Connected components of a LABEL volume: edges connect 6-neighbors with
    EQUAL nonzero labels. Returns min-linear-index-of-component + 1.

    This is the validation consumer of the union-find machinery: the
    watershed construction provably yields connected instances (ascent chains
    are 6-connected paths to the root; flood absorption only attaches voxels
    adjacent to already-labeled ones; size filtering drops whole instances —
    see ARCHITECTURE.md "Why there is no CC pass in the pipeline"), and
    ``labels_are_connected`` checks that invariant on real outputs.
    """
    mask = labels > 0
    shape = mask.shape
    n = mask.size
    sent = jnp.int32(n)
    idx = linear_index(shape).ravel()

    p0 = jnp.where(mask.ravel(), idx, sent)
    p0 = jnp.concatenate([p0, jnp.full((1,), sent, jnp.int32)])

    max_rounds = math.ceil(math.log2(max(n, 2))) + 4

    def compress(p):
        return lax.fori_loop(0, jump_rounds, lambda _, q: q[q], p)

    def one_round(p):
        p = compress(p)
        roots = p[:-1].reshape(shape)
        for axis, off in _POS_DIRS:
            rn = shift(roots, axis, off, sent)
            ln = shift(labels, axis, off, jnp.int32(0))
            valid = (roots < sent) & (rn < sent) & (labels == ln)
            hi = jnp.where(valid, jnp.maximum(roots, rn), sent).ravel()
            lo = jnp.where(valid, jnp.minimum(roots, rn), sent).ravel()
            p = p.at[hi].min(lo)
        return p

    def cond(state):
        i, p, changed = state
        return (i < max_rounds) & changed

    def body(state):
        i, p, _ = state
        new = one_round(p)
        return i + 1, new, jnp.any(new != p)

    _, p, _ = lax.while_loop(cond, body, (jnp.int32(0), p0, jnp.bool_(True)))
    p = compress(p)
    return jnp.where(mask, p[:-1].reshape(shape) + 1, 0).astype(jnp.int32)


def labels_are_connected(labels) -> bool:
    """True iff every nonzero instance label forms ONE 6-connected component
    (host-side validation; used by tests and ``cli.infer --validate``)."""
    import numpy as np

    labels = np.asarray(labels)
    comps = np.asarray(label_components(jnp.asarray(labels)))
    fg = labels > 0
    pairs = np.unique(
        labels[fg].astype(np.int64) * (labels.size + 1) + comps[fg]
    )
    return len(pairs) == len(np.unique(labels[fg]))
