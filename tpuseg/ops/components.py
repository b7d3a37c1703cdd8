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
