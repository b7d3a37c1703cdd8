"""6-neighborhood shift helpers shared by the post-processing kernels.

All kernels in ``tpuseg.ops`` are expressed as dense, static-shape stencil
iterations over (D, H, W) volumes — the XLA-friendly replacement for the
reference's pointer-chasing scipy routines (NORTH-STAR: "iterative flood-fill
relabel, union-find connected components" as "fused on-device kernels").

A "shift by +1 along axis a" returns a volume y with ``y[v] = x[v + e_a]``
(the value of the neighbor one step in +a), edge voxels filled with ``fill``.
Implemented as slice+concat so XLA lowers it to a cheap pad/slice pair that
fuses into the surrounding elementwise work.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

#: (axis, offset) pairs of the 6-connected neighborhood.
NEIGHBORS_6: Sequence[tuple[int, int]] = (
    (0, 1), (0, -1),
    (1, 1), (1, -1),
    (2, 1), (2, -1),
)


def shift(x: jnp.ndarray, axis: int, offset: int, fill) -> jnp.ndarray:
    """y[v] = x[v + offset * e_axis]; out-of-range -> fill. |offset| == 1."""
    fill_shape = list(x.shape)
    fill_shape[axis] = 1
    pad = jnp.full(fill_shape, fill, dtype=x.dtype)
    if offset == 1:
        body = jnp.take(x, jnp.arange(1, x.shape[axis]), axis=axis)
        return jnp.concatenate([body, pad], axis=axis)
    elif offset == -1:
        body = jnp.take(x, jnp.arange(0, x.shape[axis] - 1), axis=axis)
        return jnp.concatenate([pad, body], axis=axis)
    raise ValueError(f"only unit offsets supported, got {offset}")


def linear_index(shape) -> jnp.ndarray:
    """int32 linear index volume (row-major over D,H,W)."""
    n = 1
    for s in shape:
        n *= s
    return jnp.arange(n, dtype=jnp.int32).reshape(shape)
