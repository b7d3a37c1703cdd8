"""Halo exchange over the spatial mesh axis (NORTH-STAR config 5:
"GSPMD-sharded halo-exchange inference"; SURVEY.md §2 — the volumetric analog
of context/sequence parallelism).

Each shard owns a z-slab of the volume; conv receptive fields need ``halo``
planes of context from each z-neighbor. ``lax.ppermute`` moves the boundary
slabs over ICI (the XLA collective standing in for any NCCL send/recv); the
outermost shards replicate their own edge plane, matching the edge-padding
convention of infer/tiles.py.

Used inside ``shard_map`` bodies — operands are the per-shard local blocks.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def exchange_halo(slab: jnp.ndarray, halo: int, axis: str,
                  dim: int = 0) -> jnp.ndarray:
    """Extend ``slab`` by ``halo`` planes of neighbor context along spatial
    dimension ``dim``, exchanged over mesh axis ``axis``.

    Shard i receives the last ``halo`` planes of shard i-1 before and the
    first ``halo`` planes of shard i+1 after. Edge shards edge-replicate
    (matches ``jnp.pad(mode="edge")``). 2-D (z, y) sharding composes two
    calls — the second exchange carries the first's halo planes along, so
    diagonal-corner context arrives transitively through the neighbors.
    """
    if halo > slab.shape[dim]:
        raise ValueError(
            f"halo ({halo}) exceeds the local slab extent "
            f"({slab.shape[dim]}) on dim {dim}; a single ppermute only "
            "reaches the immediate neighbor — use a bigger slab or fewer "
            "shards on this axis"
        )
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    size = slab.shape[dim]

    lo_send = lax.slice_in_dim(slab, 0, halo, axis=dim)        # -> neighbor i-1
    hi_send = lax.slice_in_dim(slab, size - halo, size, axis=dim)  # -> i+1

    if n > 1:
        # from_before[i] = hi_send[i-1]; from_after[i] = lo_send[i+1]
        from_before = lax.ppermute(
            hi_send, axis, [(i, i + 1) for i in range(n - 1)]
        )
        from_after = lax.ppermute(
            lo_send, axis, [(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_before = jnp.zeros_like(hi_send)
        from_after = jnp.zeros_like(lo_send)

    # edge shards: replicate own boundary plane (matches jnp.pad mode="edge")
    first = lax.slice_in_dim(slab, 0, 1, axis=dim)
    last = lax.slice_in_dim(slab, size - 1, size, axis=dim)
    rep = list(slab.shape)
    rep[dim] = halo
    from_before = jnp.where(idx == 0, jnp.broadcast_to(first, rep), from_before)
    from_after = jnp.where(idx == n - 1, jnp.broadcast_to(last, rep), from_after)

    return jnp.concatenate([from_before, slab, from_after], axis=dim)


def exchange_z_halo(slab: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """(Dl, H, W) -> (Dl + 2*halo, H, W) with z-neighbor context."""
    return exchange_halo(slab, halo, axis, dim=0)
