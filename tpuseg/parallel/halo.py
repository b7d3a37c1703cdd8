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

import jax
import jax.numpy as jnp
from jax import lax


def exchange_z_halo(slab: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """(Dl, H, W) -> (Dl + 2*halo, H, W) with neighbor context.

    Shard i receives the last ``halo`` planes of shard i-1 above and the
    first ``halo`` planes of shard i+1 below. Edge shards edge-replicate.
    """
    if halo > slab.shape[0]:
        raise ValueError(
            f"halo ({halo}) exceeds the local slab depth ({slab.shape[0]}); "
            "a single ppermute only reaches the immediate neighbor — use more "
            "z per shard or fewer shards"
        )
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)

    top_send = slab[:halo]       # my first planes -> neighbor above (i-1)
    bot_send = slab[-halo:]      # my last planes  -> neighbor below (i+1)

    if n > 1:
        # from_above[i] = bot_send[i-1]; from_below[i] = top_send[i+1]
        from_above = lax.ppermute(
            bot_send, axis, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = lax.ppermute(
            top_send, axis, [(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_above = jnp.zeros_like(bot_send)
        from_below = jnp.zeros_like(top_send)

    # edge shards: replicate own boundary plane (matches jnp.pad mode="edge")
    top_edge = jnp.broadcast_to(slab[:1], (halo, *slab.shape[1:]))
    bot_edge = jnp.broadcast_to(slab[-1:], (halo, *slab.shape[1:]))
    from_above = jnp.where(idx == 0, top_edge, from_above)
    from_below = jnp.where(idx == n - 1, bot_edge, from_below)

    return jnp.concatenate([from_above, slab, from_below], axis=0)
