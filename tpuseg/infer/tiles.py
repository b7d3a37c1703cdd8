"""Tiled halo-overlap whole-volume inference (SURVEY.md C10, NORTH-STAR
config 2: "sliding-window whole-volume inference becomes a tiled halo-overlap
scan").

The reference's test.py loop crops tiles on the host, runs the net per tile
on GPU and blends overlapping logits back on CPU (SURVEY.md §3.2 — the
per-tile host<->device ping-pong is its bottleneck). Here the whole sweep is
ONE XLA program:

  * the padded volume lives in HBM; a ``lax.scan`` walks a static tile grid
  * each step dynamic-slices a (tile + 2*halo) block, runs the net on a
    ``tile_batch`` of such blocks (keeps the MXU fed), crops the valid core
    and dynamic-update-slices it into the output accumulators
  * no blending is needed: cores partition the volume exactly, and with halo
    >= the net's receptive-field radius the result is voxel-identical to
    ``crop(net(edge_pad(volume, halo)))`` — the whole-volume forward under
    the same edge-replication boundary convention (eval-mode BatchNorm makes
    the net tile-independent; tests/unit/test_tiles.py asserts exact equality
    everywhere, and interior equality vs. the plain zero-SAME forward). At
    volume borders NO tiling scheme can reproduce a plain SAME forward
    exactly (intermediate activations in the implicit zero pad are nonzero),
    so the edge-replicated convention is the defined semantics — same
    situation as the reference's border tiles.

Zero host transfers inside the sweep; Python only builds the (static) origin
table.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def halo3(halo) -> Tuple[int, int, int]:
    """Normalize a scalar-or-per-axis halo spec to a (hd, hh, hw) tuple.

    Per-axis halos exist because halo cost is only *useful* on axes the tile
    grid actually splits: an axis covered by a single tile needs no context
    margin at all (its borders see the same edge-padding either way), yet a
    scalar halo pays the margin on every axis. On the flagship 96x512x512
    stack with tile (96, 256, 512), halo=8 computes (112, 272, 528) blocks —
    the z/x margins are ~14% pure overcompute that halo=(0, 8, 8) removes.
    """
    if isinstance(halo, (tuple, list)):
        hd, hh, hw = (int(h) for h in halo)
        return hd, hh, hw
    return int(halo), int(halo), int(halo)


def rf_radius_bound(levels: int) -> int:
    """Analytic upper bound on the U-Net's receptive-field radius for a model
    with ``levels = len(features)`` encoder widths.

    Walking the deepest path: each ConvBlock is two 3^3 convs (+2 per side at
    stride s), Down/Up k=2 convs add +1·s, so

        radius <= 6*(2^(L-1) - 1) + 2*2^(L-1) + 2  =  8*2^(L-1) - 4

    with L-1 downsampling stages. Measured radii (measure_rf_radius) are
    slightly tighter because the k=2 convs are one-sided: 2 levels -> 11
    (bound 12), 3 -> 27 (28), 4 -> 53 (60). Used to warn when
    ``InferConfig.halo`` is below the exactness requirement (ADVICE r1).
    """
    measured = {1: 4, 2: 11, 3: 27, 4: 53}
    return measured.get(levels, 8 * 2 ** (levels - 1) - 4)


def measure_rf_radius(model, variables, probe_size: int = 96, tol: float = 1e-7) -> int:
    """Empirically measure the net's receptive-field radius (for halo sizing).

    Perturbs the center voxel of a zero volume and finds the farthest output
    voxel that changes. Halo >= this radius makes tiled_forward voxel-exact
    (tests/unit/test_tiles.py). Measured radii for this U-Net family:
    2 levels -> 11, 3 -> 27, 4 -> 53 (roughly doubling per level).
    """
    c = probe_size // 2
    x0 = jnp.zeros((1, probe_size, probe_size, probe_size, 1))
    x1 = x0.at[0, c, c, c, 0].set(10.0)
    d = jnp.abs(
        model.apply(variables, x1)["fg_logits"]
        - model.apply(variables, x0)["fg_logits"]
    )[0]
    nz = np.argwhere(np.asarray(d) > tol)
    if nz.size == 0:
        return 0
    return int(np.abs(nz - c).max())


def tile_grid(shape, tile) -> np.ndarray:
    """Static (N, 3) int32 table of core-tile origins covering ``shape``."""
    counts = [_cdiv(s, t) for s, t in zip(shape, tile)]
    origins = [
        (d * tile[0], h * tile[1], w * tile[2])
        for d in range(counts[0])
        for h in range(counts[1])
        for w in range(counts[2])
    ]
    return np.asarray(origins, np.int32)


@partial(
    jax.jit,
    static_argnames=("apply_fn", "tile", "halo", "tile_batch", "compute_dtype",
                     "preprocess"),
)
def tiled_forward(
    apply_fn,                      # (variables, x: (B,d,h,w,1)) -> {"fg_logits","peak_logits"}
    variables,
    volume: jnp.ndarray,           # (D, H, W) float, already normalized
    tile: Tuple[int, int, int] = (32, 128, 128),
    halo=16,                       # scalar or per-axis (hd, hh, hw)
    tile_batch: int = 1,
    compute_dtype=jnp.float32,
    preprocess=None,               # optional per-block fn applied after slicing
) -> Dict[str, jnp.ndarray]:
    """Whole-volume fg/peak logits via a halo-overlap tile scan.

    Returns {"fg_logits": (D,H,W) fp32, "peak_logits": (D,H,W) fp32}.

    ``halo`` may be per-axis (see :func:`halo3`). The exactness contract is
    per-axis: the sweep equals ``crop(net(edge_pad(volume, halo)))`` when on
    EVERY axis either halo >= the net's receptive-field radius or the axis is
    covered by a single tile (no seam to cross). A single-tile axis with
    halo 0 keeps the net's own zero-SAME border there — the standard
    whole-volume convention — at zero margin cost.

    ``preprocess`` (static): elementwise fn applied to each sliced block
    before the net — the fused pipeline normalizes here so the raw volume
    never takes an extra normalize round-trip through HBM. Elementwise ops
    commute with slicing, so results equal preprocessing the whole volume.
    """
    D, H, W = volume.shape
    td, th, tw = tile
    hd, hh, hw = halo3(halo)
    Dp, Hp, Wp = _cdiv(D, td) * td, _cdiv(H, th) * th, _cdiv(W, tw) * tw

    # pad: halo on the low side, halo + round-up on the high side (edge values
    # replicate, matching the reference's reflect/edge padding of border tiles)
    pad = ((hd, hd + Dp - D), (hh, hh + Hp - H), (hw, hw + Wp - W))
    if preprocess is None:
        volume = volume.astype(compute_dtype)
    vol_pad = jnp.pad(volume, pad, mode="edge")

    origins = tile_grid((Dp, Hp, Wp), tile)
    n = origins.shape[0]
    nb = _cdiv(n, tile_batch)
    if n % tile_batch:
        # repeat the last origin; duplicate writebacks land on the same core
        origins = np.concatenate(
            [origins, np.repeat(origins[-1:], nb * tile_batch - n, axis=0)]
        )
    origins = jnp.asarray(origins.reshape(nb, tile_batch, 3))

    block = (td + 2 * hd, th + 2 * hh, tw + 2 * hw)

    # accumulate logits in the compute dtype: the sweep is HBM-bandwidth
    # bound, so fp32 accumulators would double the writeback traffic for no
    # benefit (logits are head outputs, not running sums)
    acc_dtype = compute_dtype

    def step(carry, orig_b):
        fg_acc, pk_acc = carry

        def get(o):
            return lax.dynamic_slice(vol_pad, (o[0], o[1], o[2]), block)

        blocks = jax.vmap(get)(orig_b)[..., None]          # (tb, bd, bh, bw, 1)
        if preprocess is not None:
            blocks = preprocess(blocks).astype(compute_dtype)
        out = apply_fn(variables, blocks)
        fg = out["fg_logits"][:, hd : hd + td, hh : hh + th, hw : hw + tw]
        pk = out["peak_logits"][:, hd : hd + td, hh : hh + th, hw : hw + tw]

        def write(i, accs):
            fa, pa = accs
            o = orig_b[i]
            fa = lax.dynamic_update_slice(fa, fg[i].astype(acc_dtype), (o[0], o[1], o[2]))
            pa = lax.dynamic_update_slice(pa, pk[i].astype(acc_dtype), (o[0], o[1], o[2]))
            return fa, pa

        return lax.fori_loop(0, tile_batch, write, (fg_acc, pk_acc)), None

    init = (
        jnp.zeros((Dp, Hp, Wp), acc_dtype),
        jnp.zeros((Dp, Hp, Wp), acc_dtype),
    )
    (fg_acc, pk_acc), _ = lax.scan(step, init, origins)
    # returned in acc_dtype — downstream sigmoid/threshold fuse the upcast
    return {
        "fg_logits": fg_acc[:D, :H, :W],
        "peak_logits": pk_acc[:D, :H, :W],
    }
