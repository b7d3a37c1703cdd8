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
from tpuseg.parallel.halo import exchange_halo
from tpuseg.parallel.reconcile import global_compact_labels, merge_boundary_labels


def make_z_mesh(axis: str = "z", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_zy_mesh(shape: Tuple[int, int], axes=("z", "y"), devices=None) -> Mesh:
    """2-D spatial mesh: devices arranged (n_z, n_y) over the volume's (z, y)
    dims (SURVEY.md §7 phase 5). z-only sharding stops scaling once slabs get
    thin (8 shards of a 96-deep stack is already 12 planes each); the second
    axis keeps slab extents halo-compatible on larger meshes."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices).reshape(shape), axes)


def make_multislice_zy_mesh(dcn_slices: int, ici_per_slice: int,
                            axes=("z", "y")) -> Mesh:
    """(z, y) mesh spanning multiple TPU slices over DCN (SURVEY.md §7
    phase 5 "multislice DCN support").

    The z axis maps to the DCN (inter-slice) dimension and y to ICI within a
    slice: the z halo exchange is ONE ppermute of contiguous planes per
    neighbor pair per volume — the lowest-frequency, most-contiguous
    collective in the pipeline, exactly what the thin DCN pipe should carry —
    while the chattier y halos and the all_gather'd reconciliation tables ride
    ICI. Uses ``mesh_utils.create_hybrid_device_mesh`` so device order
    respects the physical topology; requires a real multislice deployment
    (single-slice environments should use make_z_mesh / make_zy_mesh).
    """
    from jax.experimental import mesh_utils

    devs = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, ici_per_slice),
        dcn_mesh_shape=(dcn_slices, 1),
    )
    return Mesh(devs, axes)


def global_histogram_percentile(slab, pcts, axis, bins: int = 4096,
                                sample_stride: int = 1):
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
    # stride along the UNSHARDED x axis -> shards sample the same global
    # voxel set as the single-device path (data.normalize.histogram_...)
    sample = slab[..., ::sample_stride] if sample_stride > 1 else slab
    idx = jnp.clip(((sample - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.int32).at[idx.ravel()].add(1)
    # sample.size is static and equal across shards -> global size is static
    n_global = sample.size * lax.psum(1, axis)
    frac = lax.psum(hist.astype(jnp.float32) / n_global, axis)
    cdf = jnp.cumsum(frac)

    def pct_value(p):
        b = jnp.searchsorted(cdf, jnp.float32(p / 100.0))
        return lo + (b.astype(jnp.float32) + 0.5) / bins * span

    return pct_value(pcts[0]), pct_value(pcts[1])


def make_sharded_infer_fn(
    model, cfg: Config, mesh: Mesh, axis=None, normalize: bool = True
):
    """Returns jitted ``infer(variables, volume) -> labels`` where ``volume``
    and the result are sharded over the mesh's spatial axes.

    The mesh may be 1-D (z-slabs) or 2-D (z, y blocks — SURVEY.md §7 phase 5;
    mesh axis order maps to volume dims (0, 1)). ``axis`` is accepted for
    backward compatibility; the mesh's own axis names are authoritative.

    Label ids are global linear voxel indices in int32: total volume size
    must stay below 2^31 voxels on this path (the host-streamed path,
    infer/streaming.py, covers larger volumes with int64 ids on the host).
    """
    del axis  # derived from the mesh
    axes: Tuple[str, ...] = tuple(mesh.axis_names)
    if not 1 <= len(axes) <= 2:
        raise ValueError(f"mesh must have 1 or 2 spatial axes, got {axes}")
    compute_dtype = resolve(cfg.infer.compute_dtype)
    halo_s = cfg.infer.shard_halo
    nper = tuple(mesh.shape[a] for a in axes)

    def apply_fn(variables, x):
        return model.apply(variables, x)

    def shard_body(variables, slab):
        dl, hl, ww = slab.shape
        idxs = [lax.axis_index(a) for a in axes]
        sharded_dims = list(range(len(axes)))        # z -> dim0, y -> dim1

        # 1-2: halo exchange (y first, then z, so corners fill transitively)
        # + global normalization
        slab = slab.astype(jnp.float32)
        ext = slab
        for d in reversed(sharded_dims):
            ext = exchange_halo(ext, halo_s, axes[d], dim=d)
        if normalize:
            p_lo, p_hi = global_histogram_percentile(
                slab, cfg.data.normalize_pcts, axes,
                sample_stride=cfg.data.normalize_sample_stride,
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

        # 5: mask fake (edge-replicated) halo regions on the outermost shards
        # so global volume edges behave exactly like the single-device pipeline
        fake = jnp.zeros(ext.shape, jnp.bool_)
        core_sizes = (dl, hl)
        for d in sharded_dims:
            c = lax.broadcasted_iota(jnp.int32, ext.shape, d)
            fake |= (c < halo_s) & (idxs[d] == 0)
            fake |= (c >= halo_s + core_sizes[d]) & (idxs[d] == nper[d] - 1)
        fg = jnp.where(fake, 0.0, fg)
        pk = jnp.where(fake, 0.0, pk)

        # 4: per-shard watershed with global ids. Optional volume-matched
        # fg-threshold calibration (ops/calibrate.py) over the GLOBAL volume:
        # per-shard histogram of fg probs, psum over the mesh axes.
        if cfg.postproc.fg_target_fraction > 0:
            bins = 4096
            # histogram over CORE voxels only: cores partition the volume, so
            # the psum'd histogram is EXACTLY the single-device one. Reduced
            # as fp32 fractions so >2^31-voxel global volumes can't overflow
            # int32 (per-shard int32 histograms are HBM-bounded, safe).
            fg_core = fg
            for d in sharded_dims:
                fg_core = lax.slice_in_dim(fg_core, halo_s,
                                           halo_s + core_sizes[d], axis=d)
            # same x-stride sample as ops.calibrate (x is unsharded, so the
            # global sample set matches the single-device one exactly)
            stride = cfg.data.normalize_sample_stride
            if stride > 1:
                fg_core = fg_core[..., ::stride]
            hidx = jnp.clip((fg_core * bins).astype(jnp.int32), 0, bins - 1)
            hist = jnp.zeros((bins,), jnp.int32).at[hidx.ravel()].add(1)
            n_global = fg_core.size * lax.psum(1, axes)
            frac = lax.psum(hist.astype(jnp.float32) / n_global, axes)
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
        # local ext index -> GLOBAL voxel index. Per-axis coordinates shift
        # by constants, and lexicographic (z, y, x) order is preserved, so
        # every within-slab tie-break agrees between shards; only the VALUES
        # are remapped. (For 1-D z sharding this is the constant offset add;
        # with a sharded y the row stride changes, so decode/re-encode.)
        # NOTE: no per-shard size filter here — an instance spanning farther
        # than shard_halo could be dropped on one side and kept on the other;
        # sizes are accumulated globally in global_compact_labels instead
        # (ADVICE r1), which matches single-device semantics exactly.
        ez, ey = labels_ext.shape[0], labels_ext.shape[1]
        H_glob = hl * (nper[1] if len(axes) == 2 else 1)
        v = labels_ext - 1
        lx = v % ww
        t = v // ww
        ly = t % ey
        lz = t // ey
        gz = lz + idxs[0] * dl - halo_s
        gy = ly + (idxs[1] * hl - halo_s if len(axes) == 2 else 0)
        glin = (gz * H_glob + gy) * ww + lx
        labels_ext = jnp.where(labels_ext > 0, glin + 1, 0)

        core = labels_ext
        for d in sharded_dims:
            core = lax.slice_in_dim(core, halo_s, halo_s + core_sizes[d], axis=d)

        # 6a: reconcile across boundaries via the redundantly-computed plane:
        # my copy of the neighbor-after's first core plane lives at ext index
        # halo_s + core_size; send it forward, compare against their own
        # first core plane. All sharded dims contribute edges to ONE closure.
        pairs = []
        for d in sharded_dims:
            n_d = nper[d]
            if n_d <= 1:
                continue
            plane_for_next = lax.index_in_dim(labels_ext, halo_s + core_sizes[d],
                                              axis=d, keepdims=False)
            # crop the plane's OTHER sharded dim to its core range
            for d2 in sharded_dims:
                if d2 == d:
                    continue
                pd = d2 if d2 < d else d2 - 1
                plane_for_next = lax.slice_in_dim(
                    plane_for_next, halo_s, halo_s + core_sizes[d2], axis=pd)
            from_prev = lax.ppermute(
                plane_for_next, axes[d], [(j, j + 1) for j in range(n_d - 1)]
            )
            theirs = jnp.where(idxs[d] == 0, jnp.zeros_like(from_prev), from_prev)
            mine = lax.index_in_dim(core, 0, axis=d, keepdims=False)
            pairs.append((mine, theirs))
        if pairs:
            core = merge_boundary_labels(core, pairs, axis=axes)

        # 6b: global size filter + dense global 1..K, ordered by original id
        # (== single-device size_filter_and_compact)
        return global_compact_labels(core, axes, cfg.infer.shard_max_labels,
                                     min_size=cfg.postproc.min_size)

    spec = P(*axes)
    smapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), spec),
        out_specs=spec,
        check_rep=False,
    )
    return jax.jit(smapped)


def shard_volume(volume, mesh: Mesh, axis=None):
    """Place a host volume with its leading dims sharded over the mesh."""
    del axis  # derived from the mesh
    return jax.device_put(volume, NamedSharding(mesh, P(*mesh.axis_names)))
