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
from tpuseg.ops.histogram import bin_counts
from tpuseg.parallel.reconcile import (
    boundary_edges,
    build_local_table,
    packed_compact_labels,
    rename_to_packed,
    _SENTINEL,
)


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


def multislice_mesh_shapes(dcn_slices: int, ici_per_slice: int):
    """(mesh_shape, dcn_mesh_shape) arguments for
    ``mesh_utils.create_hybrid_device_mesh`` mapping the volume's z axis to
    DCN (inter-slice) and y to ICI (intra-slice). Factored out so the DCN/ICI
    axis assignment is unit-testable without a real multislice deployment
    (VERDICT r2 #5): a transposed assignment here would put the chatty y
    halos and reconciliation gathers on the thin DCN pipe.

    Elementwise product = global mesh shape (dcn_slices, ici_per_slice);
    per-slice (ICI) extents in mesh_shape, inter-slice counts in
    dcn_mesh_shape.
    """
    return (1, ici_per_slice), (dcn_slices, 1)


def arrange_multislice_devices(devices, dcn_slices: int, ici_per_slice: int,
                               slice_index_fn=None) -> np.ndarray:
    """Lay ``devices`` out as a (dcn_slices, ici_per_slice) object array with
    ROWS = slices: mesh axis 0 (volume z) then steps across slices over DCN
    — one contiguous-plane ppermute per neighbor pair per volume, the
    lowest-frequency collective in the pipeline — while axis 1 (volume y)
    stays inside a slice on ICI, carrying the chattier y halos and the
    all_gather'd reconciliation tables.

    ``slice_index_fn`` extracts a device's slice id (default: its
    ``slice_index`` attribute; 0 when absent, e.g. CPU test devices — pass an
    explicit fn to emulate a multislice topology on fake devices).
    """
    key = slice_index_fn or (lambda d: getattr(d, "slice_index", 0))
    groups: dict = {}
    for d in devices:
        groups.setdefault(key(d), []).append(d)
    if len(groups) != dcn_slices:
        raise ValueError(
            f"devices span {len(groups)} slices, expected {dcn_slices}")
    rows = []
    for s in sorted(groups):
        g = sorted(groups[s], key=lambda d: d.id)
        if len(g) != ici_per_slice:
            raise ValueError(
                f"slice {s} has {len(g)} devices, expected {ici_per_slice}")
        rows.append(g)
    arr = np.empty((dcn_slices, ici_per_slice), dtype=object)
    for i, row in enumerate(rows):
        for j, d in enumerate(row):
            arr[i, j] = d
    return arr


def make_multislice_zy_mesh(dcn_slices: int, ici_per_slice: int,
                            axes=("z", "y"), devices=None,
                            slice_index_fn=None) -> Mesh:
    """(z, y) mesh spanning multiple TPU slices over DCN (SURVEY.md §7
    phase 5 "multislice DCN support").

    The z axis maps to the DCN (inter-slice) dimension and y to ICI within a
    slice (see :func:`multislice_mesh_shapes` for why). On a real multislice
    deployment (devices expose ``slice_index`` and no override is given) the
    layout comes from ``mesh_utils.create_hybrid_device_mesh`` so device
    order respects the physical ICI topology; otherwise — explicit
    ``devices``/``slice_index_fn``, e.g. a virtual 2-slice topology on CPU
    test devices — :func:`arrange_multislice_devices` builds the same
    rows-are-slices layout directly.
    """
    if devices is not None or slice_index_fn is not None:
        devs = arrange_multislice_devices(
            devices if devices is not None else jax.devices(),
            dcn_slices, ici_per_slice, slice_index_fn=slice_index_fn)
        return Mesh(devs, axes)

    from jax.experimental import mesh_utils

    mesh_shape, dcn_mesh_shape = multislice_mesh_shapes(
        dcn_slices, ici_per_slice)
    devs = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=mesh_shape,
        dcn_mesh_shape=dcn_mesh_shape,
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
    hist = bin_counts(idx, bins)
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

    Label-id scheme (VERDICT r2 #1a — no 2^31-voxel cap): instances are
    named by packed int32 ids ``shard_rank * shard_max_labels + slot`` from
    per-shard bounded tables; each table entry carries its basin root's
    global coordinate as an int32 PAIR (z-plane index, in-plane linear
    index), so no >31-bit voxel index is ever formed. Capacity: up to 2^31
    z-planes of up to 2^31 voxels each (H*W < 2^31 is asserted); the final
    dense numbering ascends in global root linear index, matching the
    single-device pipeline elementwise for instances whose basins fit within
    ``shard_halo``. The returned fn accepts an optional ``z_offset`` (global
    index of the slab stack's first z-plane) so callers — e.g. a streamed
    z-chunk driver — can place the sharded block anywhere in a larger volume.
    """
    del axis  # derived from the mesh
    axes: Tuple[str, ...] = tuple(mesh.axis_names)
    if not 1 <= len(axes) <= 2:
        raise ValueError(f"mesh must have 1 or 2 spatial axes, got {axes}")
    compute_dtype = resolve(cfg.infer.compute_dtype)
    halo_s = cfg.infer.shard_halo
    nper = tuple(mesh.shape[a] for a in axes)
    n_shards = int(np.prod(nper))
    cap = cfg.infer.shard_max_labels

    def apply_fn(variables, x):
        return model.apply(variables, x)

    def shard_body(variables, slab, z_offset):
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
            hist = bin_counts(hidx, bins)
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
        if cfg.postproc.merge_saddle_ratio > 0:
            # per-shard prominence agglomeration (ops/merge.py) on the
            # extended slab: identical windows merge identically, so shards
            # agree on in-halo basins — the watershed exactness argument
            from tpuseg.ops.merge import saddle_merge

            labels_ext = saddle_merge(
                labels_ext, pk, cfg.postproc.merge_saddle_ratio,
                max_pairs=cfg.postproc.merge_max_pairs)
        # 4b: packed-id reconciliation (VERDICT r2 #1a). Labels stay LOCAL
        # ext-slab linear indices in the volume; only the bounded per-shard
        # table carries each basin root's GLOBAL coordinate, as the int32
        # pair (gz, gy*W + gx) — never the (possibly >2^31) linear product.
        # NOTE: no per-shard size filter here — an instance spanning farther
        # than shard_halo could be dropped on one side and kept on the other;
        # sizes are accumulated globally in packed_compact_labels instead
        # (ADVICE r1), which matches single-device semantics exactly.
        ez, ey = labels_ext.shape[0], labels_ext.shape[1]
        H_glob = hl * (nper[1] if len(axes) == 2 else 1)
        assert H_glob * ww < 2**31, (
            "plane size H*W must stay below 2^31 voxels for the int32 "
            "(z-plane, in-plane) pair coordinates")

        core_local = labels_ext
        for d in sharded_dims:
            core_local = lax.slice_in_dim(
                core_local, halo_s, halo_s + core_sizes[d], axis=d)

        # boundary-overlap planes: my copy of the neighbor-after's first core
        # plane lives at ext index halo_s + core_size (cropped to core range
        # in the other sharded dim)
        send_planes = []
        for d in sharded_dims:
            if nper[d] <= 1:
                send_planes.append(None)
                continue
            plane = lax.index_in_dim(labels_ext, halo_s + core_sizes[d],
                                     axis=d, keepdims=False)
            for d2 in sharded_dims:
                if d2 == d:
                    continue
                pd = d2 if d2 < d else d2 - 1
                plane = lax.slice_in_dim(
                    plane, halo_s, halo_s + core_sizes[d2], axis=pd)
            send_planes.append(plane)

        table, counts, n_distinct = build_local_table(
            core_local, [p for p in send_planes if p is not None], cap)
        from tpuseg.utils.debug import cond_print

        overflow = lax.pmax(n_distinct, axes) > cap
        cond_print(
            overflow,
            "tpuseg: sharded label table OVERFLOW — a shard has {c} "
            "distinct labels > cap {cap}; overflowed instances are "
            "dropped. Raise InferConfig.shard_max_labels.",
            c=n_distinct, cap=cap)

        # global root coordinates per table entry: decode the local ext-slab
        # root index, shift by this shard's core origin (+ caller z_offset)
        shard_rank = idxs[0] * (nper[1] if len(axes) == 2 else 1) \
            + (idxs[1] if len(axes) == 2 else 0)
        tv = jnp.where(table < _SENTINEL, table - 1, 0)
        lx = tv % ww
        t = tv // ww
        ly = t % ey
        lz = t // ey
        gz = lz + idxs[0] * dl - halo_s + z_offset
        gy = ly + (idxs[1] * hl - halo_s if len(axes) == 2 else 0)
        ent_hi = jnp.where(table < _SENTINEL, gz, _SENTINEL)
        ent_lo = jnp.where(table < _SENTINEL, gy * ww + lx, _SENTINEL)

        core_p = rename_to_packed(core_local, table, shard_rank, cap)

        # 6a: edges between my packing and the neighbor's packing of the SAME
        # overlap plane. All sharded dims contribute to ONE closure so
        # corner-crossing instances merge transitively.
        edge_list = []
        for d in sharded_dims:
            if send_planes[d] is None:
                continue
            n_d = nper[d]
            plane_p = rename_to_packed(send_planes[d], table, shard_rank, cap)
            from_prev = lax.ppermute(
                plane_p, axes[d], [(j, j + 1) for j in range(n_d - 1)]
            )
            theirs = jnp.where(idxs[d] == 0, jnp.zeros_like(from_prev), from_prev)
            mine = rename_to_packed(
                lax.index_in_dim(core_local, 0, axis=d, keepdims=False),
                table, shard_rank, cap)
            edge_list.append(boundary_edges(mine, theirs))
        edges = jnp.concatenate(edge_list, axis=0) if edge_list else None

        # 6b: global union + size filter + dense 1..K ordered by global root
        # coordinate (== single-device size_filter_and_compact order)
        return packed_compact_labels(
            core_p, ent_hi, ent_lo, counts, edges, axes, cap, n_shards,
            min_size=cfg.postproc.min_size)

    spec = P(*axes)
    smapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), spec, P()),
        out_specs=spec,
        check_rep=False,
    )
    jitted = jax.jit(smapped)

    def infer(variables, volume, z_offset=0):
        return jitted(variables, volume, jnp.int32(z_offset))

    return infer


def shard_volume(volume, mesh: Mesh, axis=None):
    """Place a host volume with its leading dims sharded over the mesh.

    Multi-process safe (VERDICT r3 missing #1): under a multi-host runtime
    each process uploads only the slabs its own devices own
    (parallel.multihost.put_global) — ``volume`` may be an ``np.memmap`` so
    no host ever reads the whole array."""
    del axis  # derived from the mesh
    from tpuseg.parallel.multihost import put_global

    return put_global(volume, mesh, P(*mesh.axis_names))
