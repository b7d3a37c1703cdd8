"""Host-streamed whole-volume inference for volumes larger than HBM
(NORTH-STAR config 5's single-chip leg: "10+ GVoxel ... microscopy stacks
stream from host to device").

The volume streams through the device in z-chunks with ``halo`` planes of
context:

pass 1: a psum-free histogram over all chunks fixes the GLOBAL percentile
        normalization (identical scaling for every chunk);
pass 1b (only when ``cfg.postproc.fg_target_fraction > 0``): a net-only sweep
        accumulates the global foreground-probability histogram so the
        volume-matched fg-threshold calibration (ops/calibrate.py) sees the
        SAME distribution as the fused/sharded paths — streamed results match
        the other inference paths when calibration is configured (ADVICE r1).
        Costs one extra net pass over the volume.
pass 2: each extended chunk runs the jitted net-sweep + watershed; labels
        come back as LOCAL extended-chunk indices (int32 — exact for chunks
        up to 2^31 voxels, i.e. any chunk that fits HBM) and are stored
        as-is in the int32 result buffer. Only the small per-chunk artifacts
        (boundary-overlap planes, unique-id tables) are lifted to GLOBAL
        int64 ids (offset add — order preserving, so chunk results agree on
        shared basins exactly like the sharded path). Chunk-boundary
        instances are reconciled by a host union-find over the redundantly-
        computed overlap plane; instance sizes accumulate globally; a final
        in-place pass lifts each chunk, applies union + size filter + dense
        1..K compaction.

Host memory: ONE int32 (D,H,W) result buffer (4 bytes/voxel) plus chunk-sized
transients — a 10-GVoxel volume needs 40 GB for the labels themselves and no
more (the int64 full-volume intermediate of the round-1 design is gone).

The chunk pipeline is ONE compiled XLA program reused for every chunk (static
chunk shape); the host does only I/O, the tiny union-find, and the relabel
table lookups. Output ordering and values match the fused single-shot
pipeline exactly when instance extents fit within the halo
(tests/unit/test_streaming.py asserts elementwise equality).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import Config
from tpuseg.core.dtypes import resolve
from tpuseg.ops.histogram import bin_counts
from tpuseg.infer.tiles import tiled_forward
from tpuseg.ops import watershed


def _closure_numpy(edges: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized union-find closure over an (E, 2) int64 edge list of label
    values -> (keys, reps) rename table. Same algorithm as
    parallel/reconcile._closure_table, in numpy: compact values to positions,
    scatter-min hook (np.minimum.at), pointer-jump compress. A Python
    dict-based union-find dies on noisy volumes (hundreds of thousands of
    edges per chunk boundary); this is O(E log E)."""
    if len(edges) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    keys = np.unique(edges)
    a = np.searchsorted(keys, edges[:, 0])
    b = np.searchsorted(keys, edges[:, 1])
    parent = np.arange(len(keys), dtype=np.int64)
    for _ in range(max(2, int(np.ceil(np.log2(max(len(keys), 2)))) + 1)):
        ra, rb = parent[a], parent[b]
        hi, lo = np.maximum(ra, rb), np.minimum(ra, rb)
        np.minimum.at(parent, hi, lo)
        parent = parent[parent[parent]]
    return keys, keys[parent]


def _normalize_ext(ext, lo, hi):
    return jnp.clip((ext.astype(jnp.float32) - lo) / jnp.maximum(hi - lo, 1e-6),
                    0.0, 1.0)


def _mask_fake(prob, mask_top, mask_bot):
    """Zero out fake (edge-replicated) halo planes at the global volume ends."""
    z = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 0)
    fake = (z < mask_top) | (z >= prob.shape[0] - mask_bot)
    return jnp.where(fake, 0.0, prob)


def _make_chunk_fns(model, cfg: Config, halo: int, chunk_z: int,
                    calib_bins: int = 4096):
    compute_dtype = resolve(cfg.infer.compute_dtype)
    ext_shape_z = chunk_z + 2 * halo

    def apply_fn(variables, x):
        return model.apply(variables, x)

    def forward(variables, ext, lo, hi, mask_top, mask_bot):
        ext = _normalize_ext(ext, lo, hi)
        out = tiled_forward(
            apply_fn, variables, ext,
            tile=cfg.infer.tile, halo=cfg.infer.halo,
            tile_batch=cfg.infer.tile_batch, compute_dtype=compute_dtype,
        )
        fg = jax.nn.sigmoid(out["fg_logits"].astype(jnp.float32))
        pk = jax.nn.sigmoid(out["peak_logits"].astype(jnp.float32))
        return _mask_fake(fg, mask_top, mask_bot), _mask_fake(pk, mask_top, mask_bot)

    @jax.jit
    def fg_hist_fn(variables, ext, lo, hi, mask_top, mask_bot):
        """Net-only pass: int32 histogram of CORE fg probabilities (the same
        voxels the fused path's calibration sees; cores partition the volume)."""
        fg, _ = forward(variables, ext, lo, hi, mask_top, mask_bot)
        core = fg[halo : halo + chunk_z]
        stride = cfg.data.normalize_sample_stride
        if stride > 1:  # same x-stride sample as ops.calibrate / sharded
            core = core[..., ::stride]
        idx = jnp.clip((core * calib_bins).astype(jnp.int32), 0, calib_bins - 1)
        hist = bin_counts(idx, calib_bins)
        # fake planes inside the core window (short last chunk) land in bin 0
        # as prob 0.0 — the caller subtracts them from bin 0
        return hist

    # The chunk pipeline runs as TWO chained XLA programs (net | post) with a
    # device-resident f32-probability handoff — the same "staged" trick as
    # infer/pipeline.py program="staged": XLA assigns buffers per program, so
    # peak HBM is max(stage peaks) instead of the joint program's sum. The
    # joint form crashed the TPU worker once the saddle-merge sort
    # transients joined the net sweep's buffers at GVoxel chunk shapes (r4).
    @jax.jit
    def chunk_net_fn(variables, ext, lo, hi, mask_top, mask_bot):
        return forward(variables, ext, lo, hi, mask_top, mask_bot)

    @jax.jit
    def chunk_post_fn(fg, pk, fg_thr):
        labels = watershed(
            fg, pk,
            peak_threshold=cfg.postproc.peak_threshold,
            fg_threshold=fg_thr,
            peak_radius=cfg.postproc.nms_radius,
            flood_iters=cfg.postproc.flood_iters,
            method=cfg.postproc.method,
            ascent_rounds=cfg.postproc.ascent_rounds,
            nms_impl=cfg.postproc.nms_impl,
            resolve_impl=cfg.postproc.resolve_impl,
        )
        if cfg.postproc.merge_saddle_ratio > 0:
            # per-chunk prominence agglomeration (ops/merge.py): only the
            # PASSING EDGE LIST leaves the device — the host finalize's
            # union-find (which already merges chunk-boundary ids) applies
            # them, so no on-device relabel runs at all. Identical windows
            # derive identical edges, so chunks agree on shared basins
            # exactly like the watershed itself (halo validity).
            from tpuseg.ops.merge import saddle_merge_edges

            me_lo, me_hi = saddle_merge_edges(
                labels, pk, cfg.postproc.merge_saddle_ratio,
                max_pairs=cfg.postproc.merge_max_pairs)
        else:
            me_lo = me_hi = jnp.zeros((0,), jnp.int32)
        # convergence diagnostic as an ordinary output (VERDICT r4 weak #4):
        # nonzero iff flood_iters truncated this chunk's fixed point. Counted
        # over the full ext window (halo voxels recount across chunks — an
        # upper bound, but zero remains exact).
        from tpuseg.ops.watershed import flood_truncation_count

        n_trunc = flood_truncation_count(labels, fg >= fg_thr)
        # crop ON DEVICE: only the core + the one overlap plane leave the
        # chip (device->host runs at ~27 MB/s through this tunnel — ext-
        # volume downloads dominated the round-1 streamed wall time)
        core = labels[halo : halo + chunk_z]
        overlap = labels[halo + chunk_z] if halo + chunk_z < ext_shape_z \
            else jnp.zeros_like(labels[0])
        # int32 local ext-chunk indices (+1), unfiltered
        return core, overlap, me_lo, me_hi, n_trunc

    def chunk_fn(variables, ext, lo, hi, mask_top, mask_bot, fg_thr):
        fg, pk = chunk_net_fn(variables, ext, lo, hi, mask_top, mask_bot)
        return chunk_post_fn(fg, pk, fg_thr)

    return fg_hist_fn, chunk_fn


def _make_sharded_chunk_fns(model, cfg: Config, halo: int, chunk_z: int,
                            mesh, calib_bins: int = 4096):
    """y-sharded variants of the chunk kernels (VERDICT r2 #1b — the
    streamed×sharded composition): each extended z-chunk is sharded over the
    mesh's single axis along the volume's y dimension, so a >HBM volume
    streams through ALL chips of a slice instead of one.

    Contract: outputs are bitwise what the single-device chunk kernels emit
    (chunk-local ext linear label ids; same core + overlap planes) for every
    basin fitting within ``cfg.infer.shard_halo`` of a y boundary — the host
    z-reconciliation in :func:`stream_infer` is completely oblivious to the
    mesh. Cross-shard ids ride the packed (shard, table-slot) scheme of
    parallel/reconcile.py and are renamed back to min-root-coordinate linear
    ids before leaving the device.
    """
    import jax.lax as lax
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from tpuseg.parallel.halo import exchange_halo
    from tpuseg.parallel.reconcile import (
        _SENTINEL,
        boundary_edges,
        build_local_table,
        packed_merge_to_coord_labels,
        rename_to_packed,
    )

    compute_dtype = resolve(cfg.infer.compute_dtype)
    ext_z = chunk_z + 2 * halo
    (axis,) = mesh.axis_names
    n_y = mesh.shape[axis]
    halo_y = cfg.infer.shard_halo
    cap = cfg.infer.shard_max_labels

    def apply_fn(variables, x):
        return model.apply(variables, x)

    def forward_slab(variables, slab, lo, hi, mask_top, mask_bot):
        """(ext_z, H/n_y, W) raw y-slab -> fg/pk probs on the y-extended slab
        with fake planes (global z ends, edge-replicated y halos) zeroed."""
        hl = slab.shape[1]
        idx_y = lax.axis_index(axis)
        ext2 = exchange_halo(slab.astype(jnp.float32), halo_y, axis, dim=1)
        ext2 = _normalize_ext(ext2, lo, hi)
        out = tiled_forward(
            apply_fn, variables, ext2,
            tile=cfg.infer.tile, halo=cfg.infer.halo,
            tile_batch=cfg.infer.tile_batch, compute_dtype=compute_dtype,
        )
        fg = jax.nn.sigmoid(out["fg_logits"].astype(jnp.float32))
        pk = jax.nn.sigmoid(out["peak_logits"].astype(jnp.float32))
        fg = _mask_fake(fg, mask_top, mask_bot)
        pk = _mask_fake(pk, mask_top, mask_bot)
        # fake (edge-replicated) y halos on the outermost shards: those
        # voxels don't exist in the single-device chunk's watershed domain
        y = lax.broadcasted_iota(jnp.int32, fg.shape, 1)
        fake_y = ((y < halo_y) & (idx_y == 0)) | \
                 ((y >= halo_y + hl) & (idx_y == n_y - 1))
        return jnp.where(fake_y, 0.0, fg), jnp.where(fake_y, 0.0, pk), idx_y

    def hist_body(variables, slab, lo, hi, mask_top, mask_bot):
        hl = slab.shape[1]
        fg, _, _ = forward_slab(variables, slab, lo, hi, mask_top, mask_bot)
        core = fg[halo : halo + chunk_z, halo_y : halo_y + hl]
        stride = cfg.data.normalize_sample_stride
        if stride > 1:
            core = core[..., ::stride]
        idx = jnp.clip((core * calib_bins).astype(jnp.int32), 0, calib_bins - 1)
        hist = bin_counts(idx, calib_bins)
        return lax.psum(hist, axis)

    def chunk_body(variables, slab, lo, hi, mask_top, mask_bot, fg_thr):
        hl = slab.shape[1]
        ww = slab.shape[2]
        fg, pk, idx_y = forward_slab(variables, slab, lo, hi, mask_top, mask_bot)
        labels_ext = watershed(
            fg, pk,
            peak_threshold=cfg.postproc.peak_threshold,
            fg_threshold=fg_thr,
            peak_radius=cfg.postproc.nms_radius,
            flood_iters=cfg.postproc.flood_iters,
            method=cfg.postproc.method,
            ascent_rounds=cfg.postproc.ascent_rounds,
            nms_impl=cfg.postproc.nms_impl,
            resolve_impl=cfg.postproc.resolve_impl,
        )
        if cfg.postproc.merge_saddle_ratio > 0:
            from tpuseg.ops.merge import saddle_merge

            labels_ext = saddle_merge(
                labels_ext, pk, cfg.postproc.merge_saddle_ratio,
                max_pairs=cfg.postproc.merge_max_pairs)
        hly = hl + 2 * halo_y
        core_y = labels_ext[:, halo_y : halo_y + hl]    # full ext z range

        send_plane = (labels_ext[:, halo_y + hl] if n_y > 1 else None)
        table, _counts, n_distinct = build_local_table(  # sizes filtered on host
            core_y, [send_plane] if send_plane is not None else [], cap)
        from tpuseg.utils.debug import cond_print

        overflow = lax.pmax(n_distinct, axis) > cap
        cond_print(
            overflow,
            "tpuseg: sharded-chunk label table OVERFLOW — {c} distinct "
            "labels > cap {cap}; overflowed instances are dropped. Raise "
            "InferConfig.shard_max_labels.", c=n_distinct, cap=cap)

        # root coordinates: hi = ext-chunk z plane, lo = global in-plane index
        tv = jnp.where(table < _SENTINEL, table - 1, 0)
        lx = tv % ww
        t = tv // ww
        ly = t % hly
        lz = t // hly
        gy = ly + idx_y * hl - halo_y
        ent_hi = jnp.where(table < _SENTINEL, lz, _SENTINEL)
        ent_lo = jnp.where(table < _SENTINEL, gy * ww + lx, _SENTINEL)

        core_p = rename_to_packed(core_y, table, idx_y, cap)
        edges = None
        if send_plane is not None:
            plane_p = rename_to_packed(send_plane, table, idx_y, cap)
            from_prev = lax.ppermute(
                plane_p, axis, [(j, j + 1) for j in range(n_y - 1)])
            theirs = jnp.where(idx_y == 0, jnp.zeros_like(from_prev), from_prev)
            mine = rename_to_packed(core_y[:, 0], table, idx_y, cap)
            edges = boundary_edges(mine, theirs)

        from tpuseg.ops.watershed import flood_truncation_count

        n_trunc = lax.psum(
            flood_truncation_count(labels_ext, fg >= fg_thr), axis)
        return packed_merge_to_coord_labels(
            core_p, ent_hi, ent_lo, edges, axis, cap, n_y,
            encode_stride=hl * n_y * ww), n_trunc

    spec_vol = P(None, axis, None)

    @jax.jit
    def fg_hist_fn(variables, ext, lo, hi, mask_top, mask_bot):
        return shard_map(
            hist_body, mesh=mesh,
            in_specs=(P(), spec_vol, P(), P(), P(), P()),
            out_specs=P(), check_rep=False,
        )(variables, ext, lo, hi, mask_top, mask_bot)

    @jax.jit
    def chunk_fn(variables, ext, lo, hi, mask_top, mask_bot, fg_thr):
        labels, n_trunc = shard_map(
            chunk_body, mesh=mesh,
            in_specs=(P(), spec_vol, P(), P(), P(), P(), P()),
            out_specs=(spec_vol, P()), check_rep=False,
        )(variables, ext, lo, hi, mask_top, mask_bot, fg_thr)
        core = labels[halo : halo + chunk_z]
        overlap = labels[halo + chunk_z] if halo + chunk_z < ext_z \
            else jnp.zeros_like(labels[0])
        # merge runs on-device inside chunk_body (packed-id space) for the
        # sharded variant; no edge export needed
        empty = jnp.zeros((0,), jnp.int32)
        return core, overlap, empty, empty, n_trunc

    return fg_hist_fn, chunk_fn


def _chunk_histogram(vol_chunk: np.ndarray, lo: float, span: float, bins: int):
    idx = np.clip(((vol_chunk.astype(np.float32) - lo) / span * bins), 0,
                  bins - 1).astype(np.int64)
    return np.bincount(idx.ravel(), minlength=bins)


def _read_ext(volume, z0, z1, halo, ext_z, D):
    """Extended chunk [z0-halo, z1+halo), clipped + edge-replicated at volume
    ends and padded up to the static ext shape. Returns (ext, mask_top,
    mask_bot) where the masks count fake planes at each end.

    The SOURCE dtype is preserved (uint8/uint16 microscopy uploads at 1-2
    bytes/voxel instead of 4; the device casts to f32 during normalization —
    host->device also rides the slow tunnel here)."""
    lo_z, hi_z = z0 - halo, z1 + halo
    r0, r1 = max(lo_z, 0), min(hi_z, D)
    ext = np.asarray(volume[r0:r1])
    pad_top, pad_bot = r0 - lo_z, hi_z - r1
    pad_static = ext_z - (pad_top + ext.shape[0] + pad_bot)
    if pad_top or pad_bot or pad_static:
        ext = np.pad(ext, ((pad_top, pad_bot + pad_static), (0, 0), (0, 0)),
                     mode="edge")
    return ext, pad_top, pad_bot + pad_static


def stream_infer(
    model,
    cfg: Config,
    variables,
    volume,                      # array-like supporting volume[z0:z1] -> np
    out=None,                    # optional preallocated int32 (D,H,W) sink
    chunk_z: int = 64,
    halo: Optional[int] = None,
    normalize: bool = True,
    bins: int = 4096,
    sample_cache_bytes: int = 8 << 30,
    stats: Optional[dict] = None,
    mesh=None,                   # optional 1-axis Mesh: shard chunks over y
    resume_dir: Optional[str] = None,
    on_chunk_done=None,          # test hook: called with ci after each chunk
) -> np.ndarray:
    """Stream ``volume`` through the device in z-chunks; returns (or fills
    ``out`` with) the dense int32 instance labeling.

    ``mesh``: optional single-axis ``jax.sharding.Mesh`` — each z-chunk is
    then sharded along y across the mesh's devices (VERDICT r2 #1b: the
    streamed×sharded composition lets a >HBM volume use a whole pod slice;
    the 10+ GVoxel NORTH-STAR config 5 path). Results are identical to the
    single-device stream for instances fitting ``cfg.infer.shard_halo``.

    ``resume_dir``: optional directory for per-chunk progress checkpoints
    (SURVEY §5 failure recovery, VERDICT r2 #8). The normalization/
    calibration scalars and every completed chunk's reconciliation artifacts
    (ids, counts, boundary edges, overlap-plane state) persist there; a
    killed multi-hour stream restarted with the SAME arguments — including
    the same persistent ``out`` buffer (e.g. an ``np.memmap``), which holds
    the already-computed core labels — resumes from the first incomplete
    chunk instead of voxel zero. A mismatched geometry (shape/chunk_z/halo)
    invalidates the directory and restarts cleanly.

    ``stats``: optional dict filled with accumulated stage seconds
    (t_normalize_pass, t_calibrate_pass, t_chunks, t_finalize) — on tunneled
    or NFS-backed hosts the bottleneck is usually I/O, and this shows it.
    """
    import time as _time

    t_stage = _time.perf_counter
    _marks = {}

    def _mark(key):
        now = t_stage()
        if _marks:
            k0, t0 = _marks.popitem()
            if stats is not None:
                stats[k0] = round(stats.get(k0, 0.0) + (now - t0), 3)
        _marks[key] = now

    _mark("t_normalize_pass")
    D, H, W = volume.shape
    halo = cfg.infer.shard_halo if halo is None else halo
    chunks = [(z, min(z + chunk_z, D)) for z in range(0, D, chunk_z)]
    plane = H * W
    ext_z = chunk_z + 2 * halo
    assert ext_z * plane < 2**31, (
        "extended chunk exceeds int32 linear-index range; lower chunk_z/halo"
    )

    # ---- resume bookkeeping (VERDICT r2 #8) ----
    import json
    import os as _os

    geom = dict(D=D, H=H, W=W, chunk_z=chunk_z, halo=halo, bins=bins,
                sharded=int(mesh is not None))
    resume_meta = None
    if resume_dir is not None:
        _os.makedirs(resume_dir, exist_ok=True)
        meta_path = _os.path.join(resume_dir, "meta.json")
        if _os.path.exists(meta_path):
            with open(meta_path) as f:
                m = json.load(f)
            if m.get("geom") == geom:
                resume_meta = m
            else:
                for fn in _os.listdir(resume_dir):
                    _os.remove(_os.path.join(resume_dir, fn))

    # ---- pass 1: global percentile — ONE host pass over the source ----
    # min/max and the strided histogram sample are collected in the same
    # sweep (VERDICT r3 #4: the separate min/max + histogram passes each
    # re-read tens of GB at 10-GVoxel scale). The strided sample (1/stride
    # of the volume, source dtype) is cached in RAM, or spilled to a temp
    # dir beyond ``sample_cache_bytes``; either way the SOURCE is read once.
    # The histogram is then binned from the cached samples with the identical
    # fp32 arithmetic, so the normalization scalars are bit-equal to the
    # two-pass scheme (and to the fused/sharded paths).
    if resume_meta is not None:
        lo, hi = np.float32(resume_meta["lo"]), np.float32(resume_meta["hi"])
    elif normalize:
        import shutil
        import tempfile

        stride = max(cfg.data.normalize_sample_stride, 1)
        est_itemsize = (np.dtype(volume.dtype).itemsize
                        if hasattr(volume, "dtype") else 4)
        est_bytes = D * H * len(range(0, W, stride)) * est_itemsize
        spill_dir = (tempfile.mkdtemp(prefix="tpuseg_normcache_")
                     if est_bytes > sample_cache_bytes else None)
        # try/finally: the spill dir holds up to sample_cache_bytes of temp
        # files — reclaim it even when the sweep raises (ADVICE r4)
        try:
            sample_chunks = []
            gmin, gmax = np.inf, -np.inf
            for i, (z0, z1) in enumerate(chunks):
                c = np.asarray(volume[z0:z1])
                cf = c if c.dtype == np.float32 else c.astype(np.float32)
                gmin = min(gmin, float(cf.min()))
                gmax = max(gmax, float(cf.max()))
                s = np.ascontiguousarray(c[..., ::stride])
                if spill_dir is not None:
                    np.save(_os.path.join(spill_dir, f"s{i:06d}.npy"), s)
                    sample_chunks.append(None)
                else:
                    sample_chunks.append(s)
            span = max(gmax - gmin, 1e-12)
            hist = np.zeros(bins, np.int64)
            n_sampled = 0
            for i in range(len(chunks)):
                c = (np.load(_os.path.join(spill_dir, f"s{i:06d}.npy"))
                     if spill_dir is not None else sample_chunks[i])
                hist += _chunk_histogram(c, gmin, span, bins)
                n_sampled += c.size
            sample_chunks = None
        finally:
            if spill_dir is not None:
                shutil.rmtree(spill_dir, ignore_errors=True)
        # fp32 fraction-form CDF — the same arithmetic (and, with the x-axis
        # stride, the same voxel sample) as the fused/sharded paths
        cdf = np.cumsum(hist.astype(np.float32) / np.float32(n_sampled))

        def pct(p):
            # fp32 op-for-op mirror of the device-side pct_value so the
            # normalization scalars match the fused path bit-for-bit
            b = np.searchsorted(cdf, np.float32(p / 100.0))
            return np.float32(gmin) + (np.float32(b) + np.float32(0.5)) \
                / np.float32(bins) * np.float32(span)

        lo, hi = pct(cfg.data.normalize_pcts[0]), pct(cfg.data.normalize_pcts[1])
    else:
        lo, hi = 0.0, 1.0
    lo_j, hi_j = jnp.float32(lo), jnp.float32(hi)

    if mesh is not None:
        (axis,) = mesh.axis_names
        if H % mesh.shape[axis]:
            raise ValueError(
                f"volume H={H} must divide the mesh's {mesh.shape[axis]} "
                f"y-shards")
        fg_hist_fn, chunk_fn = _make_sharded_chunk_fns(
            model, cfg, halo, chunk_z, mesh, bins)
        from jax.sharding import PartitionSpec as P

        from tpuseg.parallel.multihost import put_global, put_replicated

        # variables may arrive committed to a single device; replicate them
        # over the mesh so they are co-addressable with the sharded chunks.
        # Both puts are multi-process safe (parallel/multihost.py): on a
        # multi-host slice every process feeds only its own y-slab.
        variables = put_replicated(variables, mesh)

        def _to_device(ext):
            return put_global(ext, mesh, P(None, axis, None))
    else:
        fg_hist_fn, chunk_fn = _make_chunk_fns(model, cfg, halo, chunk_z, bins)
        _to_device = jnp.asarray
    _mark("t_calibrate_pass")

    # ---- pass 1b: volume-matched fg-threshold calibration (extra net pass) ----
    if resume_meta is not None:
        fg_thr = resume_meta["fg_thr"]
    elif cfg.postproc.fg_target_fraction > 0:
        stride = cfg.data.normalize_sample_stride
        sample_plane = H * len(range(0, W, max(stride, 1)))
        fg_hist = np.zeros(bins, np.int64)
        n_core = 0
        for z0, z1 in chunks:
            ext, mask_top, mask_bot = _read_ext(volume, z0, z1, halo, ext_z, D)
            h = np.asarray(fg_hist_fn(
                variables, _to_device(ext), lo_j, hi_j,
                jnp.int32(mask_top), jnp.int32(mask_bot))).astype(np.int64)
            # short last chunk: fake planes inside the core window counted
            # prob-0.0 into bin 0 — remove them so the histogram covers
            # exactly the real (sampled) voxels
            fake_core = max(0, (z0 + chunk_z) - D) * sample_plane
            h[0] -= fake_core
            fg_hist += h
            n_core += chunk_z * sample_plane - fake_core
        assert n_core == D * sample_plane
        # same fraction arithmetic as ops.calibrate.threshold_for_fraction
        # (fp32, so the same bin is selected)
        tail = (np.cumsum(fg_hist[::-1])[::-1].astype(np.float32)
                / np.float32(n_core))
        b = int(np.sum(tail >= np.float32(cfg.postproc.fg_target_fraction)))
        fg_thr = float(np.clip((b - 0.5) / bins, 0.0, 1.0))
    else:
        fg_thr = cfg.postproc.fg_threshold

    if resume_dir is not None and resume_meta is None:
        with open(meta_path + ".tmp", "w") as f:
            json.dump({"geom": geom, "lo": float(lo), "hi": float(hi),
                       "fg_thr": float(fg_thr)}, f)
        _os.replace(meta_path + ".tmp", meta_path)

    _mark("t_chunks")
    # ---- pass 2: chunked net + watershed, host reconciliation ----
    # Pipelined three ways: while chunk N computes on device, (a) chunk N's
    # D2H copies are in flight (async), (b) the host reads + UPLOADS chunk
    # N+1 (VERDICT r2 #9 — the H2D transfer rides under compute N instead of
    # serializing ahead of compute N+1), and (c) the host ingests chunk N-1's
    # already-copied results. Only the core labels + ONE overlap plane are
    # downloaded (cropped on device).
    result = out if out is not None else np.zeros((D, H, W), np.int32)
    edge_chunks = []                 # (E_i, 2) int64 rename edges (global ids)
    id_chunks, count_chunks = [], [] # per-chunk GLOBAL instance ids and counts
    state = {"prev_overlap": None}   # previous chunk's global-id 1st-plane copy

    # resume: artifacts of completed chunks load from disk; their core labels
    # are already in the caller-provided persistent ``out`` buffer
    fin_path = (_os.path.join(resume_dir, "finalize.json")
                if resume_dir is not None else None)
    fin_done_upto = 0
    start_ci = 0
    if resume_meta is not None:
        if _os.path.exists(fin_path):
            with open(fin_path) as f:
                fin = json.load(f)
            if fin.get("complete"):
                # the previous run finished entirely; ``result`` already
                # holds the final dense labeling — do NOT re-lift it
                if stats is not None:
                    stats["resumed_complete"] = True
                return result
            fin_done_upto = int(fin.get("done_upto", 0))

        def _chunk_path(ci):
            return _os.path.join(resume_dir, f"chunk_{ci:06d}.npz")

        while _os.path.exists(_chunk_path(start_ci)):
            start_ci += 1
        for ci in range(start_ci):
            a = np.load(_chunk_path(ci))
            id_chunks.append(a["ids"])
            count_chunks.append(a["counts"])
            if a["edges"].size:
                edge_chunks.append(a["edges"])
            if ci == start_ci - 1 and bool(a["has_overlap"]):
                ov = a["overlap"]
                off = np.int64(chunks[ci][0] - halo) * plane
                state["prev_overlap"] = np.where(
                    ov > 0, ov.astype(np.int64) + off, 0)

    # multi-process (parallel/multihost.py): chunk outputs are GLOBAL
    # arrays spanning non-addressable devices — gather them to every host
    # before ingestion (each process keeps the full result buffer; the
    # host finalize is process-local and identical everywhere). The
    # replicated n_trunc scalar reads from the local shard.
    multi = jax.process_count() > 1

    def _fetch(a):
        if not multi:
            return np.asarray(a)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))

    def _fetch_repl(a):
        return np.asarray(a.addressable_shards[0].data) if multi \
            else np.asarray(a)

    def process(ci, z0, z1, core_dev, overlap_dev, me_lo_dev, me_hi_dev,
                ntr_dev):
        cz = z1 - z0
        nt = int(_fetch_repl(ntr_dev))
        if nt and stats is not None:
            # flood-cap truncation, summed over chunks (ext windows overlap,
            # so this upper-bounds the distinct voxel count; zero iff every
            # chunk's flood converged) — the real-chip-visible channel
            stats["flood_truncated_voxels"] = (
                stats.get("flood_truncated_voxels", 0) + nt)
        offset = np.int64(z0 - halo) * plane
        core = _fetch(core_dev)[:cz]                     # int32 LOCAL ids
        result[z0:z1] = core                             # lifted at finalize

        core0_global = np.where(core[0] > 0, core[0].astype(np.int64) + offset, 0)
        # merge against previous chunk's redundant copy of our first plane
        prev_overlap = state["prev_overlap"]
        edges_ci = np.zeros((0, 2), np.int64)
        if prev_overlap is not None:
            both = (core0_global > 0) & (prev_overlap > 0) \
                & (core0_global != prev_overlap)
            if both.any():
                edges_ci = np.stack([core0_global[both].ravel(),
                                     prev_overlap[both].ravel()], axis=-1)
        # saddle-merge edges (ops/merge.py, r4): lifted to global ids like
        # everything else and unioned by the SAME finalize closure
        ml = _fetch(me_lo_dev)
        mh = _fetch(me_hi_dev)
        mv = ml != 2**31 - 1
        if mv.any():
            ge = np.stack([ml[mv].astype(np.int64) + offset,
                           mh[mv].astype(np.int64) + offset], axis=-1)
            edges_ci = np.concatenate([edges_ci, ge]) if edges_ci.size else ge
        if edges_ci.size:
            edge_chunks.append(edges_ci)
        if halo > 0 and z1 < D:
            nxt = _fetch(overlap_dev)
            state["prev_overlap"] = np.where(
                nxt > 0, nxt.astype(np.int64) + offset, 0)
        else:
            nxt = None
            state["prev_overlap"] = None

        ids, counts = np.unique(core[core > 0], return_counts=True)
        id_chunks.append(ids.astype(np.int64) + offset)
        count_chunks.append(counts)

        if resume_dir is not None:
            p = _os.path.join(resume_dir, f"chunk_{ci:06d}.npz")
            tmp = p + ".tmp.npz"
            np.savez_compressed(
                tmp, ids=id_chunks[-1], counts=counts.astype(np.int64),
                edges=edges_ci,
                overlap=(nxt if nxt is not None
                         else np.zeros((0, 0), np.int32)),
                has_overlap=np.bool_(nxt is not None))
            _os.replace(tmp, p)
        if on_chunk_done is not None:
            on_chunk_done(ci)

    def _upload(ci):
        z0, z1 = chunks[ci]
        ext, mask_top, mask_bot = _read_ext(volume, z0, z1, halo, ext_z, D)
        return _to_device(ext), jnp.int32(mask_top), jnp.int32(mask_bot)

    fg_thr_j = jnp.float32(fg_thr)
    pending = None
    nxt_up = _upload(start_ci) if start_ci < len(chunks) else None
    for ci in range(start_ci, len(chunks)):
        z0, z1 = chunks[ci]
        ext_dev, mt, mb = nxt_up
        core_dev, overlap_dev, me_lo_dev, me_hi_dev, ntr_dev = chunk_fn(
            variables, ext_dev, lo_j, hi_j, mt, mb, fg_thr_j)
        if not multi:  # async D2H pipelining needs addressable arrays
            for a in (core_dev, overlap_dev, me_lo_dev, me_hi_dev, ntr_dev):
                a.copy_to_host_async()
        # read + upload chunk N+1 while chunk N computes
        nxt_up = _upload(ci + 1) if ci + 1 < len(chunks) else None
        if pending is not None:
            process(*pending)
        pending = (ci, z0, z1, core_dev, overlap_dev, me_lo_dev, me_hi_dev,
                   ntr_dev)
    if pending is not None:
        process(*pending)

    _mark("t_finalize")
    # ---- finalize: union roots, global size filter, dense compaction ----
    edges = (np.concatenate(edge_chunks) if edge_chunks
             else np.zeros((0, 2), np.int64))
    keys, reps = _closure_numpy(edges)

    all_ids = np.concatenate(id_chunks) if id_chunks else np.zeros(0, np.int64)
    all_counts = np.concatenate(count_chunks) if count_chunks else np.zeros(0, np.int64)

    def rename(vals):
        if len(keys) == 0:
            return vals
        pos = np.clip(np.searchsorted(keys, vals), 0, len(keys) - 1)
        hit = keys[pos] == vals
        return np.where(hit, reps[pos], vals)

    roots = rename(all_ids)
    uniq_roots, inv = np.unique(roots, return_inverse=True)
    root_sizes = np.zeros(len(uniq_roots), np.int64)
    np.add.at(root_sizes, inv, all_counts)
    kept = root_sizes >= cfg.postproc.min_size
    rank_of_root = np.where(kept, np.cumsum(kept), 0)  # dense 1..K over kept

    # per-original-id rename table: global id -> dense rank of its (kept) root
    sort_ids = np.unique(all_ids)
    id_rank = rank_of_root[
        np.searchsorted(uniq_roots, rename(sort_ids))
    ].astype(np.int32)

    # in-place lift + rename, one chunk at a time; only foreground voxels go
    # through the searchsorted rename (int64 transients are fg-sized, and on
    # sparse trained-net outputs this is ~30x less host work per chunk).
    # With a resume_dir the lift progress persists per chunk (finalize.json)
    # so a kill DURING finalization resumes without double-renaming chunks.
    def _write_fin(payload):
        if fin_path is not None:
            with open(fin_path + ".tmp", "w") as f:
                json.dump(payload, f)
            _os.replace(fin_path + ".tmp", fin_path)

    # torn-chunk protection: the chunk being lifted when a kill lands is
    # neither raw nor final — restore it from the one-chunk raw backup
    bk_path = (_os.path.join(resume_dir, "lift_backup.npz")
               if resume_dir is not None else None)
    if bk_path is not None and _os.path.exists(bk_path):
        bk = np.load(bk_path)
        ci_bk = int(bk["ci"])
        if ci_bk >= fin_done_upto and ci_bk < len(chunks):
            z0b, z1b = chunks[ci_bk]
            result[z0b:z1b] = bk["core"]

    for ci, (z0, z1) in enumerate(chunks):
        if ci < fin_done_upto:
            continue  # already lifted by the interrupted finalize pass
        core = result[z0:z1]
        if bk_path is not None:
            np.savez_compressed(bk_path + ".tmp.npz", ci=ci, core=core)
            _os.replace(bk_path + ".tmp.npz", bk_path)
        if len(sort_ids):
            fgm = core > 0
            vals = core[fgm].astype(np.int64) + np.int64(z0 - halo) * plane
            pos = np.clip(np.searchsorted(sort_ids, vals), 0, len(sort_ids) - 1)
            hit = sort_ids[pos] == vals
            renamed = np.where(hit, id_rank[pos], 0).astype(np.int32)
            out_chunk = np.zeros_like(core)
            out_chunk[fgm] = renamed
            result[z0:z1] = out_chunk
        else:
            result[z0:z1] = 0
        _write_fin({"done_upto": ci + 1})
    if bk_path is not None and _os.path.exists(bk_path):
        _os.remove(bk_path)
    _write_fin({"complete": True})
    _mark("end")
    return result
