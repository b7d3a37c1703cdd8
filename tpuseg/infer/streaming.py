"""Host-streamed whole-volume inference for volumes larger than HBM
(NORTH-STAR config 5's single-chip leg: "10+ GVoxel ... microscopy stacks
stream from host to device").

The volume streams through the device in z-chunks with ``halo`` planes of
context (two passes):

pass 1: a psum-free histogram over all chunks fixes the GLOBAL percentile
        normalization (identical scaling for every chunk);
pass 2: each extended chunk runs the jitted net-sweep + watershed; labels
        come back as LOCAL extended-chunk indices (int32, always < 2^31) and
        the host lifts them to GLOBAL int64 ids (offset add — order
        preserving, so chunk results agree on shared basins exactly like the
        sharded path). Chunk-boundary instances are reconciled by a host
        union-find over the redundantly-computed overlap plane; instance
        sizes accumulate globally; a final pass applies union + size filter +
        dense 1..K compaction.

The chunk pipeline is ONE compiled XLA program reused for every chunk (static
chunk shape); the host does only I/O, the tiny union-find, and the relabel
table lookups. Output ordering and values match the fused single-shot
pipeline exactly when instance extents fit within the halo
(tests/unit/test_streaming.py asserts elementwise equality).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import Config
from tpuseg.core.dtypes import resolve
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


def _make_chunk_fn(model, cfg: Config, ext_shape):
    compute_dtype = resolve(cfg.infer.compute_dtype)

    def apply_fn(variables, x):
        return model.apply(variables, x)

    @jax.jit
    def chunk_fn(variables, ext, lo, hi, mask_top, mask_bot):
        ext = jnp.clip((ext.astype(jnp.float32) - lo) / jnp.maximum(hi - lo, 1e-6),
                       0.0, 1.0)
        out = tiled_forward(
            apply_fn, variables, ext,
            tile=cfg.infer.tile, halo=cfg.infer.halo,
            tile_batch=cfg.infer.tile_batch, compute_dtype=compute_dtype,
        )
        fg = jax.nn.sigmoid(out["fg_logits"].astype(jnp.float32))
        pk = jax.nn.sigmoid(out["peak_logits"].astype(jnp.float32))
        # mask fake (edge-replicated) halo regions at the global volume ends
        z = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 0)
        fake = (z < mask_top) | (z >= ext.shape[0] - mask_bot)
        fg = jnp.where(fake, 0.0, fg)
        pk = jnp.where(fake, 0.0, pk)
        labels = watershed(
            fg, pk,
            peak_threshold=cfg.postproc.peak_threshold,
            fg_threshold=cfg.postproc.fg_threshold,
            peak_radius=cfg.postproc.nms_radius,
            flood_iters=cfg.postproc.flood_iters,
            method=cfg.postproc.method,
            ascent_rounds=cfg.postproc.ascent_rounds,
            nms_impl=cfg.postproc.nms_impl,
        )
        return labels  # int32 local ext-chunk indices (+1), unfiltered

    return chunk_fn


def _chunk_histogram(vol_chunk: np.ndarray, lo: float, span: float, bins: int):
    idx = np.clip(((vol_chunk.astype(np.float32) - lo) / span * bins), 0,
                  bins - 1).astype(np.int64)
    return np.bincount(idx.ravel(), minlength=bins)


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
) -> np.ndarray:
    """Stream ``volume`` through the device in z-chunks; returns (or fills
    ``out`` with) the dense int32 instance labeling."""
    D, H, W = volume.shape
    halo = cfg.infer.shard_halo if halo is None else halo
    # intermediate global ids need int64 (10+ GVoxel volumes overflow int32
    # linear indices); the final dense labeling fits int32
    tmp = np.zeros((D, H, W), np.int64)

    chunks = [(z, min(z + chunk_z, D)) for z in range(0, D, chunk_z)]
    plane = H * W

    # ---- pass 1: global percentile from a streamed histogram ----
    if normalize:
        gmin, gmax = np.inf, -np.inf
        for z0, z1 in chunks:
            c = np.asarray(volume[z0:z1], np.float32)
            gmin, gmax = min(gmin, float(c.min())), max(gmax, float(c.max()))
        span = max(gmax - gmin, 1e-12)
        hist = np.zeros(bins, np.int64)
        for z0, z1 in chunks:
            hist += _chunk_histogram(np.asarray(volume[z0:z1]), gmin, span, bins)
        cdf = np.cumsum(hist)

        def pct(p):
            b = np.searchsorted(cdf, cdf[-1] * (p / 100.0))
            return gmin + (b + 0.5) / bins * span

        lo, hi = pct(cfg.data.normalize_pcts[0]), pct(cfg.data.normalize_pcts[1])
    else:
        lo, hi = 0.0, 1.0

    # ---- pass 2: chunked net + watershed, host reconciliation ----
    ext_z = chunk_z + 2 * halo
    chunk_fn = None
    edge_chunks = []                 # (E_i, 2) int64 rename edges
    id_chunks, count_chunks = [], [] # per-chunk instance ids and voxel counts
    prev_overlap = None  # previous chunk's labels for the next core plane

    for ci, (z0, z1) in enumerate(chunks):
        cz = z1 - z0
        # read extended chunk, clipping + edge-replicating at volume ends
        lo_z, hi_z = z0 - halo, z1 + halo
        r0, r1 = max(lo_z, 0), min(hi_z, D)
        ext = np.asarray(volume[r0:r1], np.float32)
        pad_top, pad_bot = r0 - lo_z, hi_z - r1
        # also pad short last chunks up to the static ext shape
        pad_static = ext_z - (pad_top + ext.shape[0] + pad_bot)
        if pad_top or pad_bot or pad_static:
            ext = np.pad(ext, ((pad_top, pad_bot + pad_static), (0, 0), (0, 0)),
                         mode="edge")
        if chunk_fn is None:
            chunk_fn = _make_chunk_fn(model, cfg, ext.shape)
        mask_top = pad_top                      # fake planes at global start
        mask_bot = pad_bot + pad_static         # fake planes at global end
        labels_ext = np.asarray(
            chunk_fn(variables, jnp.asarray(ext), jnp.float32(lo), jnp.float32(hi),
                     jnp.int32(mask_top), jnp.int32(mask_bot))
        ).astype(np.int64)
        offset = np.int64(z0 - halo) * plane
        labels_ext = np.where(labels_ext > 0, labels_ext + offset, 0)

        core = labels_ext[halo : halo + cz]
        tmp[z0:z1] = core

        # merge against previous chunk's redundant copy of our first plane
        if prev_overlap is not None:
            mine = core[0]
            both = (mine > 0) & (prev_overlap > 0) & (mine != prev_overlap)
            if both.any():
                edge_chunks.append(
                    np.stack([mine[both].ravel(), prev_overlap[both].ravel()],
                             axis=-1)
                )
        prev_overlap = labels_ext[halo + cz] if halo + cz < ext_z else None

        ids, counts = np.unique(core[core > 0], return_counts=True)
        id_chunks.append(ids)
        count_chunks.append(counts)

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
    rank_of_root = np.where(kept, np.cumsum(kept), 0)  # dense 1..K over kept roots

    # per-original-id rename table: id -> dense rank of its (kept) root
    sort_ids = np.unique(all_ids)
    id_rank = rank_of_root[
        np.searchsorted(uniq_roots, rename(sort_ids))
    ]

    result = out if out is not None else np.zeros((D, H, W), np.int32)
    for z0, z1 in chunks:
        core = tmp[z0:z1]
        if len(sort_ids):
            pos = np.clip(np.searchsorted(sort_ids, core), 0, len(sort_ids) - 1)
            hit = (core > 0) & (sort_ids[pos] == core)
            result[z0:z1] = np.where(hit, id_rank[pos], 0).astype(result.dtype)
        else:
            result[z0:z1] = 0
    return result
