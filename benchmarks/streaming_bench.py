"""GVoxel-scale streamed inference demo (VERDICT r1 item 6: "demonstrate
streaming at >= 1 GVoxel and fix its memory story").

Builds a ~1.2-GVoxel synthetic light-sheet-like stack chunk-by-chunk into a
disk memmap (never holding the volume in RAM), then runs
``tpuseg.infer.stream_infer`` with the trained bench checkpoint
(.bench/weights_r2.msgpack — bench.py trains/caches it) and volume-matched
calibration, writing labels into an int32 memmap. Records Mvox/s and instance
count to STREAMING.json.

Host memory: the streaming path holds only the int32 result (memmapped here)
plus chunk-sized transients — the round-1 int64 full-volume intermediate is
gone, which is what makes this run possible at all.

Run: python benchmarks/streaming_bench.py [D H W] (defaults 288 2048 2048)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_JSON = os.path.join(REPO, "STREAMING.json")


def build_volume(path, shape, num_instances=2500, seed=0, chunk_z=32):
    """Chunk-wise blob rendering into a float32 memmap (bounded RAM)."""
    rng = np.random.default_rng(seed)
    D, H, W = shape
    r_lo, r_hi = 5.0, 10.0
    centers = np.stack([
        rng.uniform(r_hi, D - r_hi, num_instances),
        rng.uniform(r_hi, H - r_hi, num_instances),
        rng.uniform(r_hi, W - r_hi, num_instances),
    ], axis=1).astype(np.float32)
    radii = rng.uniform(r_lo, r_hi, (num_instances, 1)).astype(np.float32) \
        * np.array([[0.6, 1.0, 1.0]], np.float32)

    # uint16, like real microscopy stacks — and half the host->device bytes
    # on the ~94 MB/s upload tunnel (the device normalizes whatever dtype)
    vol = np.lib.format.open_memmap(path, mode="w+", dtype=np.uint16,
                                    shape=shape)
    order = np.argsort(centers[:, 0])
    centers, radii = centers[order], radii[order]
    zi = 0
    for z0 in range(0, D, chunk_z):
        z1 = min(z0 + chunk_z, D)
        chunk = rng.normal(0.0, 0.05, (z1 - z0, H, W)).astype(np.float32)
        # blobs whose z-extent intersects this chunk
        while zi < num_instances and centers[zi, 0] + 2.5 * radii[zi, 0] < z0:
            zi += 1
        j = zi
        while j < num_instances and centers[j, 0] - 2.5 * radii[j, 0] < z1:
            c, r = centers[j], radii[j]
            lo = np.maximum(np.floor(c - 2.5 * r).astype(int), [z0, 0, 0])
            hi = np.minimum(np.ceil(c + 2.5 * r).astype(int) + 1, [z1, H, W])
            if np.all(hi > lo):
                zz, yy, xx = np.meshgrid(
                    np.arange(lo[0], hi[0], dtype=np.float32),
                    np.arange(lo[1], hi[1], dtype=np.float32),
                    np.arange(lo[2], hi[2], dtype=np.float32), indexing="ij")
                d2 = (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
                      + ((xx - c[2]) / r[2]) ** 2)
                blob = np.exp(-0.5 * d2 * 4.0).astype(np.float32)
                sl = (slice(lo[0] - z0, hi[0] - z0), slice(lo[1], hi[1]),
                      slice(lo[2], hi[2]))
                chunk[sl] = np.maximum(chunk[sl], blob)
            j += 1
        vol[z0:z1] = (np.clip(chunk, 0.0, 1.0) * 65535).astype(np.uint16)
    vol.flush()
    return centers, radii


def main():
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax

    from bench import WEIGHTS_CACHE, get_trained_variables, make_cfg
    from tpuseg.infer import stream_infer
    from tpuseg.models import build_model
    from tpuseg.ops.calibrate import adaptive_upper_pct, expected_fg_fraction

    # deep-z shape: ext chunks (chunk_z + 2*halo, 1024, 1024) hold ~8 live
    # f32 volume-sized buffers through the fused chunk program — (D, 2048,
    # 2048) planes blew HBM (25.4 GB needed of 15.75)
    shape = tuple(int(a) for a in sys.argv[1:4]) or (1152, 1024, 1024)
    if len(shape) != 3:
        shape = (1152, 1024, 1024)
    gvox = float(np.prod(shape)) / 1e9
    vol_path = "/tmp/stream_vol.npy"
    lab_path = "/tmp/stream_labels.npy"

    print(f"building {shape} ({gvox:.2f} GVox) memmap fixture...", flush=True)
    t0 = time.perf_counter()
    # constant instance DENSITY across scales (the r3 1.2-GVox run used 2500
    # ≈ 2070/GVox), so the 10+ GVox leg stresses the same per-voxel regime
    n_inst = max(2500, int(round(2070 * gvox)))
    centers, radii = build_volume(vol_path, shape, num_instances=n_inst)
    np.save("/tmp/stream_centers.npy", centers)  # kept for FP diagnosis
    np.save("/tmp/stream_radii.npy", radii)
    t_build = time.perf_counter() - t0
    print(f"  built in {t_build:.0f}s", flush=True)

    cfg = make_cfg()
    model = build_model(cfg.model)
    variables, _ = get_trained_variables(cfg)
    frac = expected_fg_fraction(radii, int(np.prod(shape)))
    # sparse GVoxel stacks: keep the upper normalization percentile OUT of
    # the foreground intensity range or instance cores saturate into
    # plateaus and over-segment (ops.calibrate.adaptive_upper_pct)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, normalize_pcts=(1.0, adaptive_upper_pct(frac))),
        postproc=dataclasses.replace(
            cfg.postproc, fg_target_fraction=frac, peak_threshold=0.35,
            # prominence agglomeration (ops/merge.py): the aniso-trained
            # peak head is z-flat on these 0.6-compressed blobs and bf16
            # ripple fires duplicate z-seeds (~4% over-segmentation,
            # diagnosed r4: FP centroids |dz|~2.5, |dyx|~0.3 off GT
            # centers); saddle ratio 0.8 collapses flat-top splits while
            # touching pairs keep their valley
            merge_saddle_ratio=0.8))

    vol = np.load(vol_path, mmap_mode="r")
    out = np.lib.format.open_memmap(lab_path, mode="w+", dtype=np.int32,
                                    shape=shape)
    # warmup: one-chunk run compiles both chunk programs (identical static
    # ext shapes) so the recorded throughput measures execution, not the
    # remote-tunnel compile (~minutes); persistent cache keeps reruns warm
    print("warmup (compile)...", flush=True)
    stream_infer(model, cfg, variables, vol[:64], chunk_z=64, halo=16)
    print("streaming inference...", flush=True)
    stats = {}
    t0 = time.perf_counter()
    # chunk_z 64 (r4): the saddle-merge transients on a (128, 1024, 1024)
    # extended chunk pushed the joint program over HBM (worker crash);
    # (96, 1024, 1024) ext chunks fit with margin
    labels = stream_infer(model, cfg, variables, vol, out=out, chunk_z=64,
                          halo=16, stats=stats)
    dt = time.perf_counter() - t0
    n = int(labels.max())

    # ---- quality scoring (VERDICT r2 #4): center-criterion F1 vs the known
    # GT centers via point reads — dense contingency is impossible at GVoxel
    # scale — plus a streamed size histogram to diagnose over-segmentation.
    from tpuseg.eval import center_match_f1

    fm = center_match_f1(labels, centers, n_pred=n)
    sizes = np.zeros(n + 1, np.int64)
    for z0 in range(0, shape[0], 96):
        c = labels[z0:z0 + 96]
        sizes += np.bincount(c[c > 0].ravel(), minlength=n + 1)
    pred_sizes = sizes[1:]
    res = {
        "metric": "streamed_infer_mvox_per_s_per_chip",
        "gvoxels": round(gvox, 3),
        "shape": list(shape),
        "t_total_s": round(dt, 1),
        "mvox_per_s": round(np.prod(shape) / dt / 1e6, 2),
        "n_instances": n,
        "n_instances_gt": int(len(centers)),
        "f1_center": round(fm["f1"], 4),
        "recall_center": round(fm["recall"], 4),
        "precision_center": round(fm["precision"], 4),
        "pred_size_quartiles": [int(q) for q in np.percentile(
            pred_sizes, [25, 50, 75])] if n else [],
        "pred_below_2x_min_size": int((pred_sizes < 2 * cfg.postproc.min_size).sum()),
        "calibrated": True,
        "normalize_upper_pct": round(adaptive_upper_pct(frac), 4),
        "chunk_z": 64,
        "halo": 16,
        "stats": stats,  # stage seconds + flood_truncated_voxels (r5:
                         # the real-chip-visible convergence channel)
        "device": str(jax.devices()[0]),
        "host_label_buffer": "int32 memmap (4 B/voxel); no full-volume int64",
    }
    out_json = os.environ.get("TPUSEG_STREAM_JSON", OUT_JSON)
    with open(out_json, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    if not os.environ.get("TPUSEG_STREAM_KEEP"):
        os.remove(vol_path)
        os.remove(lab_path)


if __name__ == "__main__":
    main()
