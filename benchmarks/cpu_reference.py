"""CPU reference pipeline — the baseline denominator (SURVEY.md §6).

Reimplements what the reference repo's test.py does, with the reference's
technology choices (SURVEY.md L0/L5/L6): torch-CPU eager net, per-tile
host-driven sliding window, and numpy/scipy post-processing
(maximum_filter peak NMS -> seeded watershed via scipy.ndimage.watershed_ift
-> connected-component relabel -> size filter). Measured Mvox/s from this
script is the denominator of the NORTH-STAR ">=5x CPU-reference" target
(BASELINE.md: "the CPU-reference denominator must be measured, not read").

Run: python benchmarks/cpu_reference.py [--volume D H W] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def cpu_postprocess(fg_prob, peak_prob, peak_threshold=0.5, fg_threshold=0.5,
                    nms_radius=2, min_size=27):
    """scipy/numpy instance extraction, reference-style (SURVEY.md C11-C13)."""
    import scipy.ndimage as ndi

    k = 2 * nms_radius + 1
    mx = ndi.maximum_filter(peak_prob, size=(k, k, k), mode="nearest")
    seeds = (peak_prob >= peak_threshold) & (peak_prob >= mx)
    markers, _ = ndi.label(seeds)

    fg = fg_prob >= fg_threshold
    # watershed_ift wants uint8/16 input costs: flood cheap fg first
    cost = (255 * (1.0 - fg_prob)).astype(np.uint8)
    markers_ws = markers.astype(np.int32)
    markers_ws[~fg] = -1  # background marker
    labels = ndi.watershed_ift(cost, markers_ws)
    labels[labels < 0] = 0
    labels[~fg] = 0

    if min_size > 0:
        ids, counts = np.unique(labels[labels > 0], return_counts=True)
        small = set(ids[counts < min_size].tolist())
        if small:
            mask = np.isin(labels, list(small))
            labels[mask] = 0
    # compact relabel
    ids = np.unique(labels)
    remap = np.zeros(ids.max() + 1 if len(ids) else 1, np.int32)
    remap[ids] = np.arange(len(ids))
    return remap[labels]


def run_cpu_reference(volume: np.ndarray, model_cfg=None, tile=(32, 128, 128),
                      halo=16, variables=None) -> dict:
    """Sliding-window torch-CPU forward + scipy post-proc; returns timings.

    ``variables``: optional flax variable collections — loaded into the torch
    mirror so the CPU denominator runs the SAME trained weights as the TPU
    pipeline (apples-to-apples; ckpt.torch_import.torch_state_dict_from_flax).
    """
    import torch

    from tpuseg.ckpt.torch_mirror import build_torch_mirror
    from tpuseg.core import ModelConfig

    torch.set_num_threads(max(1, torch.get_num_threads()))
    model = build_torch_mirror(model_cfg or ModelConfig()).eval()
    if variables is not None:
        from tpuseg.ckpt.torch_import import torch_state_dict_from_flax

        model.load_state_dict(torch_state_dict_from_flax(variables))

    D, H, W = volume.shape
    # percentile normalize (host numpy, like the reference)
    lo, hi = np.percentile(volume, [1.0, 99.8])
    vol = np.clip((volume - lo) / max(hi - lo, 1e-6), 0.0, 1.0).astype(np.float32)

    td, th, tw = tile
    pad = ((halo, halo + (-D) % td), (halo, halo + (-H) % th), (halo, halo + (-W) % tw))
    vp = np.pad(vol, pad, mode="edge")
    Dp, Hp, Wp = D + pad[0][1] - halo, H + pad[1][1] - halo, W + pad[2][1] - halo

    fg = np.zeros((Dp, Hp, Wp), np.float32)
    pk = np.zeros((Dp, Hp, Wp), np.float32)

    t0 = time.perf_counter()
    with torch.no_grad():
        for z in range(0, Dp, td):
            for y in range(0, Hp, th):
                for x in range(0, Wp, tw):
                    block = vp[z : z + td + 2 * halo,
                               y : y + th + 2 * halo,
                               x : x + tw + 2 * halo]
                    out = model(torch.from_numpy(block[None, None]))
                    fg[z : z + td, y : y + th, x : x + tw] = (
                        out["fg_logits"][0, halo : halo + td,
                                         halo : halo + th,
                                         halo : halo + tw].numpy()
                    )
                    pk[z : z + td, y : y + th, x : x + tw] = (
                        out["peak_logits"][0, halo : halo + td,
                                           halo : halo + th,
                                           halo : halo + tw].numpy()
                    )
    t_net = time.perf_counter() - t0

    fg = 1.0 / (1.0 + np.exp(-fg[:D, :H, :W]))
    pk = 1.0 / (1.0 + np.exp(-pk[:D, :H, :W]))
    t1 = time.perf_counter()
    labels = cpu_postprocess(fg, pk)
    t_post = time.perf_counter() - t1

    total = t_net + t_post
    return {
        "voxels": int(volume.size),
        "t_net_s": t_net,
        "t_post_s": t_post,
        "t_total_s": total,
        "mvox_per_s": volume.size / total / 1e6,
        "n_instances": int(labels.max()),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--volume", type=int, nargs=3, default=(32, 256, 256),
                   help="measurement volume (extrapolates per-voxel cost)")
    p.add_argument("--json", default=None, help="write result JSON here")
    args = p.parse_args()

    from tpuseg.data import synthesize_volume

    vol = synthesize_volume(shape=tuple(args.volume), num_instances=40, seed=0)
    res = run_cpu_reference(vol.image)
    print(json.dumps(res, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f)


if __name__ == "__main__":
    main()
