"""r5 diagnosis of the c5 aniso misses + merge_saddle_ratio sweep.

VERDICT r4 weak #3: on `touch65_aniso035` the trained checkpoint detects
384/400 instances (center recall 0.935) — the saddle merge (built for
z-split DUPLICATES) cannot fix MISSES, and nobody had triaged them.
This script:

1. reproduces the exact bench c5 aniso cell with the cached checkpoint,
   and classifies every missed GT instance: peak response at/near its
   center vs peak_threshold, fg coverage, NMS seed presence inside the
   instance, and whether its center voxel was absorbed by a neighbor
   (merge vs true no-detection);
2. sweeps PostprocConfig.merge_saddle_ratio over the full c5 matrix + the
   c3 standard volume (VERDICT r4 weak #6/#8: the merge default was never
   swept, and c3 showed 602/600 duplicate-seed instances), reporting
   F1@IoU0.5 / center-F1 / n_pred per (fixture, ratio) so the bench
   default is a measured decision.

Usage: python benchmarks/aniso_miss_diag.py [out.json]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import VOLUME_SHAPE, get_trained_variables
    from tpuseg.core import Config
    from tpuseg.data import synthesize_touching_volume, synthesize_volume
    from tpuseg.eval.instance_f1 import instance_metrics
    from tpuseg.infer import make_infer_fn
    from tpuseg.infer.pipeline import _make_infer_body
    from tpuseg.models import build_model
    from tpuseg.ops.calibrate import (expected_fg_fraction,
                                      nms_radius_from_half_sizes)
    from tpuseg.utils import hard_sync

    cfg = Config()
    trained, _ = get_trained_variables(cfg)
    c3 = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, conv_impl="zdecomp"),
        infer=dataclasses.replace(cfg.infer, tile=(96, 256, 512), halo=(0, 8, 0),
                                  tile_batch=1, program="staged"),
    )
    model = build_model(c3.model)
    out = {"fixtures": {}}

    fixtures = {
        "standard600": dict(kind="std"),
        "touch60_snr20": dict(touch_factor=0.6, noise=0.05),
        "touch60_snr8": dict(touch_factor=0.6, noise=0.12),
        "touch50_overlap": dict(touch_factor=0.5, noise=0.05),
        "touch70_gradient": dict(touch_factor=0.7, noise=0.05, gradient=0.3),
        "touch65_aniso035": dict(touch_factor=0.65, noise=0.05,
                                 anisotropy=(0.35, 1.0, 1.0)),
    }
    # full ratio set where the decision lives (duplicate-seed cells);
    # on/off elsewhere (each ratio is a separate XLA program through the
    # ~2 min remote compile tunnel)
    full = [0.0, 0.6, 0.7, 0.8, 0.9]
    onoff = [0.0, 0.8]

    for name, kw in fixtures.items():
        ratios = full if name in ("standard600", "touch65_aniso035") else onoff
        if kw.get("kind") == "std":
            tv = synthesize_volume(shape=VOLUME_SHAPE, num_instances=600,
                                   radius_range=(5.0, 9.0), seed=7)
        else:
            tv = synthesize_touching_volume(
                shape=VOLUME_SHAPE, num_pairs=150, num_singles=100,
                radius_range=(5.0, 8.0), seed=17, **kw)
        frac = expected_fg_fraction(tv.half_sizes, tv.image.size)
        nms_r = nms_radius_from_half_sizes(tv.half_sizes)
        rows = {}
        img_dev = jnp.asarray(tv.image)
        for ratio in ratios:
            rcfg = dataclasses.replace(c3, postproc=dataclasses.replace(
                c3.postproc, fg_target_fraction=frac, nms_radius=nms_r,
                merge_saddle_ratio=ratio))
            lab = np.asarray(make_infer_fn(model, rcfg, bind_variables=trained)(
                img_dev))
            mi = instance_metrics(lab, tv.labels, iou_threshold=0.5)
            mc = instance_metrics(lab, tv.labels, criterion="center")
            rows[str(ratio)] = {
                "n_pred": mi["n_pred"],
                "f1_iou50": round(mi["f1"], 4),
                "f1_center": round(mc["f1"], 4),
                "recall_center": round(mc["recall"], 4),
                "precision_center": round(mc["precision"], 4),
            }
            print(f"{name} ratio={ratio}: {rows[str(ratio)]}", flush=True)
            if name == "touch65_aniso035" and ratio == 0.0:
                lab0 = lab
        out["fixtures"][name] = {"n_gt": int(tv.labels.max()),
                                 "nms_radius": list(nms_r),
                                 "by_ratio": rows}
        if name == "touch65_aniso035":
            aniso_tv, aniso_frac, aniso_nms = tv, frac, nms_r

    # ---- miss triage on the aniso cell (ratio 0 labeling) ----
    dcfg = dataclasses.replace(c3, postproc=dataclasses.replace(
        c3.postproc, fg_target_fraction=aniso_frac, nms_radius=aniso_nms))
    _, stage_net, _ = _make_infer_body(model, dcfg, normalize=True)
    net_out = jax.jit(lambda v: stage_net(trained, v))(
        jnp.asarray(aniso_tv.image))
    fg_prob = np.asarray(jax.nn.sigmoid(net_out["fg_logits"]))
    pk_prob = np.asarray(jax.nn.sigmoid(net_out["peak_logits"]))
    hard_sync(jnp.asarray(pk_prob[:1, :1, :1]))

    gt = aniso_tv.labels
    pred = lab0
    # per-GT centroids
    triage = {"no_peak_above_thr": 0, "peak_but_no_seed_basin": 0,
              "merged_into_neighbor": 0, "other": 0}
    details = []
    pthr = dcfg.postproc.peak_threshold
    claimed = {}
    centers = {}
    for g in range(1, gt.max() + 1):
        idx = np.argwhere(gt == g)
        c = idx.mean(axis=0).round().astype(int)
        centers[g] = (c, idx)
        p = pred[tuple(c)]
        if p > 0:
            claimed.setdefault(p, []).append(g)
    detected = {gs[0] for p, gs in claimed.items() if len(gs) == 1}
    for p, gs in claimed.items():
        if len(gs) > 1:
            detected.add(gs[0])  # first claim wins; the rest are merged-in
    for g in range(1, gt.max() + 1):
        if g in detected:
            continue
        c, idx = centers[g]
        mask = tuple(idx.T)
        pk_at_center = float(pk_prob[tuple(c)])
        pk_max_inst = float(pk_prob[mask].max())
        fg_cov = float((fg_prob[mask] >= 0.5).mean())
        pred_at_center = int(pred[tuple(c)])
        pred_cov = float((pred[mask] > 0).mean())
        if pk_max_inst < pthr:
            cat = "no_peak_above_thr"
        elif pred_at_center > 0 or pred_cov > 0.5:
            cat = "merged_into_neighbor"
        elif pred_cov < 0.05:
            cat = "peak_but_no_seed_basin"
        else:
            cat = "other"
        triage[cat] += 1
        details.append(dict(gt=g, cat=cat, pk_center=round(pk_at_center, 3),
                            pk_max=round(pk_max_inst, 3),
                            fg_cov=round(fg_cov, 3),
                            pred_cov=round(pred_cov, 3)))
    out["aniso_miss_triage"] = {"counts": triage, "details": details[:40]}
    print("TRIAGE:", json.dumps(triage), flush=True)

    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "benchmarks", "results_aniso_diag_r5.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst)


if __name__ == "__main__":
    main()
