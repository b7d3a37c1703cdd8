"""Post-proc parity vs the scipy oracle (VERDICT r1 item 3; BASELINE.json
north_star "instance F1 within 0.5 pts of reference").

The reference's post-processing is CPU scipy: maximum_filter peak NMS ->
scipy.ndimage.watershed_ift -> CC relabel -> size filter (SURVEY.md C11-C13;
re-implemented verbatim-in-spirit as benchmarks/cpu_reference.cpu_postprocess,
the measured baseline denominator). These tests feed the SAME fg/peak
probability maps through that oracle and through the on-device
``ops.watershed`` + ``size_filter_and_compact`` pipeline and require
instance-level F1 >= 0.995 between the two labelings — i.e. the TPU pipeline
reproduces the reference's *semantics*, not just the synthetic ground truth.

Maps are built from synthetic GT the same way the trained net would see them:
the peak map is a sum of center gaussians (what the peak head regresses,
tpuseg/data/weak_targets.py) and the fg map is the blob intensity (what the
box-supervised fg head learns, up to the calibration bias).
"""

from __future__ import annotations

import numpy as np
import pytest

from benchmarks.cpu_reference import cpu_postprocess
from tpuseg.data import synthesize_volume
from tpuseg.eval import instance_metrics
from tpuseg.ops import size_filter_and_compact, watershed


def make_prob_maps(seed: int, shape=(48, 96, 96), num_instances=14):
    """(fg_prob, peak_prob) float32 maps derived from synthetic GT.

    fg is a sigmoid of the normalized ellipsoid distance crossing 0.5 exactly
    at the GT instance boundary (what a trained box-supervised fg head
    approximates after calibration); peak is a gaussian bump at each center
    (what the peak head regresses, tpuseg/data/weak_targets.py)."""
    vol = synthesize_volume(
        shape=shape, num_instances=num_instances, radius_range=(4.0, 7.0),
        noise=0.02, seed=seed,
    )
    D, H, W = shape
    peak = np.zeros(shape, np.float32)
    fg = np.zeros(shape, np.float32)
    zz, yy, xx = np.meshgrid(
        np.arange(D, dtype=np.float32),
        np.arange(H, dtype=np.float32),
        np.arange(W, dtype=np.float32),
        indexing="ij",
    )
    sigma = 2.5
    for c, r in zip(vol.centers, vol.half_sizes):
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        peak = np.maximum(peak, np.exp(-0.5 * d2 / sigma**2).astype(np.float32))
        e2 = (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
              + ((xx - c[2]) / r[2]) ** 2)
        fg = np.maximum(fg, 1.0 / (1.0 + np.exp(np.minimum((e2 - 1.0) * 8.0, 60.0))))
    return fg.astype(np.float32), peak, vol


@pytest.mark.parametrize("method", ["ascent", "flood"])
def test_instance_f1_parity_vs_scipy_oracle(method):
    """TPU watershed (both methods) matches scipy watershed_ift at F1 >= 0.995
    on the same maps, across 5 seeds."""
    f1s = []
    for seed in range(5):
        fg, peak, _ = make_prob_maps(seed)
        oracle = cpu_postprocess(fg, peak, peak_threshold=0.5, fg_threshold=0.5,
                                 nms_radius=2, min_size=27)
        ours = np.asarray(
            size_filter_and_compact(
                watershed(fg, peak, peak_threshold=0.5, fg_threshold=0.5,
                          peak_radius=2, flood_iters=96, method=method),
                27,
            )
        )
        m = instance_metrics(ours, oracle, iou_threshold=0.5)
        f1s.append(m["f1"])
    assert min(f1s) >= 0.995, f"per-seed F1 vs scipy oracle: {f1s}"


def test_voxel_agreement_vs_scipy_oracle():
    """Beyond instance matching: the matched instances should cover ~the same
    voxels (mean matched IoU high) — guards against degenerate matches."""
    fg, peak, _ = make_prob_maps(seed=11)
    oracle = cpu_postprocess(fg, peak)
    ours = np.asarray(
        size_filter_and_compact(watershed(fg, peak, flood_iters=96), 27)
    )
    m = instance_metrics(ours, oracle, iou_threshold=0.5)
    assert m["f1"] >= 0.995
    assert m["mean_matched_iou"] >= 0.90, m


def make_touching_prob_maps(seed: int, shape=(48, 96, 96)):
    """Maps from TOUCHING-pair GT (VERDICT r2 #3's oracle leg): the fg map is
    one fused component per pair; the peak map keeps two distinct bumps."""
    from tpuseg.data import synthesize_touching_volume

    vol = synthesize_touching_volume(
        shape=shape, num_pairs=7, num_singles=3, radius_range=(4.5, 6.5),
        touch_factor=0.6, noise=0.02, seed=seed)
    D, H, W = shape
    peak = np.zeros(shape, np.float32)
    fg = np.zeros(shape, np.float32)
    zz, yy, xx = np.meshgrid(
        np.arange(D, dtype=np.float32), np.arange(H, dtype=np.float32),
        np.arange(W, dtype=np.float32), indexing="ij")
    sigma = 2.5
    for c, r in zip(vol.centers, vol.half_sizes):
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        peak = np.maximum(peak, np.exp(-0.5 * d2 / sigma**2).astype(np.float32))
        e2 = (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
              + ((xx - c[2]) / r[2]) ** 2)
        fg = np.maximum(fg, 1.0 / (1.0 + np.exp(np.minimum((e2 - 1.0) * 8.0, 60.0))))
    return fg.astype(np.float32), peak, vol


@pytest.mark.parametrize("method", ["ascent", "flood"])
def test_touching_instances_beat_scipy_oracle_vs_gt(method):
    """On TOUCHING instances — where watershed semantics actually bite — the
    TPU pipeline must score F1 >= 0.99 against GROUND TRUTH and never lose to
    the scipy oracle on the same maps.

    Measured (2026-08-17, seeds 0-2): ours-vs-GT F1 = 1.000 on every seed,
    while scipy watershed_ift itself UNDER-SEGMENTS touching pairs (merges
    them: 13/11 instances vs 17 GT, F1 0.867/0.643) — so blind parity to the
    oracle is the wrong criterion here; "within 0.5 pts of reference"
    (BASELINE.json north_star) is satisfied by strictly beating it."""
    from scipy import ndimage as ndi

    for seed in range(3):
        fg, peak, vol = make_touching_prob_maps(seed)
        gt = np.asarray(vol.labels)
        oracle = cpu_postprocess(fg, peak, peak_threshold=0.5, fg_threshold=0.5,
                                 nms_radius=2, min_size=27)
        ours = np.asarray(
            size_filter_and_compact(
                watershed(fg, peak, peak_threshold=0.5, fg_threshold=0.5,
                          peak_radius=2, flood_iters=96, method=method),
                27,
            )
        )
        m_ours = instance_metrics(ours, gt, iou_threshold=0.5)
        m_oracle = instance_metrics(np.asarray(oracle), gt, iou_threshold=0.5)
        # we must actually SEPARATE the pairs: more instances than connected
        # components of the fused foreground...
        n_fused = int(ndi.label(fg > 0.5)[1])
        assert int(ours.max()) > n_fused, (int(ours.max()), n_fused)
        # ...score near-perfectly vs GT, and never lose to the reference
        assert m_ours["f1"] >= 0.99, (seed, m_ours)
        assert m_ours["f1"] >= m_oracle["f1"] - 1e-9, (seed, m_ours, m_oracle)
