"""Adversarial quality: TOUCHING instances (VERDICT r2 #3). The reference
method's raison d'être is separating touching nuclei that a plain foreground
threshold would fuse — these tests exercise exactly that regime through the
full fused pipeline, with the analytic net isolating post-proc capability
from training quality (the trained-net matrix runs in bench.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tpuseg.core import Config, InferConfig, PostprocConfig
from tpuseg.data import synthesize_touching_volume
from tpuseg.eval.instance_f1 import instance_metrics
from tpuseg.infer import make_infer_fn


class AnalyticNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        v = x[..., 0].astype(jnp.float32)
        return {"fg_logits": (v - 0.35) * 25.0, "peak_logits": (v - 0.75) * 25.0}


CFG = Config(
    infer=InferConfig(tile=(16, 32, 32), halo=4, compute_dtype="float32"),
    postproc=PostprocConfig(peak_threshold=0.5, fg_threshold=0.5,
                            nms_radius=2, min_size=20, flood_iters=24),
)


def run_pipeline(vol):
    infer = make_infer_fn(AnalyticNet(), CFG, normalize=False)
    return np.asarray(infer({"params": {}}, jnp.asarray(vol.image)))


def fused_fraction(vol, fg_level=0.35):
    """How many GT pairs a plain fg threshold fuses into one component —
    documents that the fixture is actually adversarial."""
    from scipy import ndimage

    cc, _ = ndimage.label(vol.image >= fg_level)
    fused = 0
    k = vol.centers.shape[0]
    for a in range(0, k - 1, 2):  # pairs are consecutive (2i, 2i+1)
        ca = np.round(vol.centers[a]).astype(int)
        cb = np.round(vol.centers[a + 1]).astype(int)
        if cc[tuple(ca)] > 0 and cc[tuple(ca)] == cc[tuple(cb)]:
            fused += 1
    return fused


def test_touching_pairs_separated():
    """touch_factor 0.6: saddle intensity ~0.49 — well above the fg level, so
    every pair is ONE foreground component; the peak-NMS + watershed must
    still cut them apart."""
    vol = synthesize_touching_volume(
        shape=(48, 96, 96), num_pairs=8, num_singles=4,
        radius_range=(5.0, 7.0), touch_factor=0.6, noise=0.02, seed=1)
    assert fused_fraction(vol) >= 6, "fixture not adversarial enough"

    pred = run_pipeline(vol)
    m_center = instance_metrics(pred, vol.labels, criterion="center")
    assert m_center["f1"] >= 0.9, m_center
    m_iou = instance_metrics(pred, vol.labels, iou_threshold=0.3)
    assert m_iou["f1"] >= 0.85, m_iou


def test_touching_pairs_overlapping_heavily():
    """touch_factor 0.5 = centers one radius apart: the hardest separable
    case (saddle ~0.61, peaks still distinct at nms_radius=2)."""
    vol = synthesize_touching_volume(
        shape=(48, 96, 96), num_pairs=8, num_singles=0,
        radius_range=(5.5, 6.5), touch_factor=0.5, noise=0.02, seed=2)
    pred = run_pipeline(vol)
    m = instance_metrics(pred, vol.labels, criterion="center")
    assert m["f1"] >= 0.8, m


@pytest.mark.parametrize("noise", [0.05, 0.12])
def test_touching_pairs_snr_sweep(noise):
    vol = synthesize_touching_volume(
        shape=(48, 96, 96), num_pairs=8, num_singles=4,
        radius_range=(5.0, 7.0), touch_factor=0.65, noise=noise, seed=3)
    pred = run_pipeline(vol)
    m = instance_metrics(pred, vol.labels, criterion="center")
    floor = 0.9 if noise <= 0.05 else 0.75
    assert m["f1"] >= floor, (noise, m)


def test_touching_pairs_strong_anisotropy():
    """Anisotropic-PSF stress (VERDICT r2 missing #3): z compressed to 0.4x
    (typical confocal z-PSF), so pairs touching along z are only ~2 voxels
    of z-saddle apart and every blob is a flat ellipsoid. The 3-D NMS +
    watershed must still separate them without any anisotropy-aware tuning."""
    vol = synthesize_touching_volume(
        shape=(48, 96, 96), num_pairs=8, num_singles=4,
        radius_range=(5.0, 7.0), touch_factor=0.65, noise=0.02,
        anisotropy=(0.4, 1.0, 1.0), seed=5)
    assert fused_fraction(vol) >= 5, "fixture not adversarial enough"
    pred = run_pipeline(vol)
    m = instance_metrics(pred, vol.labels, criterion="center")
    assert m["f1"] >= 0.85, m


def test_anisotropy_derived_nms_radius_recovers_z_pairs():
    """At 0.35x z-compression, pairs touching along z put their peaks within
    an isotropic radius-2 NMS window — one peak suppresses the other and the
    whole instance vanishes. The per-axis radius derived from the SAME weak
    annotations that calibrate the fg threshold (calibrate.
    nms_radius_from_half_sizes) shrinks only the z footprint and recovers
    them; in-plane suppression (duplicate-seed control) is unchanged."""
    from tpuseg.ops.calibrate import nms_radius_from_half_sizes

    vol = synthesize_touching_volume(
        shape=(48, 96, 96), num_pairs=10, num_singles=4,
        radius_range=(5.0, 8.0), touch_factor=0.65, noise=0.02,
        anisotropy=(0.35, 1.0, 1.0), seed=7)

    derived = nms_radius_from_half_sizes(vol.half_sizes)
    assert derived == (1, 2, 2)

    def score(radius):
        ccfg = dataclasses.replace(CFG, postproc=dataclasses.replace(
            CFG.postproc, nms_radius=radius))
        infer = make_infer_fn(AnalyticNet(), ccfg, normalize=False)
        pred = np.asarray(infer({"params": {}}, jnp.asarray(vol.image)))
        return instance_metrics(pred, vol.labels, criterion="center")

    m_iso = score(2)
    m_der = score(derived)
    # with seed 7 the isotropic window provably loses a z-pair instance
    assert m_iso["recall"] < 1.0
    assert m_der["tp"] > m_iso["tp"]
    assert m_der["precision"] == 1.0  # smaller z window adds no duplicates
    assert m_der["f1"] >= 0.99, (m_iso, m_der)


def test_touching_with_illumination_gradient_needs_calibration():
    """A 40% x-falloff breaks fixed thresholds on the far side; the
    volume-calibrated fg threshold must keep recall up."""
    vol = synthesize_touching_volume(
        shape=(48, 96, 96), num_pairs=8, num_singles=4,
        radius_range=(5.0, 7.0), touch_factor=0.7, noise=0.02,
        gradient=0.4, seed=4)

    # lower peak threshold: the gradient scales peak heights down to ~0.6x
    ccfg = dataclasses.replace(
        CFG, postproc=dataclasses.replace(
            CFG.postproc, peak_threshold=0.25, fg_target_fraction=0.0))
    infer = make_infer_fn(AnalyticNet(), ccfg, normalize=False)
    pred = np.asarray(infer({"params": {}}, jnp.asarray(vol.image)))
    m = instance_metrics(pred, vol.labels, criterion="center")
    assert m["f1"] >= 0.75, m
