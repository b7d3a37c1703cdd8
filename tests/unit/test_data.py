"""Data layer: synthetic volumes, normalization, sampler, I/O (SURVEY.md C1-C3)."""

import numpy as np
import pytest

from tpuseg.data import PatchSampler, percentile_normalize, synthesize_volume
from tpuseg.data.volume_io import (
    load_annotations,
    load_volume,
    save_annotations,
    save_volume,
)


@pytest.fixture(scope="module")
def vol():
    return synthesize_volume(shape=(32, 64, 64), num_instances=8, seed=3)


def test_synthetic_consistency(vol):
    assert vol.image.shape == (32, 64, 64)
    assert vol.image.dtype == np.float32
    k = len(vol.centers)
    assert k >= 6
    assert set(np.unique(vol.labels)) <= set(range(k + 1))
    # each center voxel belongs to its own instance
    for i, c in enumerate(vol.centers):
        assert vol.labels[tuple(np.round(c).astype(int))] == i + 1


def test_percentile_normalize_range(vol):
    out = np.asarray(percentile_normalize(vol.image * 517.0 + 33.0))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.max() == pytest.approx(1.0, abs=1e-3)


def test_sampler_shapes_and_determinism(vol):
    s1 = PatchSampler([vol], patch_size=(16, 16, 16), batch_size=4,
                      max_instances=8, seed=7)
    s2 = PatchSampler([vol], patch_size=(16, 16, 16), batch_size=4,
                      max_instances=8, seed=7)
    b1, b2 = s1.next_batch(), s2.next_batch()
    assert b1["image"].shape == (4, 16, 16, 16)
    assert b1["centers"].shape == (4, 8, 3)
    assert b1["valid"].dtype == bool
    for k in b1:
        assert np.array_equal(b1[k], b2[k])
    # different steps differ
    b3 = s1.next_batch()
    assert not np.array_equal(b1["image"], b3["image"])


def test_sampler_resume_from_state(vol):
    s1 = PatchSampler([vol], patch_size=(16, 16, 16), batch_size=2, seed=5)
    s1.next_batch()
    state = s1.state_dict()
    want = s1.next_batch()
    s2 = PatchSampler([vol], patch_size=(16, 16, 16), batch_size=2, seed=99)
    s2.load_state_dict(state)
    got = s2.next_batch()
    assert np.array_equal(want["image"], got["image"])


def test_sampler_centers_inside_patch(vol):
    s = PatchSampler([vol], patch_size=(16, 16, 16), batch_size=8, seed=1)
    b = s.next_batch()
    c = b["centers"][b["valid"]]
    assert (c >= 0).all() and (c < 16).all()


@pytest.mark.parametrize("ext", ["npy", "npz", "h5", "tif"])
def test_volume_io_roundtrip(tmp_path, vol, ext):
    path = str(tmp_path / f"v.{ext}")
    data = (vol.image * 65535).astype(np.uint16)
    save_volume(path, data)
    back = load_volume(path)
    assert np.array_equal(back, data)


def test_label_volume_tiff_roundtrip(tmp_path, vol):
    path = str(tmp_path / "lab.tiff")
    save_volume(path, vol.labels)
    back = load_volume(path)
    assert np.array_equal(back, vol.labels)


def test_annotations_roundtrip(tmp_path, vol):
    path = str(tmp_path / "ann.npz")
    save_annotations(path, vol.centers, vol.half_sizes)
    c, h = load_annotations(path)
    assert np.allclose(c, vol.centers)
    assert np.allclose(h, vol.half_sizes)


def test_histogram_percentile_close_to_exact(vol):
    from tpuseg.data.normalize import histogram_percentile_normalize

    x = vol.image * 517.0 + 33.0
    exact = np.asarray(percentile_normalize(x))
    approx = np.asarray(histogram_percentile_normalize(x))
    assert np.abs(exact - approx).max() < 0.01


def test_sampler_preserves_integer_source_dtype(vol):
    """uint16 microscopy sources feed the train step without a host float
    upcast (4x smaller H2D upload); the f32 cast happens on device inside
    prepare_batch's normalization — and training math is IDENTICAL to a
    pre-cast f32 source because histogram normalization maps both to the
    same [0,1] values."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpuseg.core import Config, DataConfig, ModelConfig, TrainConfig
    from tpuseg.data.sampler import PatchSampler
    from tpuseg.models import build_model
    from tpuseg.train.step import create_train_state, make_train_step

    v16 = dataclasses.replace(
        vol, image=(np.clip(vol.image, 0, 1) * 65535).astype(np.uint16))
    s = PatchSampler([v16], patch_size=(16, 16, 16), batch_size=2,
                     max_instances=8)
    batch = s.next_batch()
    assert batch["image"].dtype == np.uint16
    assert batch["centers"].dtype == np.float32

    cfg = Config(
        model=ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                          compute_dtype="float32"),
        data=DataConfig(patch_size=(16, 16, 16), batch_size=2,
                        max_instances=8),
        train=TrainConfig(total_steps=2, warmup_steps=1),
    )
    model = build_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, cfg))
    state, metrics = step(state, jax.device_put(batch), jax.random.key(1))
    assert bool(jnp.isfinite(metrics["loss"]))

    # identical loss to feeding the f32-cast batch (cast commutes with the
    # device-side normalization)
    b32 = dict(batch, image=batch["image"].astype(np.float32))
    state2 = create_train_state(model, cfg, jax.random.key(0))
    _, metrics32 = step(state2, jax.device_put(b32), jax.random.key(1))
    assert float(metrics["loss"]) == float(metrics32["loss"])


def test_bin_counts_matches_scatter_exactly():
    """ops.histogram.bin_counts (sort-based) must equal the scatter-add
    histogram bin-for-bin — every normalization/calibration parity contract
    rides on this equivalence."""
    import jax.numpy as jnp

    from tpuseg.ops.histogram import bin_counts

    rng = np.random.default_rng(11)
    for bins, n in [(16, 0), (16, 1), (64, 1000), (4096, 50_000)]:
        idx = rng.integers(0, bins, size=n).astype(np.int32)
        got = np.asarray(bin_counts(jnp.asarray(idx), bins))
        ref = np.bincount(idx, minlength=bins).astype(np.int32)
        np.testing.assert_array_equal(got, ref)
        assert got.dtype == np.int32

    # degenerate: every value in one bin (incl. the edge bins)
    for b in (0, 7, 15):
        idx = np.full((257,), b, np.int32)
        got = np.asarray(bin_counts(jnp.asarray(idx), 16))
        assert got[b] == 257 and got.sum() == 257
