"""Multislice DCN mesh mapping (SURVEY §7 phase 5, VERDICT r2 #5): the z
axis must span slices over DCN and y must stay inside a slice on ICI. These
tests would catch a transposed dcn_mesh_shape / slice-grouping bug without a
real multislice deployment."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core import Config, InferConfig, PostprocConfig
from tpuseg.data import synthesize_volume
from tpuseg.data.normalize import percentile_normalize
from tpuseg.infer import (
    arrange_multislice_devices,
    make_infer_fn,
    make_multislice_zy_mesh,
    make_sharded_infer_fn,
    multislice_mesh_shapes,
    shard_volume,
)


def fake_devices(n_slices, per_slice):
    """Devices interleaved across slices (ids NOT grouped by slice) so a
    grouping bug can't pass by accident."""
    devs = []
    for j in range(per_slice):
        for s in range(n_slices):
            devs.append(types.SimpleNamespace(id=j * n_slices + s,
                                              slice_index=s))
    return devs


def test_multislice_mesh_shapes_axis_assignment():
    mesh_shape, dcn_shape = multislice_mesh_shapes(2, 4)
    # global mesh = elementwise product = (2 slices on z, 4 chips on y)
    assert tuple(a * b for a, b in zip(mesh_shape, dcn_shape)) == (2, 4)
    # the DCN (inter-slice) extent must sit on axis 0 (z) ONLY
    assert dcn_shape == (2, 1)
    # the ICI (intra-slice) extent must sit on axis 1 (y) ONLY
    assert mesh_shape == (1, 4)


def test_arrange_multislice_devices_rows_are_slices():
    devs = fake_devices(2, 4)
    arr = arrange_multislice_devices(devs, 2, 4)
    assert arr.shape == (2, 4)
    for i in range(2):
        slices = {arr[i, j].slice_index for j in range(4)}
        assert slices == {i}, (
            f"mesh row {i} (a z position) mixes slices {slices} — z halos "
            "would cross DCN boundaries mid-slice")
    # within a row, deterministic id order
    ids = [arr[0, j].id for j in range(4)]
    assert ids == sorted(ids)


def test_arrange_multislice_devices_rejects_bad_topology():
    devs = fake_devices(2, 4)
    with pytest.raises(ValueError):
        arrange_multislice_devices(devs, 4, 2)  # wrong slice count
    with pytest.raises(ValueError):
        arrange_multislice_devices(devs[:-1], 2, 4)  # ragged slice


def test_virtual_two_slice_zy_inference_matches_single_device():
    """Dryrun-grade end-to-end: a (2, 4) mesh built through the multislice
    path (2 virtual slices of 4 CPU devices, slice id injected) must run the
    full sharded inference and match the single-device labeling."""
    from flax import linen as nn

    class AnalyticNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            v = x[..., 0].astype(jnp.float32)
            return {"fg_logits": (v - 0.35) * 25.0,
                    "peak_logits": (v - 0.75) * 25.0}

    cfg = Config(
        infer=InferConfig(tile=(8, 8, 32), halo=4, compute_dtype="float32",
                          shard_halo=8, shard_max_labels=256),
        postproc=PostprocConfig(peak_threshold=0.5, fg_threshold=0.5,
                                nms_radius=2, min_size=5, flood_iters=16),
    )
    mesh = make_multislice_zy_mesh(
        2, 4, devices=jax.devices(), slice_index_fn=lambda d: d.id // 4)
    assert mesh.shape == {"z": 2, "y": 4}

    vol = synthesize_volume(shape=(32, 32, 32), num_instances=10,
                            radius_range=(3.0, 5.0), noise=0.0, seed=9)
    model = AnalyticNet()
    variables = {"params": {}}
    v = np.asarray(percentile_normalize(vol.image))

    want = np.asarray(make_infer_fn(model, cfg, normalize=False)(
        variables, jnp.asarray(v)))
    got = np.asarray(make_sharded_infer_fn(model, cfg, mesh, normalize=False)(
        variables, shard_volume(jnp.asarray(v), mesh)))
    np.testing.assert_array_equal(got, want)
