"""GSPMD-sharded halo-exchange inference on the 8-device fake CPU mesh
(SURVEY.md §4.3, NORTH-STAR config 5): the sharded pipeline must produce the
SAME instance-label volume as the single-device fused pipeline.

Equality contract: sharding is exact when instance basins (plus flood
absorption) fit within ``shard_halo`` of a boundary — guaranteed for real
blob-like probability maps, NOT for an untrained net emitting noise (noise
basins reach arbitrarily far). So the parity tests run a deterministic
analytic "net" over synthetic nuclei; the real U-Net goes through the same
code path in the e2e/bench flows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tpuseg.core import Config, InferConfig, ModelConfig, PostprocConfig
from tpuseg.data import synthesize_volume
from tpuseg.data.normalize import percentile_normalize
from tpuseg.infer import (
    make_infer_fn,
    make_sharded_infer_fn,
    make_z_mesh,
    make_zy_mesh,
    shard_volume,
)
from tpuseg.parallel.halo import exchange_z_halo
from tpuseg.parallel.reconcile import _closure_table, apply_label_map


class AnalyticNet(nn.Module):
    """Deterministic stand-in for a trained U-Net: pointwise logits derived
    from the (already blob-shaped) input intensities. RF = 0, so any halo is
    sufficient and single-vs-sharded equality is exactly the reconciliation
    contract under test."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = x[..., 0].astype(jnp.float32)
        return {
            "fg_logits": (v - 0.35) * 25.0,
            "peak_logits": (v - 0.75) * 25.0,
        }


@pytest.fixture(scope="module")
def cfg():
    return Config(
        infer=InferConfig(tile=(8, 32, 32), halo=4, compute_dtype="float32",
                          shard_halo=8, shard_max_labels=256),
        postproc=PostprocConfig(peak_threshold=0.5, fg_threshold=0.5,
                                nms_radius=2, min_size=5, flood_iters=16),
    )


@pytest.fixture(scope="module")
def volume():
    return synthesize_volume(shape=(64, 32, 32), num_instances=8,
                             radius_range=(3.0, 5.0), noise=0.0, seed=4)


def test_halo_exchange_matches_padded():
    mesh = make_z_mesh()
    vol = np.random.default_rng(0).random((32, 8, 8)).astype(np.float32)

    def body(slab):
        return exchange_z_halo(slab, 2, "z")

    out = jax.jit(
        shard_map(body, mesh=mesh, in_specs=P("z"), out_specs=P("z"),
                  check_rep=False)
    )(shard_volume(jnp.asarray(vol), mesh))
    ext = np.asarray(out).reshape(8, 8, 8, 8)
    padded = np.pad(vol, ((2, 2), (0, 0), (0, 0)), mode="edge")
    for i in range(8):
        np.testing.assert_array_equal(ext[i], padded[i * 4 : i * 4 + 8])


def test_closure_table_merges_chains():
    edges = jnp.asarray([[5, 9], [9, 120], [7, 7], [0, 3], [40, 2]], jnp.int32)
    keys, reps = _closure_table(edges)
    lab = jnp.asarray([[5, 9, 120, 7, 3, 40, 2, 1]], jnp.int32)
    out = np.asarray(apply_label_map(lab, keys, reps))[0]
    assert out[0] == out[1] == out[2] == 5   # 5-9-120 chain -> 5
    assert out[3] == 7                        # self-edge no-op
    assert out[4] == 3                        # inactive edge (0) ignored
    assert out[5] == out[6] == 2              # 40-2 -> 2
    assert out[7] == 1                        # untouched label unchanged


def test_sharded_equals_single_device(cfg, volume):
    model = AnalyticNet()
    variables = {"params": {}}
    mesh = make_z_mesh()
    v = np.asarray(percentile_normalize(volume.image))

    single = make_infer_fn(model, cfg, normalize=False)
    want = np.asarray(single(variables, jnp.asarray(v)))
    assert want.max() >= 6  # the fixture must actually contain instances

    sharded = make_sharded_infer_fn(model, cfg, mesh, normalize=False)
    got = np.asarray(sharded(variables, shard_volume(jnp.asarray(v), mesh)))

    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_sharded_instances_cross_boundaries(cfg, volume):
    """The fixture must exercise the interesting case: at least one instance
    spanning a shard boundary (slab depth 8)."""
    model = AnalyticNet()
    mesh = make_z_mesh()
    v = np.asarray(percentile_normalize(volume.image))
    got = np.asarray(
        make_sharded_infer_fn(model, cfg, mesh, normalize=False)(
            {"params": {}}, shard_volume(jnp.asarray(v), mesh))
    )
    crossing = 0
    for lbl in np.unique(got[got > 0]):
        zs = np.argwhere(got == lbl)[:, 0]
        if (zs // 8).min() != (zs // 8).max():
            crossing += 1
    assert crossing >= 2, f"only {crossing} boundary-crossing instances"


def test_sharded_normalization_close_to_exact(cfg, volume):
    model = AnalyticNet()
    variables = {"params": {}}
    mesh = make_z_mesh()
    raw = volume.image * 900.0 + 100.0  # un-normalized intensities

    single = make_infer_fn(model, cfg, normalize=True)
    want = np.asarray(single(variables, jnp.asarray(raw)))
    sharded = make_sharded_infer_fn(model, cfg, mesh, normalize=True)
    got = np.asarray(sharded(variables, shard_volume(jnp.asarray(raw), mesh)))

    # histogram percentile is approximate: demand near-identical labelings
    agree = (got == want).mean()
    assert agree > 0.999, agree


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_sharded_2d_zy_equals_single_device(cfg, mesh_shape):
    """SURVEY §7 phase 5: the 2-D (z, y) spatial mesh must reproduce the
    single-device labeling elementwise — including instances crossing z
    boundaries, y boundaries, and corners (merged transitively through one
    gathered closure)."""
    vol = synthesize_volume(shape=(32, 32, 32), num_instances=10,
                            radius_range=(3.0, 5.0), noise=0.0, seed=9)
    model = AnalyticNet()
    variables = {"params": {}}
    v = np.asarray(percentile_normalize(vol.image))

    want = np.asarray(make_infer_fn(model, cfg, normalize=False)(
        variables, jnp.asarray(v)))
    assert want.max() >= 6

    mesh = make_zy_mesh(mesh_shape)
    got = np.asarray(make_sharded_infer_fn(model, cfg, mesh, normalize=False)(
        variables, shard_volume(jnp.asarray(v), mesh)))
    np.testing.assert_array_equal(got, want)

    # the fixture must exercise y-boundary (and ideally corner) crossings
    hl = 32 // mesh_shape[1]
    crossing_y = 0
    for lbl in np.unique(got[got > 0]):
        ys = np.argwhere(got == lbl)[:, 1]
        if (ys // hl).min() != (ys // hl).max():
            crossing_y += 1
    assert crossing_y >= 2, f"only {crossing_y} y-boundary-crossing instances"


def test_sharded_2d_corner_crossing_instance(cfg):
    """An instance centered exactly on a (z, y) shard CORNER spans four
    shards at once; the single gathered union-find closure must merge its
    names transitively (z-edges + y-edges, no direct diagonal exchange)."""
    import dataclasses

    shape = (32, 32, 32)
    mesh = make_zy_mesh((2, 4))           # corner at z=16, y-boundaries at 8k
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                             indexing="ij")
    img = np.zeros(shape, np.float32)
    for c in [(16.0, 16.0, 16.0),         # dead on the z=16/y=16 corner
              (16.0, 8.0, 24.0),          # on a y boundary only
              (8.0, 24.0, 8.0)]:          # interior
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        img = np.maximum(img, np.exp(-0.5 * d2 / 9.0).astype(np.float32))

    # halo 8 >= blob radius (~4.3 at the fg threshold): within the exactness
    # contract, so the corner instance must come out elementwise identical
    ccfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, shard_halo=8))
    model = AnalyticNet()
    variables = {"params": {}}

    want = np.asarray(make_infer_fn(model, ccfg, normalize=False)(
        variables, jnp.asarray(img)))
    got = np.asarray(make_sharded_infer_fn(model, ccfg, mesh, normalize=False)(
        variables, shard_volume(jnp.asarray(img), mesh)))
    np.testing.assert_array_equal(got, want)

    # the corner blob must actually occupy all four quadrants with ONE label
    corner_label = got[16, 16, 16]
    assert corner_label > 0
    quads = {(z // 16, y // 16)
             for z, y, x in np.argwhere(got == corner_label)}
    assert quads == {(0, 0), (0, 1), (1, 0), (1, 1)}, quads


@pytest.mark.parametrize("mesh_shape", [(2, 4)])
def test_sharded_2d_normalize_and_calibration(cfg, mesh_shape):
    """2-D mesh with histogram normalization + calibrated fg threshold still
    matches the single-device pipeline."""
    import dataclasses

    ccfg = dataclasses.replace(
        cfg, postproc=dataclasses.replace(cfg.postproc, fg_target_fraction=0.03)
    )
    vol = synthesize_volume(shape=(32, 32, 32), num_instances=10,
                            radius_range=(3.0, 5.0), noise=0.0, seed=9)
    model = AnalyticNet()
    variables = {"params": {}}
    raw = vol.image * 900.0 + 100.0

    want = np.asarray(make_infer_fn(model, ccfg, normalize=True)(
        variables, jnp.asarray(raw)))
    mesh = make_zy_mesh(mesh_shape)
    got = np.asarray(make_sharded_infer_fn(model, ccfg, mesh, normalize=True)(
        variables, shard_volume(jnp.asarray(raw), mesh)))
    agree = (got == want).mean()
    assert agree > 0.999, agree


@pytest.mark.slow
def test_sharded_equals_single_device_real_unet():
    """VERDICT r1 item 4: the REAL U-Net (2-level, RF=11) through the sharded
    path on the 8-device mesh, with trained-enough weights, must equal the
    single-device fused pipeline elementwise — proving conv-halo + BN +
    reconciliation compose for a net with RF > 0 across shard boundaries.

    shard_halo=16 >= RF(11) + flood margin; slab depth 128/8 = 16 >= halo.
    Calibration (fg_target_fraction) keeps the partially-trained fg mask
    blob-shaped so basins satisfy the halo locality contract.
    """
    import dataclasses

    from tpuseg.core import DataConfig, TrainConfig
    from tpuseg.models import build_model
    from tpuseg.ops.calibrate import expected_fg_fraction
    from tpuseg.train import train

    vol = synthesize_volume(shape=(128, 48, 48), num_instances=24,
                            radius_range=(3.5, 5.5), seed=7)
    frac = expected_fg_fraction(vol.half_sizes, vol.image.size)
    tcfg = Config(
        model=ModelConfig(features=(8, 16), num_groups=4, head_features=8,
                          compute_dtype="float32"),
        data=DataConfig(patch_size=(24, 24, 24), batch_size=2,
                        max_instances=16, peak_sigma=2.5),
        train=TrainConfig(total_steps=120, warmup_steps=10, lr=3e-3,
                          log_every=60, ckpt_every=10_000),
        infer=InferConfig(tile=(16, 24, 24), halo=12, compute_dtype="float32",
                          shard_halo=16, shard_max_labels=256),
        postproc=PostprocConfig(peak_threshold=0.35, fg_threshold=0.5,
                                nms_radius=2, min_size=20, flood_iters=12,
                                fg_target_fraction=frac),
    )
    state, _ = train(tcfg, [vol])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    model = build_model(tcfg.model)

    want = np.asarray(make_infer_fn(model, tcfg)(
        variables, jnp.asarray(vol.image)))
    assert want.max() >= 12  # trained well enough to find most nuclei

    mesh = make_z_mesh()
    got = np.asarray(make_sharded_infer_fn(model, tcfg, mesh)(
        variables, shard_volume(jnp.asarray(vol.image), mesh)))
    np.testing.assert_array_equal(got, want)

    # VERDICT r2 #6: the same trained net on a 2-D (z, y) mesh — conv halo +
    # BN + 2-D packed reconciliation composing for RF > 0 across both axes.
    # z slabs 128/4 = 32 >= halo 16; y slabs 48/2 = 24 >= halo 16.
    mesh_zy = make_zy_mesh((4, 2))
    got_zy = np.asarray(make_sharded_infer_fn(model, tcfg, mesh_zy)(
        variables, shard_volume(jnp.asarray(vol.image), mesh_zy)))
    np.testing.assert_array_equal(got_zy, want)


def test_sharded_calibrated_threshold_equals_single(cfg, volume):
    """fg_target_fraction calibration: psum'd core histograms must reproduce
    the single-device threshold exactly."""
    import dataclasses

    ccfg = dataclasses.replace(
        cfg, postproc=dataclasses.replace(cfg.postproc, fg_target_fraction=0.03)
    )
    model = AnalyticNet()
    variables = {"params": {}}
    mesh = make_z_mesh()
    v = np.asarray(percentile_normalize(volume.image))

    want = np.asarray(make_infer_fn(model, ccfg, normalize=False)(
        variables, jnp.asarray(v)))
    got = np.asarray(make_sharded_infer_fn(model, ccfg, mesh, normalize=False)(
        variables, shard_volume(jnp.asarray(v), mesh)))
    np.testing.assert_array_equal(got, want)


def test_sharded_z_offset_beyond_int32(cfg, volume):
    """VERDICT r2 #1a: the packed-id scheme must label volumes whose global
    linear voxel indices exceed 2^31. Virtual offset injection: placing the
    same block at z_offset=3e6 (plane 32*32 -> max linear index ~3.2e9 >
    2^31) must yield the IDENTICAL labeling — ordering and merging are done
    on (z-plane, in-plane) int32 pairs, never on the linear product."""
    model = AnalyticNet()
    variables = {"params": {}}
    mesh = make_z_mesh()
    v = np.asarray(percentile_normalize(volume.image))

    sharded = make_sharded_infer_fn(model, cfg, mesh, normalize=False)
    base = np.asarray(sharded(variables, shard_volume(jnp.asarray(v), mesh)))
    far = np.asarray(sharded(variables, shard_volume(jnp.asarray(v), mesh),
                             z_offset=3_000_000))
    assert base.max() >= 6
    np.testing.assert_array_equal(base, far)


# VERDICT r2 #6: the 2-D (z, y) real-U-Net parity leg lives inside
# test_sharded_equals_single_device_real_unet below (reuses the trained
# state; an untrained net's noise basins would violate the halo-locality
# contract that makes elementwise parity well-defined).
