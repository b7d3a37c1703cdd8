"""Tiled halo-overlap inference correctness (SURVEY.md §4.1; NORTH-STAR
voxel fidelity).

Contract (see tpuseg/infer/tiles.py): with halo >= the net's receptive-field
radius, ``tiled_forward(vol)`` equals ``crop(net(edge_pad(vol, halo)))`` at
EVERY voxel, and equals the plain whole-volume forward on the interior
(>= RF from the volume border, where boundary conventions can't differ).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core import ModelConfig
from tpuseg.infer import tiled_forward
from tpuseg.infer.tiles import tile_grid
from tpuseg.models import build_model, init_variables

HALO = 12  # measured RF radius of the (4,8) test model is 11 (see measure_rf_radius)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                      compute_dtype="float32")
    model = build_model(cfg)
    variables = init_variables(model, jax.random.key(0), patch_shape=(16, 16, 16))
    # randomize BN stats so eval-mode normalization is non-trivial
    variables["batch_stats"] = jax.tree.map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.key(1), a.shape),
        variables["batch_stats"],
    )
    return model, variables


def _apply(model):
    def apply_fn(variables, x):
        return model.apply(variables, x)
    return apply_fn


def _direct_edge_padded(model, variables, vol, halo=HALO):
    """crop(net(edge_pad(vol))) — the reference computation for the contract."""
    padded = jnp.pad(vol, halo, mode="edge")
    out = model.apply(variables, padded[None, ..., None])
    sl = slice(halo, -halo)
    return {k: v[0, sl, sl, sl] for k, v in out.items()}


def test_tile_grid_covers_volume():
    g = tile_grid((32, 32, 48), (16, 16, 16))
    assert g.shape == (2 * 2 * 3, 3)
    assert (g.min(axis=0) == 0).all()
    assert tuple(g.max(axis=0)) == (16, 16, 32)


def test_tiled_exactly_equals_edge_padded_direct(model_and_vars):
    model, variables = model_and_vars
    vol = jax.random.normal(jax.random.key(2), (32, 32, 32))
    direct = _direct_edge_padded(model, variables, vol)
    tiled = tiled_forward(_apply(model), variables, vol,
                          tile=(16, 16, 16), halo=HALO)
    for k in ("fg_logits", "peak_logits"):
        np.testing.assert_allclose(
            np.asarray(tiled[k]), np.asarray(direct[k]), rtol=1e-4, atol=1e-5
        )


def test_tiled_matches_plain_forward_on_interior(model_and_vars):
    model, variables = model_and_vars
    vol = jax.random.normal(jax.random.key(6), (32, 32, 32))
    direct = model.apply(variables, vol[None, ..., None])
    tiled = tiled_forward(_apply(model), variables, vol,
                          tile=(16, 16, 16), halo=HALO)
    h = HALO
    np.testing.assert_allclose(
        np.asarray(tiled["fg_logits"][h:-h, h:-h, h:-h]),
        np.asarray(direct["fg_logits"][0, h:-h, h:-h, h:-h]),
        rtol=1e-4, atol=1e-5,
    )


def test_tiled_non_divisible_volume(model_and_vars):
    model, variables = model_and_vars
    vol = jax.random.normal(jax.random.key(3), (24, 28, 36))
    direct = _direct_edge_padded(model, variables, vol)
    tiled = tiled_forward(_apply(model), variables, vol,
                          tile=(16, 16, 16), halo=HALO)
    assert tiled["fg_logits"].shape == (24, 28, 36)
    np.testing.assert_allclose(
        np.asarray(tiled["fg_logits"]), np.asarray(direct["fg_logits"]),
        rtol=1e-4, atol=1e-5,
    )


def test_tile_batch_equivalence(model_and_vars):
    model, variables = model_and_vars
    vol = jax.random.normal(jax.random.key(4), (16, 32, 32))
    a = tiled_forward(_apply(model), variables, vol, tile=(16, 16, 16),
                      halo=HALO, tile_batch=1)
    b = tiled_forward(_apply(model), variables, vol, tile=(16, 16, 16),
                      halo=HALO, tile_batch=3)  # 4 tiles -> padded to 6
    np.testing.assert_allclose(np.asarray(a["fg_logits"]),
                               np.asarray(b["fg_logits"]), rtol=1e-5, atol=1e-6)


def test_insufficient_halo_breaks_equality(model_and_vars):
    """Sanity: halo=0 must NOT satisfy the contract (the tests above are
    meaningful only if the halo matters)."""
    model, variables = model_and_vars
    vol = jax.random.normal(jax.random.key(5), (32, 32, 32))
    direct = model.apply(variables, vol[None, ..., None])
    tiled = tiled_forward(_apply(model), variables, vol, tile=(16, 16, 16), halo=0)
    assert not np.allclose(
        np.asarray(tiled["fg_logits"]), np.asarray(direct["fg_logits"][0]),
        rtol=1e-4, atol=1e-5,
    )


def test_per_axis_halo_exactness(model_and_vars):
    """Per-axis halo contract: a single-tile axis needs NO margin — halo
    (0, HALO, HALO) with tile z spanning the volume equals the per-axis
    edge-padded direct forward at every voxel."""
    model, variables = model_and_vars
    vol = jax.random.normal(jax.random.key(7), (16, 32, 32))
    halos = (0, HALO, HALO)
    padded = jnp.pad(vol, [(h, h) for h in halos], mode="edge")
    out = model.apply(variables, padded[None, ..., None])
    direct = {k: v[0, :, HALO:-HALO, HALO:-HALO] for k, v in out.items()}
    tiled = tiled_forward(_apply(model), variables, vol,
                          tile=(16, 16, 16), halo=halos)
    for k in ("fg_logits", "peak_logits"):
        np.testing.assert_allclose(
            np.asarray(tiled[k]), np.asarray(direct[k]), rtol=1e-4, atol=1e-5
        )


def test_per_axis_halo_warning_only_on_split_axes():
    """The pipeline's per-axis RF warning fires only for tiled axes whose
    halo is below RF — the (0, big, big) exact config stays silent when z is
    covered by one tile."""
    import warnings

    from tpuseg.core import Config, InferConfig, ModelConfig
    from tpuseg.infer import make_infer_fn

    mcfg = ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                       compute_dtype="float32")
    model = build_model(mcfg)
    variables = init_variables(model, jax.random.key(0),
                               patch_shape=(16, 16, 16))
    vol = jax.random.normal(jax.random.key(8), (16, 32, 32))

    def warns_for(halo):
        cfg = Config(infer=InferConfig(tile=(16, 16, 16), halo=halo,
                                       compute_dtype="float32"))
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            make_infer_fn(model, cfg)(variables, vol)
        return bool([w for w in rec if "receptive-field" in str(w.message)])

    assert not warns_for((0, 12, 12))   # z single-tile, y/x >= RF(11): exact
    assert warns_for((0, 4, 12))        # y is split with halo < RF
    assert not warns_for((4, 12, 12))   # z halo small but z is single-tile
