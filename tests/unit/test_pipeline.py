"""Fused inference pipeline mechanics (shapes/dtypes/jit) — quality is
covered by tests/e2e/."""

import jax
import numpy as np

from tpuseg.core import Config, DataConfig, InferConfig, ModelConfig, PostprocConfig
from tpuseg.infer import make_infer_fn
from tpuseg.models import build_model, init_variables


def test_infer_fn_runs_and_labels_are_compact():
    cfg = Config(
        model=ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                          compute_dtype="float32"),
        infer=InferConfig(tile=(16, 16, 16), halo=8, compute_dtype="float32"),
        postproc=PostprocConfig(min_size=4, flood_iters=16),
    )
    model = build_model(cfg.model)
    variables = init_variables(model, jax.random.key(0), patch_shape=(16, 16, 16))
    infer = make_infer_fn(model, cfg)
    vol = jax.random.uniform(jax.random.key(1), (24, 24, 24))
    labels = np.asarray(infer(variables, vol))
    assert labels.shape == (24, 24, 24)
    assert labels.dtype == np.int32
    ids = np.unique(labels)
    assert ids[0] == 0 or (ids > 0).all()
    pos = ids[ids > 0]
    if len(pos):  # compact 1..K
        assert pos.min() == 1 and pos.max() == len(pos)


def test_batched_infer_matches_individual():
    """make_batched_infer_fn == stacking make_infer_fn results, each volume
    normalized/calibrated independently (NORTH-STAR config 3 batching)."""
    import numpy as np
    import jax.numpy as jnp

    from tpuseg.core import Config, InferConfig, ModelConfig, PostprocConfig
    from tpuseg.data import synthesize_volume
    from tpuseg.infer import make_batched_infer_fn, make_infer_fn
    from tpuseg.models import build_model, init_variables

    cfg = Config(
        model=ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                          compute_dtype="float32"),
        infer=InferConfig(tile=(16, 16, 16), halo=8, compute_dtype="float32"),
        postproc=PostprocConfig(min_size=5, flood_iters=12),
    )
    model = build_model(cfg.model)
    variables = init_variables(model, __import__("jax").random.key(0),
                               patch_shape=(16, 16, 16))
    vols = np.stack([
        synthesize_volume(shape=(24, 32, 32), num_instances=4,
                          seed=s).image * (1.0 + s)   # distinct scales
        for s in range(3)
    ])
    single = make_infer_fn(model, cfg)
    want = np.stack([np.asarray(single(variables, jnp.asarray(v)))
                     for v in vols])
    got = np.asarray(make_batched_infer_fn(model, cfg)(
        variables, jnp.asarray(vols)))
    np.testing.assert_array_equal(got, want)


def test_staged_program_matches_fused():
    """InferConfig.program="staged" (two chained XLA programs, device-resident
    bf16-logits handoff) must be elementwise-identical to the one-program
    "fused" pipeline — single-volume AND batched. The stage boundary sits at
    exactly the same materialization point (the sweep's logit accumulators),
    so no value changes, only buffer lifetimes (the flagship whole-volume
    single-tile config only fits HBM staged)."""
    import dataclasses

    import jax.numpy as jnp

    from tpuseg.data import synthesize_volume
    from tpuseg.infer import make_batched_infer_fn

    cfg = Config(
        model=ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                          compute_dtype="float32"),
        infer=InferConfig(tile=(16, 16, 16), halo=8, compute_dtype="float32"),
        postproc=PostprocConfig(min_size=5, flood_iters=12),
    )
    cfg_staged = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, program="staged"))
    model = build_model(cfg.model)
    variables = init_variables(model, jax.random.key(0),
                               patch_shape=(16, 16, 16))
    vols = np.stack([
        synthesize_volume(shape=(24, 32, 32), num_instances=4,
                          seed=s).image * (1.0 + s)
        for s in range(2)
    ])
    want = np.asarray(make_infer_fn(model, cfg)(variables, jnp.asarray(vols[0])))
    got = np.asarray(
        make_infer_fn(model, cfg_staged)(variables, jnp.asarray(vols[0])))
    np.testing.assert_array_equal(got, want)

    want_b = np.asarray(make_batched_infer_fn(model, cfg)(
        variables, jnp.asarray(vols)))
    got_b = np.asarray(make_batched_infer_fn(model, cfg_staged)(
        variables, jnp.asarray(vols)))
    np.testing.assert_array_equal(got_b, want_b)

    import pytest

    bad = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, program="nope"))
    with pytest.raises(ValueError, match="program"):
        make_infer_fn(model, bad)


def test_bound_variables_matches_unbound():
    """make_infer_fn(bind_variables=...) bakes the weights in as jit
    constants (works around the runtime-weights XLA crash on the flagship
    auto/single-tile program; see pipeline.py) — results must equal the
    unbound call in BOTH program modes."""
    import dataclasses

    import jax.numpy as jnp

    from tpuseg.data import synthesize_volume

    cfg = Config(
        model=ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                          compute_dtype="float32", conv_impl="auto"),
        infer=InferConfig(tile=(16, 16, 16), halo=8, compute_dtype="float32"),
        postproc=PostprocConfig(min_size=5, flood_iters=12),
    )
    model = build_model(cfg.model)
    variables = init_variables(model, jax.random.key(0),
                               patch_shape=(16, 16, 16))
    v = jnp.asarray(
        synthesize_volume(shape=(24, 32, 32), num_instances=4, seed=1).image)
    for program in ("fused", "staged"):
        c = dataclasses.replace(
            cfg, infer=dataclasses.replace(cfg.infer, program=program))
        want = np.asarray(make_infer_fn(model, c)(variables, v))
        got = np.asarray(make_infer_fn(model, c, bind_variables=variables)(v))
        np.testing.assert_array_equal(got, want)


def test_rf_warning_gates_on_supplied_model():
    """ADVICE r2: the halo<RF warning derives the receptive field from the
    model actually passed, so RF-free stand-ins don't trip it."""
    import warnings

    from flax import linen as nn

    class PointwiseNet(nn.Module):  # no .config -> no RF claim
        @nn.compact
        def __call__(self, x, train: bool = False):
            v = x[..., 0].astype("float32")
            return {"fg_logits": v, "peak_logits": v}

    cfg = Config(infer=InferConfig(tile=(16, 16, 16), halo=2,
                                   compute_dtype="float32"))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        make_infer_fn(PointwiseNet(), cfg)
    assert not [w for w in rec if "receptive-field" in str(w.message)]

    # the real U-Net (4 levels, RF~53) with halo=2 must still warn
    mcfg = ModelConfig(features=(4, 8, 16, 32), num_groups=2, head_features=4,
                       compute_dtype="float32")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        make_infer_fn(build_model(mcfg), cfg.override(**{}))
    assert [w for w in rec if "receptive-field" in str(w.message)]


def test_forced_pallas_on_unsupported_shape_raises():
    """ADVICE r2: resolve_impl='pallas' on a non-block-divisible shape must
    refuse loudly instead of leaving remainder blocks unwritten."""
    import jax.numpy as jnp
    import pytest

    from tpuseg.ops import watershed

    fg = jnp.zeros((7, 13, 64), jnp.float32)
    with pytest.raises(ValueError, match="pallas"):
        watershed(fg, fg, resolve_impl="pallas")


def test_sort_filter_impl_matches_scatter():
    """r3: the two-sort size-filter schedule must be bitwise-identical to the
    histogram schedule on both dense and sparse label spaces."""
    import numpy as np

    from tpuseg.ops.filter import (
        size_filter_and_compact, size_filter_and_compact_dense)

    rng = np.random.default_rng(0)
    dense = rng.integers(0, 40, (13, 17, 19)).astype(np.int32)
    a = np.asarray(size_filter_and_compact_dense(dense, 8, 64, impl="scatter"))
    b = np.asarray(size_filter_and_compact_dense(dense, 8, 64, impl="sort"))
    np.testing.assert_array_equal(a, b)

    n = 13 * 17 * 19
    sparse = np.where(rng.random((13, 17, 19)) < 0.6,
                      rng.integers(1, n + 1, (13, 17, 19)), 0).astype(np.int32)
    # give a few ids real mass so some survive
    sparse[:6, :6, :6] = 7
    sparse[7:, 10:, 10:] = 4142  # within the scatter impl N bound
    a = np.asarray(size_filter_and_compact(sparse, 5, impl="scatter"))
    b = np.asarray(size_filter_and_compact(sparse, 5, impl="sort"))
    np.testing.assert_array_equal(a, b)


def test_adaptive_upper_pct():
    """r3 (VERDICT r2 #4): density-aware normalization percentile — dense
    volumes keep the reference default, sparse ones clip at most
    fg_fraction/headroom, hot-pixel cap engages at extreme sparsity."""
    import pytest

    from tpuseg.ops.calibrate import adaptive_upper_pct

    assert adaptive_upper_pct(0.5) == 99.8
    assert adaptive_upper_pct(0.025) == 99.8           # boundary: fg/10 = 0.25%
    assert adaptive_upper_pct(0.0024) == pytest.approx(99.976)
    assert adaptive_upper_pct(1e-9) == 99.995


def test_nms_radius_from_half_sizes():
    """Per-axis NMS footprint from weak-annotation shape statistics: isotropic
    annotations reproduce the isotropic default; z-compressed instances get a
    proportionally smaller z window (never below 1, never above base)."""
    from tpuseg.ops.calibrate import nms_radius_from_half_sizes

    iso = np.full((40, 3), 6.0)
    assert nms_radius_from_half_sizes(iso) == (2, 2, 2)

    aniso = np.tile([6.0 * 0.35, 6.0, 6.0], (40, 1))
    assert nms_radius_from_half_sizes(aniso) == (1, 2, 2)

    # extreme compression clamps at 1, not 0
    flat = np.tile([0.3, 6.0, 6.0], (40, 1))
    assert nms_radius_from_half_sizes(flat) == (1, 2, 2)

    # valid mask drops padded rows before the median
    padded = np.concatenate([aniso, np.zeros((40, 3))])
    valid = np.concatenate([np.ones(40, bool), np.zeros(40, bool)])
    assert nms_radius_from_half_sizes(padded, valid=valid) == (1, 2, 2)
