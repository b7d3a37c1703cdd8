"""Parity of the Pallas fused-block eval forward (models/fused_eval.py)
against the flax ``model.apply`` it replaces.

Interpret-mode Pallas on the CPU test platform; the compiled TPU path is
exercised by the flagship bench. In float32 both paths share rounding
points, so parity is tight; bf16 uses the production tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core import ModelConfig
from tpuseg.models.fused_eval import fused_apply_supported, make_fused_apply
from tpuseg.models.unet3d import build_model, init_variables

SHAPE = (16, 24, 40)


def _model_and_vars(dtype, features=(32, 64), head_features=32):
    cfg = ModelConfig(features=features, head_features=head_features,
                      compute_dtype=dtype)
    model = build_model(cfg)
    variables = init_variables(model, jax.random.key(0), patch_shape=SHAPE)
    # non-trivial running stats + affines so BN folding is actually tested
    rng = np.random.default_rng(1)

    def perturb(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = rng.standard_normal(leaf.shape).astype(np.float32)
        if name in ("var",):
            return jnp.asarray(np.abs(arr) + 0.5)
        if name in ("scale",):
            return jnp.asarray(arr * 0.2 + 1.0)
        return jnp.asarray(arr * 0.2)

    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        perturb, variables["batch_stats"])
    return model, variables


@pytest.mark.parametrize("features", [(32, 64), (32, 64, 128)])
def test_fused_eval_matches_flax_f32(features):
    model, variables = _model_and_vars("float32", features=features)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, *SHAPE, 1)), jnp.float32)
    want = model.apply(variables, x)
    got = make_fused_apply(model, interpret=True)(variables, x)
    for k in ("fg_logits", "peak_logits"):
        assert got[k].shape == want[k].shape == (1, *SHAPE)
        assert got[k].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-3, atol=2e-3)


def test_fused_eval_matches_flax_bf16():
    model, variables = _model_and_vars("bfloat16")
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, *SHAPE, 1)), jnp.float32)
    want = model.apply(variables, x)
    got = make_fused_apply(model, interpret=True)(variables, x)
    for k in ("fg_logits", "peak_logits"):
        g, w = np.asarray(got[k]), np.asarray(want[k])
        close = np.abs(g - w) <= 0.08 * np.abs(w) + 0.08
        assert close.mean() > 0.995, (k, close.mean())


def test_fused_eval_batch_dim():
    model, variables = _model_and_vars("float32")
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, *SHAPE, 1)), jnp.float32)
    want = model.apply(variables, x)
    got = make_fused_apply(model, interpret=True)(variables, x)
    np.testing.assert_allclose(np.asarray(got["fg_logits"]),
                               np.asarray(want["fg_logits"]),
                               rtol=2e-3, atol=2e-3)


def test_fused_apply_supported_gating():
    assert fused_apply_supported(ModelConfig())
    assert not fused_apply_supported(ModelConfig(norm="group"))
    assert not fused_apply_supported(ModelConfig(features=(16, 32)))
    with pytest.raises(ValueError):
        make_fused_apply(build_model(ModelConfig(norm="group")))
