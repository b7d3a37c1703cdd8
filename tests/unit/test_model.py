"""U-Net shape/dtype/jit tests (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import pytest

from tpuseg.core import ModelConfig
from tpuseg.models import build_model, init_params


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(features=(8, 16, 32), num_groups=4, head_features=8,
                      compute_dtype="float32")
    model = build_model(cfg)
    params = init_params(model, jax.random.key(0), patch_shape=(16, 16, 16))
    return model, params


def test_output_shapes_and_dtypes(small_model):
    model, params = small_model
    x = jnp.zeros((2, 16, 16, 16, 1))
    out = model.apply({"params": params}, x)
    assert out["fg_logits"].shape == (2, 16, 16, 16)
    assert out["peak_logits"].shape == (2, 16, 16, 16)
    assert out["fg_logits"].dtype == jnp.float32
    assert out["peak_logits"].dtype == jnp.float32


def test_channelless_input_ok(small_model):
    model, params = small_model
    out = model.apply({"params": params}, jnp.zeros((1, 16, 16, 16)))
    assert out["fg_logits"].shape == (1, 16, 16, 16)


def test_params_are_fp32(small_model):
    _, params = small_model
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32


def test_jit_compiles_and_is_deterministic(small_model):
    model, params = small_model
    f = jax.jit(lambda p, x: model.apply({"params": p}, x))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 1))
    a = f(params, x)
    b = f(params, x)
    assert jnp.array_equal(a["fg_logits"], b["fg_logits"])
    assert not jnp.isnan(a["fg_logits"]).any()


def test_bf16_compute_dtype_runs():
    cfg = ModelConfig(features=(8, 16), num_groups=4, head_features=8,
                      compute_dtype="bfloat16")
    model = build_model(cfg)
    params = init_params(model, jax.random.key(0), patch_shape=(8, 8, 8))
    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 8, 1)))
    assert out["fg_logits"].dtype == jnp.float32  # heads cast back to fp32
