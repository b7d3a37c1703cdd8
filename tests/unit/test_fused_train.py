"""Fused train-mode apply (models/fused_train.py) == flax
model.apply(train=True) — outputs, updated batch statistics, and
parameter gradients (interpret mode; the real-chip check rides the
train-step drive and bench c4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core import Config, DataConfig, ModelConfig
from tpuseg.models import build_model, init_variables
from tpuseg.models.fused_train import (fused_train_supported,
                                       make_fused_train_apply)


@pytest.fixture(scope="module")
def setup():
    # flagship family at test scale: features[0]=32, head 32, W=64 (2-pack)
    cfg = ModelConfig(features=(32, 64), head_features=32,
                      compute_dtype="float32")
    model = build_model(cfg)
    patch = (8, 16, 64)
    variables = init_variables(model, jax.random.key(0), patch_shape=patch)
    x = jax.random.normal(jax.random.key(1), (2, *patch, 1), jnp.float32)
    return model, variables, x


def test_supported_predicate():
    cfg = ModelConfig()
    assert fused_train_supported(cfg, 8, (64, 64, 64))
    assert not fused_train_supported(cfg, 7, (64, 64, 64))
    assert not fused_train_supported(cfg, 8, (64, 64, 96))
    assert not fused_train_supported(
        dataclasses.replace(cfg, norm="group"), 8, (64, 64, 64))


def test_outputs_and_stats_match_flax(setup):
    model, variables, x = setup
    want, mut = model.apply(variables, x, train=True,
                            mutable=["batch_stats"])
    apply_fn = make_fused_train_apply(model, interpret=True)
    got, new_stats = apply_fn(variables, x)

    for k in ("fg_logits", "peak_logits"):
        a, b = np.asarray(got[k]), np.asarray(want[k])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)

    assert (jax.tree.structure(new_stats)
            == jax.tree.structure(mut["batch_stats"]))
    for pa, pb in zip(jax.tree.leaves(new_stats),
                      jax.tree.leaves(mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-5)


def test_gradients_match_flax(setup):
    model, variables, x = setup
    apply_fn = make_fused_train_apply(model, interpret=True)

    def loss_flax(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return (jnp.mean(out["fg_logits"] ** 2)
                + jnp.mean(jnp.abs(out["peak_logits"])))

    def loss_fused(params):
        out, _ = apply_fn(
            {"params": params, "batch_stats": variables["batch_stats"]}, x)
        return (jnp.mean(out["fg_logits"] ** 2)
                + jnp.mean(jnp.abs(out["peak_logits"])))

    gf = jax.grad(loss_flax)(variables["params"])
    gp = jax.grad(loss_fused)(variables["params"])
    assert jax.tree.structure(gf) == jax.tree.structure(gp)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_p = jax.tree.leaves(gp)
    for (path, a), b in zip(flat_f, flat_p):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.maximum(np.abs(a).max(), 1e-8)
        rel = np.abs(a - b).max() / denom
        assert rel < 5e-2, (jax.tree_util.keystr(path), rel)


def test_rejects_unsupported_shapes(setup):
    model, variables, _ = setup
    apply_fn = make_fused_train_apply(model, interpret=True)
    with pytest.raises(ValueError, match="fused train"):
        apply_fn(variables, jnp.zeros((3, 8, 16, 64, 1)))
