"""U-Net shape/dtype/jit tests (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import pytest

from tpuseg.core import ModelConfig
from tpuseg.models import build_model, init_variables


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(features=(8, 16, 32), num_groups=4, head_features=8,
                      compute_dtype="float32")
    model = build_model(cfg)
    variables = init_variables(model, jax.random.key(0), patch_shape=(16, 16, 16))
    return model, variables


def test_output_shapes_and_dtypes(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 16, 16, 16, 1))
    out = model.apply(variables, x)
    assert out["fg_logits"].shape == (2, 16, 16, 16)
    assert out["peak_logits"].shape == (2, 16, 16, 16)
    assert out["fg_logits"].dtype == jnp.float32
    assert out["peak_logits"].dtype == jnp.float32


def test_batch_stats_collection_exists(small_model):
    _, variables = small_model
    assert "batch_stats" in variables
    stats = jax.tree.leaves(variables["batch_stats"])
    assert stats and all(s.dtype == jnp.float32 for s in stats)


def test_channelless_input_ok(small_model):
    model, variables = small_model
    out = model.apply(variables, jnp.zeros((1, 16, 16, 16)))
    assert out["fg_logits"].shape == (1, 16, 16, 16)


def test_params_are_fp32(small_model):
    _, variables = small_model
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32


def test_jit_compiles_and_is_deterministic(small_model):
    model, variables = small_model
    f = jax.jit(lambda v, x: model.apply(v, x))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 1))
    a = f(variables, x)
    b = f(variables, x)
    assert jnp.array_equal(a["fg_logits"], b["fg_logits"])
    assert not jnp.isnan(a["fg_logits"]).any()


def test_train_batchnorm_matches_flax():
    """TrainBatchNorm (r5: f32 stats reduced from bf16, folded bf16 apply)
    == nn.BatchNorm(use_running_average=False) — outputs at bf16 rounding
    tolerance, updated running stats tight, gradients close."""
    import numpy as np
    from flax import linen as nn

    from tpuseg.models.blocks import TrainBatchNorm

    x = (jax.random.normal(jax.random.key(0), (4, 8, 8, 8, 16))
         * 3.0 + 1.5).astype(jnp.bfloat16)
    fast = TrainBatchNorm(dtype=jnp.bfloat16)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32)
    vf = fast.init(jax.random.key(1), x)
    vr = ref.init(jax.random.key(1), x.astype(jnp.float32))
    # non-trivial affine so the fold is exercised
    sc = jax.random.uniform(jax.random.key(2), (16,), minval=0.5, maxval=2.0)
    bi = jax.random.normal(jax.random.key(3), (16,)) * 0.3
    vf = {"params": {"scale": sc, "bias": bi}, "batch_stats": vf["batch_stats"]}
    vr = {"params": {"scale": sc, "bias": bi}, "batch_stats": vr["batch_stats"]}

    yf, mf = fast.apply(vf, x, mutable=["batch_stats"])
    yr, mr = ref.apply(vr, x.astype(jnp.float32), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf, np.float32),
                               np.asarray(yr.astype(jnp.bfloat16), np.float32),
                               rtol=0.02, atol=0.05)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mf["batch_stats"][k]),
                                   np.asarray(mr["batch_stats"][k]),
                                   rtol=1e-5, atol=1e-6)

    def loss_fast(p):
        y, _ = fast.apply({"params": p, "batch_stats": vf["batch_stats"]},
                          x, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(p):
        y, _ = ref.apply({"params": p, "batch_stats": vr["batch_stats"]},
                         x.astype(jnp.float32), mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.bfloat16).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fast)(vf["params"])
    gr = jax.grad(loss_ref)(vr["params"])
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(gf[k]), np.asarray(gr[k]),
                                   rtol=0.05, atol=0.5)


def test_train_mode_updates_batch_stats(small_model):
    model, variables = small_model
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 16, 1))
    _, new_vars = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(new_vars["batch_stats"])
    assert any(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(before, after)
    )


def test_eval_mode_is_batch_size_invariant(small_model):
    """Eval-mode BN must make outputs independent of what else is in the
    batch — the property tiled inference relies on."""
    model, variables = small_model
    x1 = jax.random.normal(jax.random.key(3), (1, 16, 16, 16, 1))
    x2 = jnp.concatenate([x1, 5.0 + jax.random.normal(jax.random.key(4), x1.shape)])
    a = model.apply(variables, x1)["fg_logits"][0]
    b = model.apply(variables, x2)["fg_logits"][0]
    assert jnp.allclose(a, b, atol=1e-6)


def test_group_norm_variant_runs():
    cfg = ModelConfig(features=(8, 16), norm="group", num_groups=4,
                      head_features=8, compute_dtype="float32")
    model = build_model(cfg)
    variables = init_variables(model, jax.random.key(0), patch_shape=(8, 8, 8))
    assert "batch_stats" not in variables
    out = model.apply(variables, jnp.ones((1, 8, 8, 8, 1)))
    assert out["fg_logits"].shape == (1, 8, 8, 8)


def test_bf16_compute_dtype_runs():
    cfg = ModelConfig(features=(8, 16), num_groups=4, head_features=8,
                      compute_dtype="bfloat16")
    model = build_model(cfg)
    variables = init_variables(model, jax.random.key(0), patch_shape=(8, 8, 8))
    out = model.apply(variables, jnp.ones((1, 8, 8, 8, 1)))
    assert out["fg_logits"].dtype == jnp.float32  # heads cast back to fp32
