"""Numerical sanitizers (SURVEY.md §5 "race detection / sanitizers" row):
the train step must run clean under jax_debug_nans (the TPU-land analog of
running under a sanitizer — any NaN anywhere in the step raises immediately),
plus chex shape/dtype asserts on the public op contracts."""

import chex
import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import Config, DataConfig, ModelConfig, TrainConfig
from tpuseg.data import PatchSampler, synthesize_volume
from tpuseg.models import build_model
from tpuseg.train import create_train_state, make_train_step


def test_train_step_clean_under_debug_nans():
    cfg = Config(
        model=ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                          compute_dtype="float32"),
        data=DataConfig(patch_size=(16, 16, 16), batch_size=2, max_instances=8),
        train=TrainConfig(total_steps=2, warmup_steps=1, lr=1e-3),
    )
    vol = synthesize_volume(shape=(32, 32, 32), num_instances=4, seed=0)
    model = build_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    sampler = PatchSampler([vol], patch_size=cfg.data.patch_size, batch_size=2,
                           max_instances=8, seed=0)
    step = jax.jit(make_train_step(model, cfg))
    batch = {k: jnp.asarray(v) for k, v in sampler.next_batch().items()}
    jax.config.update("jax_debug_nans", True)
    try:
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_op_contracts_with_chex():
    from tpuseg.ops import connected_components, peak_nms, watershed

    vol = jnp.zeros((8, 8, 8))
    seeds = peak_nms(vol + 0.6, threshold=0.5, radius=1)
    chex.assert_type(seeds, jnp.bool_)
    chex.assert_shape(seeds, (8, 8, 8))

    lab = watershed(vol, vol)
    chex.assert_type(lab, jnp.int32)
    chex.assert_shape(lab, (8, 8, 8))

    cc = connected_components(vol > 1.0)
    chex.assert_type(cc, jnp.int32)
    assert int(cc.max()) == 0
