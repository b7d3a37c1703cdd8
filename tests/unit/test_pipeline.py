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
