"""End-to-end smoke (SURVEY.md §4.4): synthetic nuclei -> weak-supervised
training -> fused tiled inference -> instance F1 vs the synthetic GT.

Runs on the CPU test platform with a small model; the real-TPU equivalent is
driven by bench.py / the verify recipe.
"""

import jax
import numpy as np
import pytest

from tpuseg.core import (
    Config, DataConfig, InferConfig, ModelConfig, PostprocConfig, TrainConfig,
)
from tpuseg.data import synthesize_volume
from tpuseg.eval import instance_metrics
from tpuseg.infer import make_infer_fn
from tpuseg.models import build_model
from tpuseg.train import train


@pytest.mark.slow
def test_train_infer_f1(tmp_path):
    cfg = Config(
        model=ModelConfig(features=(8, 16), num_groups=4, head_features=8,
                          compute_dtype="float32"),
        data=DataConfig(patch_size=(24, 24, 24), batch_size=2, max_instances=16,
                        peak_sigma=2.5),
        train=TrainConfig(total_steps=200, warmup_steps=10, lr=3e-3,
                          log_every=50, ckpt_every=200,
                          ckpt_dir=str(tmp_path / "ckpt")),
        infer=InferConfig(tile=(16, 32, 32), halo=12, compute_dtype="float32"),
        postproc=PostprocConfig(peak_threshold=0.35, fg_threshold=0.5,
                                nms_radius=2, min_size=20, flood_iters=32),
    )
    vol = synthesize_volume(shape=(48, 64, 64), num_instances=10,
                            radius_range=(4.0, 7.0), seed=11)
    state, history = train(cfg, [vol])
    assert history[-1]["loss"] < history[0]["loss"]

    model = build_model(cfg.model)
    infer = make_infer_fn(model, cfg)
    labels = np.asarray(
        infer({"params": state.params, "batch_stats": state.batch_stats},
              jax.numpy.asarray(vol.image))
    )
    m = instance_metrics(labels, vol.labels, iou_threshold=0.3)
    # smoke bar: the pipeline must actually find most synthetic nuclei
    # (the recipe reaches F1 = 1.0; thresholds leave margin for platform noise)
    assert m["recall"] >= 0.7, m
    assert m["precision"] >= 0.6, m
