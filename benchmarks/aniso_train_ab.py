"""A/B: anisotropy-robust training vs the r3 baseline recipe.

The bench `c5` aniso stress leg (touch65_aniso035) scores a checkpoint
trained ONLY at the synthesizer's default 0.6x z-anisotropy on a fixture
compressed to 0.35x — a deliberate acquisition-domain shift (SURVEY.md C4:
the reference's flip/rotation augmentations cannot model it). This script
trains two 200-step checkpoints that differ only in the new
anisotropy-robustness options and scores both on the exact bench fixtures:

  baseline: DataConfig defaults (the r3 bench recipe).
  aniso:    aug_zscale=(0.5, 1.0)  — each patch squashed along z by
            s~U(.5,1) with annotations transformed (data.augment
            .zscale_patch), covering effective 0.3-0.6x anisotropy;
            peak_sigma_aniso=True — per-instance gaussian aspect from the
            box half-sizes, so z-flat instances get z-flat peak targets.

Prints one JSON object with the per-fixture instance metrics of both.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOLUME_SHAPE = (96, 512, 512)


def train_variant(data_overrides: dict):
    import jax

    from tpuseg.core import Config, ModelConfig
    from tpuseg.data import synthesize_volume
    from tpuseg.train import train

    cfg = Config(model=ModelConfig(conv_impl="native"))
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, **data_overrides),
        train=dataclasses.replace(cfg.train, total_steps=200, warmup_steps=20,
                                  lr=1e-3, log_every=40, ckpt_every=100_000),
    )
    vols = [synthesize_volume(shape=(64, 192, 192), num_instances=60, seed=s)
            for s in (42, 43)]
    t0 = time.perf_counter()
    state, history = train(cfg, vols)
    return (
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        {"train_s": round(time.perf_counter() - t0, 1),
         "final_loss": round(history[-1]["loss"], 4)},
    )


def score(variables, fixtures):
    import jax.numpy as jnp
    import numpy as np

    from bench import make_cfg
    from tpuseg.eval import instance_metrics
    from tpuseg.models import build_model
    from tpuseg.infer import make_infer_fn
    from tpuseg.ops.calibrate import (expected_fg_fraction,
                                      nms_radius_from_half_sizes)

    cfg = make_cfg()
    model = build_model(cfg.model)
    out = {}
    for name, tv in fixtures.items():
        frac = expected_fg_fraction(tv.half_sizes, tv.image.size)
        nms_r = nms_radius_from_half_sizes(tv.half_sizes)
        c = dataclasses.replace(cfg, postproc=dataclasses.replace(
            cfg.postproc, fg_target_fraction=frac, nms_radius=nms_r))
        fn = make_infer_fn(model, c, bind_variables=variables)
        lab = np.asarray(fn(jnp.asarray(tv.image)))
        mi = instance_metrics(lab, tv.labels, iou_threshold=0.5)
        mc = instance_metrics(lab, tv.labels, criterion="center")
        out[name] = {
            "n_gt": int(tv.labels.max()), "n_pred": mi["n_pred"],
            "f1_iou50": round(mi["f1"], 4),
            "f1_center": round(mc["f1"], 4),
            "mean_iou": round(mi["mean_matched_iou"], 4),
        }
    return out


def main():
    from tpuseg.data import synthesize_touching_volume
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    fixtures = {
        "touch65_aniso035": synthesize_touching_volume(
            shape=VOLUME_SHAPE, num_pairs=150, num_singles=100,
            radius_range=(5.0, 8.0), seed=17, touch_factor=0.65, noise=0.05,
            anisotropy=(0.35, 1.0, 1.0)),
        "touch60_snr20": synthesize_touching_volume(
            shape=VOLUME_SHAPE, num_pairs=150, num_singles=100,
            radius_range=(5.0, 8.0), seed=17, touch_factor=0.6, noise=0.05),
    }
    res = {}
    for tag, overrides in (
            ("baseline", {}),
            ("aniso", {"aug_zscale": (0.5, 1.0), "peak_sigma_aniso": True}),
    ):
        variables, info = train_variant(overrides)
        res[tag] = {"train": info, "fixtures": score(variables, fixtures)}
        print(f"[{tag}] {json.dumps(res[tag])}", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
