"""Training step + loop + checkpoint/resume (SURVEY.md C8/C9, §4.1, §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core import Config, DataConfig, ModelConfig, TrainConfig
from tpuseg.data import PatchSampler, synthesize_volume
from tpuseg.models import build_model
from tpuseg.train import create_train_state, make_train_step, train


def tiny_config(tmp_dir="/tmp/tpuseg_test_ckpt", steps=6):
    return Config(
        model=ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                          compute_dtype="float32"),
        data=DataConfig(patch_size=(16, 16, 16), batch_size=2, max_instances=8),
        train=TrainConfig(total_steps=steps, warmup_steps=2, log_every=2,
                          ckpt_every=3, ckpt_dir=tmp_dir, lr=1e-3),
    )


@pytest.fixture(scope="module")
def vol():
    return synthesize_volume(shape=(32, 32, 32), num_instances=4, seed=0)


def test_single_step_updates_params_and_is_finite(vol):
    cfg = tiny_config()
    model = build_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    sampler = PatchSampler([vol], patch_size=cfg.data.patch_size,
                           batch_size=2, max_instances=8, seed=0)
    step = jax.jit(make_train_step(model, cfg))
    batch = {k: jnp.asarray(v) for k, v in sampler.next_batch().items()}
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_loss_decreases_over_short_run(vol, tmp_path):
    cfg = tiny_config(str(tmp_path / "ck"), steps=30)
    _, history = train(cfg, [vol], log_path=str(tmp_path / "m.jsonl"))
    losses = [h["loss"] for h in history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_resume_from_checkpoint_matches_uninterrupted(vol, tmp_path):
    # run A: 6 steps straight through
    cfg_a = tiny_config(str(tmp_path / "a"), steps=6)
    state_a, _ = train(cfg_a, [vol])
    # run B: 3 steps (ckpt_every=3 saves at 3), then resume to 6
    cfg_b1 = tiny_config(str(tmp_path / "b"), steps=3)
    train(cfg_b1, [vol])
    cfg_b2 = tiny_config(str(tmp_path / "b"), steps=6)
    state_b, _ = train(cfg_b2, [vol], resume=True)

    for pa, pb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5, atol=1e-6)


def test_metrics_jsonl_written(vol, tmp_path):
    import json

    cfg = tiny_config(str(tmp_path / "ck"), steps=4)
    train(cfg, [vol], log_path=str(tmp_path / "metrics.jsonl"))
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) >= 2
    assert {"step", "loss", "peak_loss", "fg_loss", "grad_norm", "mvox_per_s"} <= set(lines[0])


def test_prefetch_matches_synchronous_training(tmp_path):
    """Background prefetch (train.prefetch_depth>0) must not change training:
    batches are pure fns of (seed, consumed-step), so prefetched and
    synchronous runs produce identical parameters."""
    import dataclasses

    import jax
    import numpy as np

    from tpuseg.core import Config, DataConfig, ModelConfig, TrainConfig
    from tpuseg.data import synthesize_volume
    from tpuseg.train import train

    vol = synthesize_volume(shape=(32, 32, 32), num_instances=5, seed=2)

    def run(depth, sub):
        cfg = Config(
            model=ModelConfig(features=(4, 8), num_groups=2, head_features=4,
                              compute_dtype="float32"),
            data=DataConfig(patch_size=(16, 16, 16), batch_size=2,
                            max_instances=8),
            train=TrainConfig(total_steps=6, warmup_steps=2, log_every=3,
                              ckpt_every=100, prefetch_depth=depth,
                              ckpt_dir=str(tmp_path / sub)),
        )
        state, history = train(cfg, [vol])
        return jax.device_get(state.params), history

    p_sync, h_sync = run(0, "sync")
    p_pre, h_pre = run(2, "pre")
    jax.tree.map(np.testing.assert_array_equal, p_sync, p_pre)
    assert h_sync[-1]["loss"] == h_pre[-1]["loss"]


def test_grad_accum_matches_single_step():
    """VERDICT r2 #7: grad_accum=2 must produce the same update as the
    unaccumulated step (per-example-normalized losses; group norm so no
    batch-statistic coupling) — same params, same metrics."""
    import dataclasses

    import jax
    import numpy as np

    from tpuseg.core import Config, DataConfig, ModelConfig, TrainConfig
    from tpuseg.data import PatchSampler, synthesize_volume
    from tpuseg.models import build_model
    from tpuseg.train.step import create_train_state, make_train_step

    cfg = Config(
        model=ModelConfig(features=(4, 8), norm="group", num_groups=2,
                          head_features=4, compute_dtype="float32"),
        data=DataConfig(patch_size=(16, 16, 16), batch_size=4,
                        max_instances=8),
        train=TrainConfig(total_steps=4, warmup_steps=1),
    )
    vol = synthesize_volume(shape=(32, 32, 32), num_instances=6,
                            radius_range=(2.0, 4.0), seed=0)
    model = build_model(cfg.model)
    sampler = PatchSampler([vol], patch_size=cfg.data.patch_size,
                           batch_size=cfg.data.batch_size, max_instances=8)
    batch = sampler.next_batch()
    rng = jax.random.key(7)

    s0 = create_train_state(model, cfg, jax.random.key(0))
    step1 = jax.jit(make_train_step(model, cfg))
    s1, m1 = step1(s0, batch, rng)

    s0b = create_train_state(model, cfg, jax.random.key(0))
    step2 = jax.jit(make_train_step(model, cfg, grad_accum=2))
    s2, m2 = step2(s0b, batch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


# ---- validation split + metrics (VERDICT r3 #6) ----


def test_split_volumes_deterministic_and_disjoint():
    from tpuseg.train.val import split_volumes

    vols = [synthesize_volume(shape=(24, 24, 24), num_instances=3, seed=s)
            for s in range(5)]
    tr1, va1 = split_volumes(vols, 0.4, seed=3)
    tr2, va2 = split_volumes(vols, 0.4, seed=3)
    assert len(va1) == 2 and len(tr1) == 3
    for a, b in zip(va1, va2):
        assert a is b  # identical selection, same objects
    ids = {id(v) for v in vols}
    assert {id(v) for v in tr1} | {id(v) for v in va1} == ids
    assert {id(v) for v in tr1} & {id(v) for v in va1} == set()
    # a different seed picks a different hold-out at least sometimes
    by_id = {id(v): i for i, v in enumerate(vols)}
    picks = {tuple(sorted(by_id[id(v)]
                          for v in split_volumes(vols, 0.4, seed=s)[1]))
             for s in range(8)}
    assert len(picks) > 1


def test_split_single_volume_z_slab():
    from tpuseg.train.val import split_volumes

    vol = synthesize_volume(shape=(40, 24, 24), num_instances=8, seed=1)
    (tr,), (va,) = split_volumes([vol], 0.25, seed=0)
    assert tr.image.shape[0] == 30 and va.image.shape[0] == 10
    np.testing.assert_array_equal(
        np.concatenate([tr.image, va.image]), vol.image)
    # annotations partitioned by center z, val slab coords shifted
    assert len(tr.centers) + len(va.centers) == len(vol.centers)
    if len(va.centers):
        assert (va.centers[:, 0] >= 0).all() and (va.centers[:, 0] < 10).all()
    if len(tr.centers):
        assert (tr.centers[:, 0] < 30).all()


def test_val_metrics_and_best_checkpoint(vol, tmp_path):
    import dataclasses
    import os

    cfg = tiny_config(str(tmp_path / "ck"), steps=6)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, val_fraction=0.25, val_every=3, val_patches=4))
    vol2 = synthesize_volume(shape=(32, 32, 32), num_instances=4, seed=9)
    _, history = train(cfg, [vol, vol2], log_path=str(tmp_path / "m.jsonl"))
    val_recs = [h for h in history if "val_loss" in h]
    assert len(val_recs) >= 2
    assert all(np.isfinite(r["val_loss"]) for r in val_recs)
    assert {"val_fg_loss", "val_peak_loss"} <= set(val_recs[0])
    # best checkpoint retained
    assert os.path.isdir(tmp_path / "ck" / "best")
    from tpuseg.ckpt import CheckpointManager

    best = CheckpointManager(str(tmp_path / "ck" / "best"), keep=1)
    assert best.latest_step() is not None


def test_val_split_deterministic_across_resume(tmp_path):
    """Resume must re-derive the identical train/val split: a resumed run
    matches an uninterrupted one parameter-for-parameter."""
    import dataclasses

    vols = [synthesize_volume(shape=(32, 32, 32), num_instances=4, seed=s)
            for s in (0, 9)]

    def cfg_for(sub, steps):
        cfg = tiny_config(str(tmp_path / sub), steps=steps)
        return dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, val_fraction=0.5, val_every=3, val_patches=4))

    state_a, _ = train(cfg_for("a", 6), vols)
    train(cfg_for("b", 3), vols)
    state_b, _ = train(cfg_for("b", 6), vols, resume=True)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)


def test_bn_grad_accum_drift_bounded():
    """VERDICT r3 #9: with norm="batch" each microbatch sees its own batch
    statistics, so grad_accum deviates from the unaccumulated step. Quantify:
    the deviation exists but stays bounded over several steps (relative param
    distance < 2% after 4 steps on this toy net — documented semantics, see
    train/step.py)."""
    import dataclasses

    from tpuseg.train.step import create_train_state, make_train_step

    cfg = Config(
        model=ModelConfig(features=(4, 8), norm="batch", head_features=4,
                          compute_dtype="float32"),
        data=DataConfig(patch_size=(16, 16, 16), batch_size=4,
                        max_instances=8),
        train=TrainConfig(total_steps=4, warmup_steps=1),
    )
    vol = synthesize_volume(shape=(32, 32, 32), num_instances=6,
                            radius_range=(2.0, 4.0), seed=0)
    model = build_model(cfg.model)
    sampler = PatchSampler([vol], patch_size=cfg.data.patch_size,
                           batch_size=cfg.data.batch_size, max_instances=8)
    batches = [sampler.next_batch() for _ in range(4)]
    rng = jax.random.key(7)

    def run(accum):
        state = create_train_state(model, cfg, jax.random.key(0))
        step = jax.jit(make_train_step(model, cfg, grad_accum=accum))
        for b in batches:
            state, _ = step(state, b, rng)
        return state

    s1, s2 = run(1), run(2)
    num = den = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        num += float(jnp.sum((a - b) ** 2))
        den += float(jnp.sum(a ** 2))
    rel = (num / den) ** 0.5
    assert rel > 0.0         # BN batch stats DO couple microbatches...
    assert rel < 0.02, rel   # ...but the drift is bounded (documented)


def test_fused_train_step_matches_flax():
    """apply_impl='fused' (models/fused_train.py) == the flax step: same
    loss/grad-norm at trace-equivalent tolerance, same stats tree, params
    move. Interpret-mode kernels on CPU; real-chip speed rides bench c4."""
    import dataclasses

    from tpuseg.models.fused_train import make_fused_train_apply
    from tpuseg.train.step import loss_fn

    cfg = Config(
        model=ModelConfig(features=(32, 64), head_features=32,
                          compute_dtype="float32"),
        data=DataConfig(patch_size=(8, 16, 64), batch_size=2,
                        max_instances=8),
        train=TrainConfig(total_steps=4, warmup_steps=1),
    )
    vol = synthesize_volume(shape=(16, 32, 64), num_instances=4, seed=2)
    model = build_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    sampler = PatchSampler([vol], patch_size=cfg.data.patch_size,
                           batch_size=2, max_instances=8, seed=0)
    batch = {k: jnp.asarray(v) for k, v in sampler.next_batch().items()}
    rng = jax.random.key(3)

    apply_fn = make_fused_train_apply(model, interpret=True)
    (lf, (mf, sf)), gf = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, model, batch, cfg, rng, 0, apply_fn)
    (lr, (mr, sr)), gr = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, model, batch, cfg, rng, 0, None)

    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-3)
    assert jax.tree.structure(sf) == jax.tree.structure(sr)
    for a, b in zip(jax.tree.leaves(sf), jax.tree.leaves(sr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gf),
                            jax.tree.leaves(gr)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(float(np.abs(b).max()), 1e-6)
        rel = float(np.abs(a - b).max()) / denom
        assert rel < 5e-2, (jax.tree_util.keystr(path), rel)

    # the full step runs through make_train_step with apply_impl="fused"
    fcfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, apply_impl="fused"))
    # interpret-mode kernels for the CPU test platform
    import tpuseg.models.fused_train as ft
    orig = ft.make_fused_train_apply
    ft.make_fused_train_apply = lambda m, **kw: orig(m, interpret=True, **kw)
    try:
        step = jax.jit(make_train_step(model, fcfg))
        new_state, metrics = step(state, batch, rng)
    finally:
        ft.make_fused_train_apply = orig
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
