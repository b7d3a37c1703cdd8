"""Weakly-supervised training loop (SURVEY.md C8, §3.1).

Single-device or data-parallel (mesh with >1 device), with:
  * jit-fused step (prep + fwd/bwd + update) — zero Python in the hot loop
  * JSONL metrics incl. Mvox/s throughput (the north-star counter)
  * Orbax async checkpoints carrying optimizer + sampler state for exact
    resume (SURVEY.md §5 failure recovery: kill-and-resume safe)
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import numpy as np

from tpuseg.ckpt import CheckpointManager
from tpuseg.core import Config
from tpuseg.data import PatchSampler
from tpuseg.data.synthetic import SyntheticVolume
from tpuseg.models import build_model
from tpuseg.train.dp import make_data_mesh, make_dp_train_step, shard_batch
from tpuseg.train.step import create_train_state, make_train_step
from tpuseg.utils.logging import MetricsLogger


def train(
    cfg: Config,
    volumes: Sequence[SyntheticVolume],
    mesh=None,
    log_path: Optional[str] = None,
    resume: bool = False,
    val_volumes: Optional[Sequence[SyntheticVolume]] = None,
):
    """Returns (final TrainState, list of metric dicts).

    Validation (VERDICT r3 #6): pass ``val_volumes`` explicitly, or set
    ``cfg.train.val_fraction`` > 0 to derive a deterministic hold-out from
    ``volumes`` (train/val.py split_volumes — resume re-derives the same
    split). Val metrics land in the same JSONL/history stream as ``val_*``
    keys; the best-val-loss params are retained under ``<ckpt_dir>/best``.
    """
    model = build_model(cfg.model)
    rng = jax.random.key(cfg.train.seed)
    state = create_train_state(model, cfg, rng)

    if val_volumes is None and cfg.train.val_fraction > 0:
        from tpuseg.train.val import split_volumes

        volumes, val_volumes = split_volumes(
            volumes, cfg.train.val_fraction, cfg.train.seed,
            min_depth=cfg.data.patch_size[0])
    val_eval = None
    if val_volumes:
        from tpuseg.train.val import make_val_eval

        val_eval = make_val_eval(model, cfg, val_volumes)

    sampler = PatchSampler(
        volumes,
        patch_size=cfg.data.patch_size,
        batch_size=cfg.data.batch_size,
        max_instances=cfg.data.max_instances,
        seed=cfg.train.seed,
    )
    mgr = CheckpointManager(cfg.train.ckpt_dir, keep=cfg.train.keep_ckpts)
    best_mgr = None
    if val_eval is not None and cfg.train.keep_best:
        import os

        best_mgr = CheckpointManager(
            os.path.join(cfg.train.ckpt_dir, "best"), keep=1)
    best_val = float("inf")

    start_step = 0
    if resume and mgr.latest_step() is not None:
        params, opt_state, meta, batch_stats = mgr.restore(
            state.params, state.opt_state,
            batch_stats_template=state.batch_stats,
        )
        state = state.replace(
            params=params,
            opt_state=opt_state,
            batch_stats=batch_stats if batch_stats is not None else state.batch_stats,
            step=jax.numpy.asarray(meta["step"], jax.numpy.int32),
        )
        sampler.load_state_dict(meta["sampler"])
        start_step = int(meta["step"])
        best_val = float(meta.get("best_val", best_val))

    if (
        mesh is None
        and jax.device_count() > 1
        and cfg.data.batch_size % jax.device_count() == 0
    ):
        mesh = make_data_mesh(cfg.train.data_axis)
    if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
        step_fn = make_dp_train_step(model, cfg, mesh)
        put = lambda b: shard_batch(b, mesh)
    else:
        step_fn = jax.jit(make_train_step(model, cfg, grad_accum=cfg.train.grad_accum),
                          donate_argnums=(0,))
        # upload on the prefetch worker thread: device_put is async, so the
        # H2D copy of batch N+1 rides under step N's compute instead of
        # serializing at dispatch (measured: the synchronous feed cost
        # ~300 ms/step at 8x64^3 on this host's tunnel vs a 173 ms step)
        put = jax.device_put

    logger = MetricsLogger(log_path, echo=False)
    step_rng = jax.random.key(cfg.train.seed + 1)
    voxels_per_batch = cfg.data.batch_size * int(np.prod(cfg.data.patch_size))

    # background sampling + H2D upload overlapping device compute (SURVEY §7
    # hard part 5); state_dict() counts CONSUMED batches, so checkpoints stay
    # exact-resume (tests/unit/test_train_step.py)
    if cfg.train.prefetch_depth > 0:
        from tpuseg.data.prefetch import BatchPrefetcher

        feed = BatchPrefetcher(sampler, put, depth=cfg.train.prefetch_depth)
    else:
        class _Sync:
            consumed_step = start_step

            def next(self):
                return put(sampler.next_batch())

            def state_dict(self):
                return sampler.state_dict()

            def close(self):
                pass

        feed = _Sync()

    history = []
    try:
        t_last = time.perf_counter()
        for step in range(start_step, cfg.train.total_steps):
            batch = feed.next()
            state, metrics = step_fn(state, batch, step_rng)
            if (step + 1) % cfg.train.log_every == 0 or step + 1 == cfg.train.total_steps:
                metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                now = time.perf_counter()
                dt = now - t_last
                t_last = now
                mvox_s = voxels_per_batch * cfg.train.log_every / dt / 1e6
                logger.log(step + 1, metrics, mvox_per_s=round(mvox_s, 3))
                history.append({"step": step + 1, **metrics, "mvox_per_s": mvox_s})
            if val_eval is not None and (
                (step + 1) % cfg.train.val_every == 0
                or step + 1 == cfg.train.total_steps
            ):
                vm = val_eval(state)
                logger.log(step + 1, vm)
                history.append({"step": step + 1, **vm})
                if best_mgr is not None and vm["val_loss"] < best_val:
                    best_val = vm["val_loss"]
                    best_mgr.save(
                        step + 1,
                        jax.device_get(state.params),
                        jax.device_get(state.opt_state),
                        meta={"step": step + 1, "config": cfg.to_dict(),
                              **{k: float(v) for k, v in vm.items()}},
                        batch_stats=jax.device_get(state.batch_stats),
                    )
                t_last = time.perf_counter()  # don't bill val time as train
            if (step + 1) % cfg.train.ckpt_every == 0 or step + 1 == cfg.train.total_steps:
                mgr.save(
                    step + 1,
                    jax.device_get(state.params),
                    jax.device_get(state.opt_state),
                    meta={
                        "step": step + 1,
                        "sampler": feed.state_dict(),
                        "config": cfg.to_dict(),
                        "best_val": best_val,
                    },
                    batch_stats=jax.device_get(state.batch_stats),
                )
    finally:
        feed.close()
    mgr.wait()
    if best_mgr is not None:
        best_mgr.wait()
    logger.close()
    return state, history
