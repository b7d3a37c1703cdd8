"""Train/validation split + periodic validation metrics (SURVEY.md C2, C14).

The reference's Dataset carries a train/val split (SURVEY.md C2 [NORTH-STAR])
but its training loop logs only train loss; here validation is a first-class
loop feature (VERDICT r3 #6):

* :func:`split_volumes` — deterministic, seed-keyed hold-out. Multi-volume
  inputs split at VOLUME granularity (the honest split — no spatial leakage);
  a single volume splits along z into disjoint slabs (leakage limited to the
  net's receptive field across one cut plane, documented trade).
* :func:`make_val_eval` — a reusable evaluator: fixed validation patches
  (pure function of the seed, so every eval scores the SAME patches and the
  series is comparable across steps and across resumes), eval-mode forward
  (train=False: BatchNorm running stats, no augmentation), the training loss
  decomposition, and optionally instance-level center-criterion F1 from full
  val-volume inference — center matching needs only the weak annotations, so
  it works on real (GT-free) data exactly like the streamed scorer.

The loop (train/loop.py) logs ``val_*`` metrics into the same JSONL stream
and retains the best-val-loss checkpoint under ``<ckpt_dir>/best``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import numpy as np

from tpuseg.core import Config
from tpuseg.data.sampler import PatchSampler
from tpuseg.data.synthetic import SyntheticVolume


def split_volumes(
    volumes: Sequence[SyntheticVolume],
    val_fraction: float,
    seed: int = 0,
    min_depth: int = 1,
) -> Tuple[List[SyntheticVolume], List[SyntheticVolume]]:
    """Deterministic (seed-keyed) train/val split.

    len(volumes) >= 2: a seeded permutation holds out
    ``max(1, round(val_fraction * n))`` whole volumes (at least one stays in
    train). One volume: the top ``ceil(val_fraction * D)`` z-planes become the
    val slab, the rest train; annotations go with the slab containing their
    center (coordinates shifted into slab frame). Pure function of
    (volumes, val_fraction, seed) — resume re-derives the identical split
    (tests/unit/test_train_step.py).
    """
    if not 0.0 < val_fraction < 1.0:
        raise ValueError(f"val_fraction must be in (0, 1), got {val_fraction}")
    vols = list(volumes)
    if len(vols) >= 2:
        order = np.random.default_rng(
            np.random.SeedSequence(entropy=(seed, 0x51))
        ).permutation(len(vols))
        n_val = min(len(vols) - 1, max(1, round(val_fraction * len(vols))))
        val_idx = set(int(i) for i in order[:n_val])
        train = [v for i, v in enumerate(vols) if i not in val_idx]
        val = [vols[i] for i in sorted(val_idx)]
        return train, val

    (vol,) = vols
    d = vol.image.shape[0]
    d_val = int(np.ceil(val_fraction * d))
    # both slabs must fit at least one patch (ADVICE r4: a slab shallower
    # than the patch makes PatchSampler clip origins negative and crash)
    if d_val < min_depth or d - d_val < min_depth:
        raise ValueError(
            f"single-volume split needs >= {min_depth} z planes on each "
            f"side (patch depth); val_fraction={val_fraction} on D={d} gives "
            f"val={d_val}/train={d - d_val}. Use a larger val_fraction, a "
            "deeper volume, or pass whole val volumes.")
    cut = d - d_val

    def slab(z0, z1):
        inside = (vol.centers[:, 0] >= z0) & (vol.centers[:, 0] < z1)
        centers = vol.centers[inside] - np.array([z0, 0, 0], np.float32)
        labels = vol.labels[z0:z1] if vol.labels is not None else None
        return SyntheticVolume(
            image=vol.image[z0:z1],
            labels=labels,
            centers=centers.astype(np.float32),
            half_sizes=vol.half_sizes[inside].astype(np.float32),
        )

    return [slab(0, cut)], [slab(cut, d)]


def make_val_eval(model, cfg: Config, val_volumes: Sequence[SyntheticVolume]):
    """Build ``evaluate(state) -> {"val_loss": ..., ...}``.

    Patches are drawn ONCE from a seed-keyed sampler (seed offset keeps them
    disjoint from the training stream even on shared volumes) and reused for
    every call; the loss runs eval-mode (train=False, no augmentation) so the
    series measures the model, not the augmentation draw. With
    ``cfg.train.val_f1`` each call also runs full inference on every val
    volume and scores center-criterion instance F1 against the annotations.
    """
    from tpuseg.losses import total_loss
    from tpuseg.train.step import prepare_batch

    n_batches = max(1, -(-cfg.train.val_patches // cfg.data.batch_size))
    sampler = PatchSampler(
        list(val_volumes),
        patch_size=cfg.data.patch_size,
        batch_size=cfg.data.batch_size,
        max_instances=cfg.data.max_instances,
        seed=cfg.train.seed + 0x5EED,
    )
    batches = [sampler.next_batch() for _ in range(n_batches)]

    eval_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, augment=False))

    @jax.jit
    def batch_loss(params, batch_stats, batch):
        imgs, tgts = prepare_batch(batch, eval_cfg, jax.random.key(0))
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=False)
        loss, metrics = total_loss(out, tgts, cfg.train)
        return loss, metrics

    if cfg.train.val_f1:
        from tpuseg.eval import center_match_f1
        from tpuseg.infer import make_infer_fn

        infer = make_infer_fn(model, cfg)

    def evaluate(state) -> dict:
        losses, fgs, peaks = [], [], []
        for b in batches:
            loss, m = batch_loss(state.params, state.batch_stats, b)
            losses.append(float(loss))
            fgs.append(float(m["fg_loss"]))
            peaks.append(float(m["peak_loss"]))
        out = {
            "val_loss": float(np.mean(losses)),
            "val_fg_loss": float(np.mean(fgs)),
            "val_peak_loss": float(np.mean(peaks)),
        }
        if cfg.train.val_f1:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            f1s = []
            for v in val_volumes:
                labels = np.asarray(
                    infer(variables, jax.numpy.asarray(v.image)))
                f1s.append(center_match_f1(labels, v.centers)["f1"])
            out["val_center_f1"] = float(np.mean(f1s))
        return out

    return evaluate
