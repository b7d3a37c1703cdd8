"""Training step (SURVEY.md C8, §3.1).

The reference's hot loop is Python-driven: CPU augmentation + target
synthesis per batch, then an eager CUDA forward/backward (SURVEY.md §3.1).
Here the ENTIRE step — normalization, weak-target synthesis, augmentation,
forward, loss, backward, optimizer update — is one jit-compiled XLA program
(NORTH-STAR: "Preprocessing ... fuses into the same jit-compiled graph ...
zero Python in the hot loop"). The host only feeds raw float patches and
integer annotations.

State carries ``batch_stats`` (BatchNorm running statistics) alongside params
and optimizer state; under DP the stats sync across shards via the BN
``axis_name`` (see models.blocks).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpuseg.core import Config
from tpuseg.data.augment import augment_patch, zscale_patch
from tpuseg.data.normalize import histogram_percentile_normalize
from tpuseg.data.weak_targets import make_weak_targets
from tpuseg.losses import total_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # init_value > 0 so the very first step (optax count 0) is not a no-op
    sched = optax.warmup_cosine_decay_schedule(
        init_value=cfg.train.lr / max(cfg.train.warmup_steps, 1),
        peak_value=cfg.train.lr,
        warmup_steps=cfg.train.warmup_steps,
        decay_steps=max(cfg.train.total_steps, cfg.train.warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=cfg.train.weight_decay),
    )


def create_train_state(model, cfg: Config, rng: jax.Array) -> TrainState:
    from tpuseg.models import init_variables

    variables = init_variables(model, rng, patch_shape=cfg.data.patch_size)
    params = variables["params"]
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )


def prepare_batch(batch: Dict[str, jnp.ndarray], cfg: Config, rng: jax.Array,
                  example_offset=0):
    """Raw sampler batch -> (images NDHWC, target dict). Fully jittable.

    Per-example augmentation keys are derived by folding the GLOBAL example
    index (``example_offset + i``) into ``rng`` — not by splitting a local
    key — so a DP shard holding examples [k*b_local, (k+1)*b_local) draws
    exactly the keys the single-device run draws for those examples, and
    augmented DP training is bitwise-equal to single-device
    (tests/distributed/test_dp_train.py)."""
    patch = cfg.data.patch_size

    def one(img, centers, halfs, valid, idx):
        # histogram percentile: O(N) vs the O(N log N) sort, error < 1/4096
        # of the intensity range — noise next to the augmentation jitter
        img = histogram_percentile_normalize(img, cfg.data.normalize_pcts)
        z_weight = None
        if cfg.data.augment and cfg.data.aug_zscale is not None:
            # anisotropy augmentation acts in annotation space BEFORE target
            # synthesis (see data.augment.zscale_patch); key derived by a
            # second fold so the flip/intensity stream below is unchanged
            img, centers, halfs, valid, z_weight = zscale_patch(
                jax.random.fold_in(jax.random.fold_in(rng, idx), 1),
                img, centers, halfs, valid, cfg.data.aug_zscale)
        tgt = make_weak_targets(
            centers, halfs, valid, patch,
            peak_sigma=cfg.data.peak_sigma,
            margin=cfg.data.box_ignore_margin,
            aniso_sigma=cfg.data.peak_sigma_aniso,
        )
        if z_weight is not None:
            # exclude edge-replicated z planes from the fg loss (ADVICE r3:
            # squash smear would otherwise train bright tissue as background)
            tgt = dict(tgt, fg_weight=tgt["fg_weight"] * z_weight[:, None, None])
        if cfg.data.augment:
            img, tgt = augment_patch(jax.random.fold_in(rng, idx), img, tgt)
        return img, tgt

    b = batch["image"].shape[0]
    idxs = example_offset + jnp.arange(b, dtype=jnp.int32)
    imgs, tgts = jax.vmap(one)(
        batch["image"], batch["centers"], batch["half_sizes"],
        batch["valid"], idxs,
    )
    return imgs[..., None], tgts


def loss_fn(params, batch_stats, model, batch, cfg: Config, rng: jax.Array,
            example_offset=0, apply_fn=None):
    imgs, tgts = prepare_batch(batch, cfg, rng, example_offset=example_offset)
    if apply_fn is not None:
        # fused train forward (models/fused_train.py): same (out, stats)
        # contract as the flax apply below, full-res convs on Pallas
        out, new_stats = apply_fn(
            {"params": params, "batch_stats": batch_stats}, imgs)
    else:
        out, new_vars = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, train=True, mutable=["batch_stats"],
        )
        new_stats = new_vars["batch_stats"]
    loss, metrics = total_loss(out, tgts, cfg.train)
    return loss, (metrics, new_stats)


def make_train_step(model, cfg: Config, axis_name: str | None = None,
                    grad_accum: int = 1):
    """Build the (state, batch, rng) -> (state, metrics) step.

    ``axis_name``: if set, gradients and metrics are pmean-averaged over that
    mapped mesh axis (used by train.dp under shard_map). BatchNorm statistics
    sync inside the model via its own axis_name; the model passed here must
    have been built with ``bn_axis=axis_name`` in that case.

    ``cfg.train.apply_impl == "fused"``: the train-mode forward/backward
    runs with the full-res convs on the packed Mosaic kernels
    (models/fused_train.py custom_vjp; NORTH-STAR "forward/backward lowers
    to XLA/Pallas conv kernels"). The apply is built here so DP passes its
    ``axis_name`` through for BN stat sync; shape support is validated at
    first trace (fused_train_supported).

    ``grad_accum`` > 1 (VERDICT r2 #7): the batch's leading dim splits into
    that many microbatches run sequentially under ``lax.scan``, gradients
    averaged before ONE optimizer update — a k-times-larger effective batch
    at 1/k the activation memory. Because the losses normalize per example
    (losses/, the DP-decomposability argument), the averaged gradient equals
    the big-batch gradient exactly for norm="group"/"none"; with
    norm="batch" the microbatches see their own batch statistics (the same
    deviation any BN grad-accum scheme has). Per-example augmentation keys
    use the global example index, so the drawn augmentations are identical
    to the unaccumulated step.
    """

    apply_fn = None
    if cfg.train.apply_impl == "fused":
        from tpuseg.models.fused_train import make_fused_train_apply

        apply_fn = make_fused_train_apply(model, axis_name=axis_name)
    elif cfg.train.apply_impl != "flax":
        raise ValueError(f"unknown TrainConfig.apply_impl "
                         f"{cfg.train.apply_impl!r}")

    def grads_and_aux(state, batch, rng, offset):
        if grad_accum == 1:
            (_, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, model, batch, cfg, rng, offset,
              apply_fn)
            return grads, metrics, new_stats

        b = batch["image"].shape[0]
        assert b % grad_accum == 0, (b, grad_accum)
        mb = b // grad_accum
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((grad_accum, mb) + x.shape[1:]), batch)

        def body(carry, inp):
            stats, gacc, macc = carry
            mbatch, j = inp
            (_, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, stats, model, mbatch, cfg, rng, offset + j * mb,
              apply_fn)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            macc = jax.tree_util.tree_map(jnp.add, macc, metrics)
            return (new_stats, gacc, macc), None

        gacc0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), state.params)
        first = jax.tree_util.tree_map(lambda x: x[0], micro)
        # metrics tree STRUCTURE only — no compute
        _, (m_shape, _) = jax.eval_shape(
            lambda p, s, b, r, o: loss_fn(p, s, model, b, cfg, r, o,
                                          apply_fn),
            state.params, state.batch_stats, first, rng, offset)
        macc0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
        (new_stats, gacc, macc), _ = jax.lax.scan(
            body, (state.batch_stats, gacc0, macc0),
            (micro, jnp.arange(grad_accum, dtype=jnp.int32)))
        k = jnp.float32(grad_accum)
        grads = jax.tree_util.tree_map(lambda g: g / k, gacc)
        metrics = jax.tree_util.tree_map(lambda m: m / k, macc)
        return grads, metrics, new_stats

    def step(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        # global index of this shard's first example: DP shards draw the same
        # per-example augmentation keys as a single-device run (see
        # prepare_batch)
        if axis_name is not None:
            offset = jax.lax.axis_index(axis_name) * batch["image"].shape[0]
        else:
            offset = 0
        grads, metrics, new_stats = grads_and_aux(state, batch, rng, offset)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads, new_stats)
        metrics = dict(metrics, grad_norm=gnorm)
        return state, metrics

    return step
