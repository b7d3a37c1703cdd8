"""Combined weakly-supervised objective (SURVEY.md C7/C8)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from tpuseg.core import TrainConfig
from tpuseg.losses.box_fg import fg_loss
from tpuseg.losses.peak import peak_loss


def total_loss(
    outputs: Dict[str, jnp.ndarray],   # fg_logits, peak_logits: (B, D, H, W)
    targets: Dict[str, jnp.ndarray],   # peak, fg, fg_weight:     (B, D, H, W)
    cfg: TrainConfig = TrainConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-example losses averaged over the batch.

    Normalizing per example (not per batch) makes the objective exactly
    decomposable across data-parallel shards: pmean of per-shard losses
    equals the global-batch loss, so DP training is bitwise-consistent with
    single-device up to float reduction order (tests/distributed/).
    """
    import jax

    def per_example(pl, pt, fl, ft, fw):
        return peak_loss(pl, pt), fg_loss(fl, ft, fw, dice_weight=cfg.dice_weight)

    lp, lf = jax.vmap(per_example)(
        outputs["peak_logits"], targets["peak"],
        outputs["fg_logits"], targets["fg"], targets["fg_weight"],
    )
    lp, lf = jnp.mean(lp), jnp.mean(lf)
    loss = cfg.peak_loss_weight * lp + cfg.fg_loss_weight * lf
    return loss, {"loss": loss, "peak_loss": lp, "fg_loss": lf}
