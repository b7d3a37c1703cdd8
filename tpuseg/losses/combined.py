"""Combined weakly-supervised objective (SURVEY.md C7/C8)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from tpuseg.core import TrainConfig
from tpuseg.losses.box_fg import fg_loss
from tpuseg.losses.peak import peak_loss


def total_loss(
    outputs: Dict[str, jnp.ndarray],   # fg_logits, peak_logits
    targets: Dict[str, jnp.ndarray],   # peak, fg, fg_weight
    cfg: TrainConfig = TrainConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    lp = peak_loss(outputs["peak_logits"], targets["peak"])
    lf = fg_loss(
        outputs["fg_logits"], targets["fg"], targets["fg_weight"],
        dice_weight=cfg.dice_weight,
    )
    loss = cfg.peak_loss_weight * lp + cfg.fg_loss_weight * lf
    return loss, {"loss": loss, "peak_loss": lp, "fg_loss": lf}
