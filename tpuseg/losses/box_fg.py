"""Box-derived foreground loss (SURVEY.md C7, NORTH-STAR "box-style losses").

Weighted binary cross-entropy plus a soft-Dice term on the box-derived
foreground pseudo-labels; the uncertainty ring around each box carries weight
0 (see data/weak_targets.py) so those voxels contribute no gradient — the
weak-supervision trick that replaces voxel-wise masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, target):
    # numerically stable: max(x,0) - x*t + log1p(exp(-|x|))
    return jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def fg_loss(
    fg_logits: jnp.ndarray,   # (..., D, H, W)
    fg_target: jnp.ndarray,   # same shape, {0, 1}
    fg_weight: jnp.ndarray,   # same shape, {0, 1}: 0 = ignore (uncertain ring)
    dice_weight: float = 0.5,
    eps: float = 1.0,
) -> jnp.ndarray:
    logits = fg_logits.astype(jnp.float32)
    target = fg_target.astype(jnp.float32)
    w = fg_weight.astype(jnp.float32)

    bce = jnp.sum(w * _bce_with_logits(logits, target)) / jnp.maximum(jnp.sum(w), 1.0)

    prob = jax.nn.sigmoid(logits)
    inter = jnp.sum(w * prob * target)
    denom = jnp.sum(w * prob) + jnp.sum(w * target)
    dice = 1.0 - (2.0 * inter + eps) / (denom + eps)
    return bce + dice_weight * dice
