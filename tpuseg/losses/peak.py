"""Peak/center-response loss (SURVEY.md C7, NORTH-STAR "peak-style losses").

The peak head regresses the gaussian center-response map built by
data/weak_targets.py. Plain MSE drowns the sparse positives in the empty
background, so positives are up-weighted by (1 + w * target) — the standard
recipe for center/peak regression heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def peak_loss(
    peak_logits: jnp.ndarray,   # (..., D, H, W) raw head output
    peak_target: jnp.ndarray,   # same shape, in [0, 1]
    pos_weight: float = 10.0,
) -> jnp.ndarray:
    pred = jax.nn.sigmoid(peak_logits.astype(jnp.float32))
    target = peak_target.astype(jnp.float32)
    w = 1.0 + pos_weight * target
    return jnp.sum(w * (pred - target) ** 2) / jnp.sum(w)
