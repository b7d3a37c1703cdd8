"""Loss values on hand-built toy targets (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core import TrainConfig
from tpuseg.losses import fg_loss, peak_loss, total_loss


def test_peak_loss_zero_at_perfect_prediction():
    target = jnp.zeros((4, 4, 4)).at[2, 2, 2].set(1.0)
    # logits = logit(target) is infinite at exactly 0/1; use near-saturated
    logits = jnp.where(target > 0.5, 30.0, -30.0)
    assert float(peak_loss(logits, target)) < 1e-6


def test_peak_loss_positive_weighting():
    target = jnp.zeros((4, 4, 4)).at[0, 0, 0].set(1.0)
    miss_pos = jnp.full((4, 4, 4), -30.0)  # misses the positive
    # hits the positive but adds one false positive:
    one_fp = jnp.full((4, 4, 4), -30.0).at[0, 0, 0].set(30.0).at[1, 1, 1].set(30.0)
    # missing the single positive must cost more than one false positive
    assert float(peak_loss(miss_pos, target)) > float(peak_loss(one_fp, target))


def test_fg_loss_ignore_ring_carries_no_gradient():
    target = jnp.zeros((4, 4, 4))
    weight = jnp.ones((4, 4, 4)).at[1, 1, 1].set(0.0)

    def loss_of(logits):
        return fg_loss(logits, target, weight)

    g = jax.grad(loss_of)(jnp.zeros((4, 4, 4)))
    assert float(g[1, 1, 1]) == 0.0
    assert float(jnp.abs(g).sum()) > 0.0


def test_fg_loss_perfect_prediction_near_zero():
    target = jnp.zeros((4, 4, 4)).at[1:3, 1:3, 1:3].set(1.0)
    logits = jnp.where(target > 0.5, 30.0, -30.0)
    val = float(fg_loss(logits, target, jnp.ones_like(target)))
    assert val < 0.05  # dice eps keeps it slightly above 0


def test_total_loss_composition():
    cfg = TrainConfig(peak_loss_weight=2.0, fg_loss_weight=3.0)
    out = {
        "peak_logits": jnp.zeros((2, 4, 4, 4)),
        "fg_logits": jnp.zeros((2, 4, 4, 4)),
    }
    tgt = {
        "peak": jnp.zeros((2, 4, 4, 4)),
        "fg": jnp.zeros((2, 4, 4, 4)),
        "fg_weight": jnp.ones((2, 4, 4, 4)),
    }
    loss, metrics = total_loss(out, tgt, cfg)
    assert float(loss) == pytest.approx(
        2.0 * float(metrics["peak_loss"]) + 3.0 * float(metrics["fg_loss"])
    )
    assert np.isfinite(float(loss))
