"""Percentile intensity normalization (SURVEY.md C3).

NORTH-STAR: "Preprocessing (patch extraction, intensity normalization,
augmentation) fuses into the same jit-compiled graph" — so this is a pure jnp
function usable both host-side (numpy in, numpy out via jax) and inside the
fused inference/training graphs.
"""

from __future__ import annotations

import jax.numpy as jnp


def percentile_normalize(vol, pcts=(1.0, 99.8), eps: float = 1e-6):
    """Map [p_lo, p_hi] percentiles of ``vol`` to [0, 1], clipped."""
    vol = jnp.asarray(vol, jnp.float32)
    lo = jnp.percentile(vol, pcts[0])
    hi = jnp.percentile(vol, pcts[1])
    return jnp.clip((vol - lo) / jnp.maximum(hi - lo, eps), 0.0, 1.0)
