"""On-device 3D augmentation (SURVEY.md C4).

The reference augments patches with CPU numpy per batch (SURVEY.md §3.1 hot
loop); here augmentation is a pure jnp function of an explicit PRNG key so it
jit-fuses into the training step — zero host work, and exactly reproducible
from (seed, step).

Spatial ops (flips on all three axes, H<->W transpose when the patch is
square) are applied consistently to the image and every spatial target;
intensity ops (gamma/scale/shift/noise jitter) only to the image.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _maybe_flip(x, do, axis):
    return jnp.where(do, jnp.flip(x, axis=axis), x)


def _maybe_swap_hw(x, do):
    return jnp.where(do, jnp.transpose(x, (0, 2, 1)), x)


def augment_patch(
    rng: jax.Array,
    image: jnp.ndarray,                 # (D, H, W)
    targets: Dict[str, jnp.ndarray],    # spatial volumes, same shape
    intensity: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    k_flip, k_swap, k_scale, k_shift, k_noise = jax.random.split(rng, 5)
    flips = jax.random.bernoulli(k_flip, 0.5, (3,))
    swap = jax.random.bernoulli(k_swap, 0.5)
    square = image.shape[1] == image.shape[2]

    def spatial(x):
        for axis in range(3):
            x = _maybe_flip(x, flips[axis], axis)
        if square:
            x = _maybe_swap_hw(x, swap)
        return x

    image = spatial(image)
    targets = {k: spatial(v) for k, v in targets.items()}

    if intensity:
        scale = 1.0 + 0.2 * jax.random.uniform(k_scale, minval=-1.0, maxval=1.0)
        shift = 0.1 * jax.random.uniform(k_shift, minval=-1.0, maxval=1.0)
        noise = 0.02 * jax.random.normal(k_noise, image.shape)
        image = jnp.clip(image * scale + shift + noise, 0.0, 1.0)
    return image, targets
