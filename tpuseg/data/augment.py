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


def zscale_patch(
    rng: jax.Array,
    image: jnp.ndarray,        # (D, H, W)
    centers: jnp.ndarray,      # (M, 3) float32, padded
    half_sizes: jnp.ndarray,   # (M, 3) float32, padded
    valid: jnp.ndarray,        # (M,) bool
    scale_range: Tuple[float, float],
):
    """Anisotropy (z-scale) augmentation in ANNOTATION space.

    Squashes/stretches the patch along z by ``s ~ U(lo, hi)`` about the patch
    center — simulating acquisition anisotropy (light-sheet z-PSF compression)
    the reference's flip/rotation augmentations (SURVEY.md C4) cannot model.
    Runs BEFORE weak-target synthesis: the image is resampled (linear,
    edge-clamped — static output shape, one gather + lerp) and the
    annotations are transformed (center_z -> c + (center_z - c) * s,
    half_z -> half_z * s), so the targets are synthesized directly in the
    squashed frame with no target interpolation artifacts.

    Returns ``(image, centers, half_sizes, valid, z_weight)``:

    * ``z_weight`` (D,) float32 — 0 on output planes whose source coordinate
      falls outside [0, d-1] (with s < 1 those planes edge-replicate the face
      plane; if an instance straddles the face its bright tissue is smeared
      across them while the squashed annotation labels those voxels confident
      background — ADVICE r3). Callers multiply it into ``fg_weight`` so the
      replicated planes are excluded from the fg loss.
    * ``valid`` — input validity AND transformed-center-in-bounds, so for
      stretch factors s > 1 annotations whose content left the patch don't
      synthesize targets over unrelated voxels (ADVICE r3).
    """
    lo, hi = scale_range
    s = jax.random.uniform(rng, minval=lo, maxval=hi)
    d = image.shape[0]
    c = (d - 1) / 2.0
    z_in = c + (jnp.arange(d, dtype=jnp.float32) - c) / s
    in_bounds = (z_in >= 0.0) & (z_in <= d - 1.0)
    z_weight = in_bounds.astype(jnp.float32)
    z0 = jnp.clip(jnp.floor(z_in).astype(jnp.int32), 0, d - 1)
    z1 = jnp.clip(z0 + 1, 0, d - 1)
    w = jnp.clip(z_in - z0.astype(jnp.float32), 0.0, 1.0)[:, None, None]
    image = image[z0] * (1.0 - w) + image[z1] * w
    cz = c + (centers[:, 0] - c) * s
    centers = jnp.concatenate([cz[:, None], centers[:, 1:]], axis=1)
    hz = half_sizes[:, 0] * s
    half_sizes = jnp.concatenate([hz[:, None], half_sizes[:, 1:]], axis=1)
    valid = valid & (cz >= 0.0) & (cz <= d - 1.0)
    return image, centers, half_sizes, valid, z_weight
