"""Percentile intensity normalization (SURVEY.md C3).

NORTH-STAR: "Preprocessing (patch extraction, intensity normalization,
augmentation) fuses into the same jit-compiled graph" — so this is a pure jnp
function usable both host-side (numpy in, numpy out via jax) and inside the
fused inference/training graphs.
"""

from __future__ import annotations

import jax.numpy as jnp


def percentile_normalize(vol, pcts=(1.0, 99.8), eps: float = 1e-6):
    """Map [p_lo, p_hi] percentiles of ``vol`` to [0, 1], clipped. Exact
    (sort-based) — use for training patches and parity tests."""
    vol = jnp.asarray(vol, jnp.float32)
    lo = jnp.percentile(vol, pcts[0])
    hi = jnp.percentile(vol, pcts[1])
    return jnp.clip((vol - lo) / jnp.maximum(hi - lo, eps), 0.0, 1.0)


def histogram_percentile_normalize(vol, pcts=(1.0, 99.8), bins: int = 4096,
                                   eps: float = 1e-6, sample_stride: int = 1):
    """Percentile normalization from a 4096-bin histogram: O(N) scatter +
    O(bins) scan instead of an O(N log N) sort — the whole-volume inference
    path uses this (error < range/bins, invisible after sigmoid+threshold).
    Same math as the psum'd version in infer/sharded.py, single-device.

    ``sample_stride > 1`` histograms every k-th x-voxel only (the scatter is
    the dominant cost; percentiles of a 25-MVox stack from a stride-4 sample
    are statistically indistinguishable at 1/4096 quantile resolution). min/
    max still scan the full volume so clipping bounds stay exact. The stride
    runs along the unsharded x axis, so the sharded/streamed paths sample the
    SAME voxels and stay parity-exact."""
    vol = jnp.asarray(vol, jnp.float32)
    p_lo, p_hi = histogram_percentile_scalars(vol, pcts, bins=bins,
                                              sample_stride=sample_stride)
    return jnp.clip((vol - p_lo) / jnp.maximum(p_hi - p_lo, eps), 0.0, 1.0)


def histogram_percentile_scalars(vol, pcts=(1.0, 99.8), bins: int = 4096,
                                 sample_stride: int = 1):
    """The (p_lo, p_hi) percentile scalars of ``histogram_percentile_normalize``
    without applying them — the fused pipeline normalizes per tile block
    inside the net sweep instead of taking an extra full-volume round trip."""
    from tpuseg.ops.histogram import bin_counts

    vol = jnp.asarray(vol, jnp.float32)
    lo = jnp.min(vol)
    hi = jnp.max(vol)
    span = jnp.maximum(hi - lo, 1e-12)
    sample = vol[..., ::sample_stride] if sample_stride > 1 else vol
    idx = jnp.clip(((sample - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    hist = bin_counts(idx, bins)  # sort-based: ~10x the scatter's speed
    # fraction-form CDF: the identical arithmetic to the psum'd sharded
    # version (infer/sharded.global_histogram_percentile with 1 shard), so
    # sharded-vs-single parity tests see the same percentile bin
    cdf = jnp.cumsum(hist.astype(jnp.float32) / sample.size)

    def pct_value(p):
        b = jnp.searchsorted(cdf, jnp.float32(p / 100.0))
        return lo + (b.astype(jnp.float32) + 0.5) / bins * span

    return pct_value(pcts[0]), pct_value(pcts[1])
