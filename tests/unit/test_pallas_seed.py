"""Fused seed pass (ops/pallas_seed.py) == the unfused composition
(NMS & fg, steepest_dir_codes, signed v0, chase_pass(h0)) — elementwise,
interpret mode (SURVEY.md §4.1; the real-chip check rides the watershed
parity drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.ops.pallas_resolve import chase_pass
from tpuseg.ops.pallas_seed import seed_block, seed_chase_pass, seed_pass_supported
from tpuseg.ops.peaks import peak_nms, radius3
from tpuseg.ops.watershed import steepest_dir_codes
from tpuseg.ops.neighbors import linear_index


def _fixture(shape=(16, 32, 128), seed=0):
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    peak = np.zeros(shape, np.float32)
    for _ in range(8):
        c = rng.uniform([2, 2, 2], np.array(shape) - 2)
        s = rng.uniform(1.5, 3.0)
        peak = np.maximum(peak, np.exp(
            -((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
            / (2 * s * s)).astype(np.float32))
    peak += rng.normal(0, 0.02, shape).astype(np.float32)
    fgp = np.clip(peak * 1.4 + rng.normal(0, 0.05, shape), 0, 1).astype(np.float32)
    return jnp.asarray(peak), jnp.asarray(fgp)


def _unfused(peak, fgp, pthr, fthr, radius, h0):
    fg = fgp >= fthr
    seeds = peak_nms(peak, pthr, radius) & fg
    dirs = steepest_dir_codes(peak, fg, self_sticky=seeds)
    idx = linear_index(peak.shape)
    v0 = jnp.where(fg & (dirs == 0),
                   jnp.where(seeds, idx + 1, -(idx + 1)), 0).astype(jnp.int32)
    v = chase_pass(v0, dirs, iters=h0, block=(8, 16), interpret=True)
    return dirs, v


# zero radius components (ADVICE r4): the dirs stencil still needs a
# 1-voxel margin beyond the chase halo — halo = h0 + max(2r, 1)
@pytest.mark.parametrize("radius", [(2, 2, 2), (1, 2, 2), (0, 2, 2), (1, 0, 2)])
def test_seed_chase_pass_matches_unfused(radius):
    peak, fgp = _fixture()
    pthr, fthr = 0.4, 0.35
    assert seed_pass_supported(peak.shape, radius)
    dirs_f, v_f = seed_chase_pass(peak, fgp, pthr, fthr, radius, h0=8,
                                  block=(8, 16), interpret=True)
    dirs_u, v_u = _unfused(peak, fgp, pthr, fthr, radius, 8)
    np.testing.assert_array_equal(np.asarray(dirs_f), np.asarray(dirs_u))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_u))


def test_seed_chase_pass_traced_thresholds():
    peak, fgp = _fixture(seed=3)
    f = jax.jit(lambda p, g, a, b: seed_chase_pass(
        p, g, a, b, (2, 2, 2), h0=8, block=(8, 16), interpret=True))
    d1, v1 = f(peak, fgp, jnp.float32(0.4), jnp.float32(0.35))
    d2, v2 = _unfused(peak, fgp, 0.4, 0.35, (2, 2, 2), 8)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_seed_chase_zero_radius_boundary():
    """Monotone z-ramp, no seeds in reach: a core voxel's 8-step chase ends
    exactly at the window edge, where the old halo (h0 + 2*0 = h0 for
    rz=0) truncated the ramp into a spurious in-window root (ADVICE r4).
    halo = h0 + max(2r, 1) restores bitwise equality."""
    shape = (32, 32, 128)
    zz = np.arange(shape[0], dtype=np.float32)[:, None, None]
    peak = jnp.asarray(np.broadcast_to(zz * 0.01, shape).copy())
    fgp = jnp.ones(shape, jnp.float32)
    radius = (0, 2, 2)
    pthr, fthr = 0.9, 0.5   # only the ramp top passes: no seeds in reach
    dirs_f, v_f = seed_chase_pass(peak, fgp, pthr, fthr, radius, h0=8,
                                  block=(8, 16), interpret=True)
    dirs_u, v_u = _unfused(peak, fgp, pthr, fthr, radius, 8)
    np.testing.assert_array_equal(np.asarray(dirs_f), np.asarray(dirs_u))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_u))


def test_seed_block_picker():
    assert seed_block((16, 32, 128), (2, 2, 2), 8) is not None
    assert seed_pass_supported((96, 512, 512), (1, 2, 2))
    assert not seed_pass_supported((16, 32, 100), (2, 2, 2))  # W not 128-mult
