"""Parity tests for the fused Mosaic ConvBlock (ops/pallas_convblock.py).

Runs in Pallas interpret mode on the CPU test platform; the compiled TPU path
is exercised by the flagship bench (BENCH detail) and by
benchmarks/conv_schedule_bench.py. In float32 both the kernel and the XLA
reference accumulate in f32 with the same two rounding points, so parity is
tight (reassociation only); the bf16 case uses the production tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tpuseg.ops.pallas_convblock import (
    fold_bn_affine,
    fused_convblock,
    reference_convblock,
)


def _mats(rng, ci, co=32):
    w1 = rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((3, 3, 3, co, co)).astype(np.float32) * 0.2
    s1 = (rng.standard_normal(co) * 0.3 + 1.0).astype(np.float32)
    b1 = (rng.standard_normal(co) * 0.1).astype(np.float32)
    s2 = (rng.standard_normal(co) * 0.3 + 1.0).astype(np.float32)
    b2 = (rng.standard_normal(co) * 0.1).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (w1, s1, b1, w2, s2, b2))


def _check(shape, ci, dtype, seed=0, **kw):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((*shape, ci)), jnp.float32)
    w1, s1, b1, w2, s2, b2 = _mats(rng, ci)
    got = fused_convblock(x, w1, s1, b1, w2, s2, b2, interpret=True,
                          compute_dtype=dtype, **kw)
    want = reference_convblock(x, w1, s1, b1, w2, s2, b2, compute_dtype=dtype)
    assert got.shape == want.shape and got.dtype == want.dtype
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    if dtype == "float32":
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)
    else:  # bf16: reassociation differences of one ulp
        close = np.abs(g - w) <= 0.05 * np.abs(w) + 0.05
        assert close.mean() > 0.999, close.mean()


def test_parity_f32_ci32():
    _check((6, 16, 40), ci=32, dtype="float32")


def test_parity_f32_ci1():
    # enc0 shape: single input channel
    _check((5, 8, 24), ci=1, dtype="float32")


def test_parity_f32_ci64():
    # decoder block shape: post-concat 64 input channels
    _check((4, 8, 24), ci=64, dtype="float32")


def test_parity_bf16():
    _check((6, 16, 40), ci=32, dtype="bfloat16")


def test_parity_h_split_halo():
    # two h grid rows: the inter-split conv halo must be re-read exactly
    _check((4, 16, 24), ci=32, dtype="float32", h_splits=2)


def test_parity_single_plane():
    # D=1: both SAME z taps fall outside the volume
    _check((1, 8, 24), ci=32, dtype="float32")


def test_parity_wide_w_non128():
    # W > 128 and not a multiple of 128: lane padding + mask
    _check((3, 8, 150), ci=32, dtype="float32")


@pytest.mark.parametrize("eps", [1e-5, 1e-3])
def test_fold_bn_affine_matches_flax_eval(eps):
    rng = np.random.default_rng(3)
    c = 32
    bn = {
        "mean": rng.standard_normal(c).astype(np.float32),
        "var": (rng.random(c) + 0.1).astype(np.float32),
        "scale": rng.standard_normal(c).astype(np.float32),
        "bias": rng.standard_normal(c).astype(np.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, 4, 4, c)), jnp.float32)
    mod = nn.BatchNorm(use_running_average=True, epsilon=eps,
                       dtype=jnp.float32)
    want = mod.apply(
        {
            "params": {"scale": jnp.asarray(bn["scale"]),
                       "bias": jnp.asarray(bn["bias"])},
            "batch_stats": {"mean": jnp.asarray(bn["mean"]),
                            "var": jnp.asarray(bn["var"])},
        },
        x,
    )
    s, b = fold_bn_affine(bn, eps=eps)
    np.testing.assert_allclose(np.asarray(x * s + b), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pad_flat_matches_4d_pad():
    """pad_flat on the flat layout == 4-D SAME pad + row flatten, bitwise."""
    import numpy as np

    from tpuseg.ops.pallas_convblock import pad_flat

    rng = np.random.default_rng(0)
    D, C, H, wp = 3, 4, 8, 128
    y4 = rng.standard_normal((D, C, H, wp)).astype(np.float32)
    flat = jnp.asarray(y4.reshape(D, C, H * wp))
    got = np.asarray(pad_flat(flat, wp))
    want = np.pad(y4, ((1, 3), (0, 0), (2, 2), (0, 0))).reshape(
        D + 4, C, (H + 4) * wp)
    np.testing.assert_array_equal(got, want)


def test_flat_chain_matches_4d_chain():
    """Two blocks chained through flat_in/flat_out + pad_flat must equal the
    4-D keep_wpad/valid_w route bitwise (same kernel, same input bits)."""
    import numpy as np

    from tpuseg.ops.pallas_convblock import (CO, WPAD, fused_convblock_chw,
                                             pad_flat)

    rng = np.random.default_rng(1)
    D, ci, H, W = 6, 32, 16, 96
    wp = -(-(W + 2 * WPAD) // 128) * 128
    x = jnp.asarray(rng.standard_normal((D, ci, H, W)) * 0.3, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, ci, CO)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, CO, CO)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (CO,)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.1, 0.1, (CO,)), jnp.float32)
    kw = dict(compute_dtype="bfloat16", interpret=True)

    # 4-D route
    y1 = fused_convblock_chw(x, w1, s, b, w2, s, b, keep_wpad=True, **kw)
    y2 = fused_convblock_chw(y1, w2, s, b, w2, s, b, valid_w=W,
                             keep_wpad=True, **kw)

    # flat route
    f1 = fused_convblock_chw(x, w1, s, b, w2, s, b, flat_out=True, **kw)
    f2 = fused_convblock_chw(pad_flat(f1, wp), w2, s, b, w2, s, b,
                             flat_in=(H, wp, W), flat_out=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(y1, np.float32), np.asarray(f1.reshape(D, CO, H, wp),
                                               np.float32))
    np.testing.assert_array_equal(
        np.asarray(y2, np.float32), np.asarray(f2.reshape(D, CO, H, wp),
                                               np.float32))
