"""z-decomposed 3D conv == XLA native 3D conv (models/conv3d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core import ModelConfig
from tpuseg.models import build_model, init_variables
from tpuseg.models.conv3d import conv3d_zdecomp, conv3d_zpack


@pytest.mark.parametrize("k,s,pad", [
    ((3, 3, 3), (1, 1, 1), "SAME"),
    ((2, 2, 2), (2, 2, 2), "VALID"),
    ((2, 2, 2), (1, 1, 1), "SAME"),
    ((1, 1, 1), (1, 1, 1), "SAME"),
])
def test_zdecomp_matches_lax_conv(k, s, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 12, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((*k, 5, 7)) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, window_strides=s, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    for fn in (conv3d_zdecomp, conv3d_zpack):
        got = fn(x, w, s, pad)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_model_outputs_identical_across_impls():
    base = dict(features=(4, 8), num_groups=2, head_features=4,
                compute_dtype="float32")
    m_z = build_model(ModelConfig(conv_impl="zdecomp", **base))
    m_n = build_model(ModelConfig(conv_impl="native", **base))
    v = init_variables(m_z, jax.random.key(0), patch_shape=(8, 8, 8))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 1))
    a = m_z.apply(v, x)
    b = m_n.apply(v, x)  # same param tree works for both impls
    for key in ("fg_logits", "peak_logits"):
        np.testing.assert_allclose(np.asarray(a[key]), np.asarray(b[key]),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 8, 10, 12, 5), (1, 7, 9, 11, 3)])
def test_s2patch_matches_lax_conv(shape):
    """k=s=2 patch-matmul schedule == XLA stride-2 SAME conv, even+odd dims."""
    from tpuseg.models.conv3d import conv3d_s2patch

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 2, 2, shape[-1], 6)) * 0.1,
                    jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2, 2), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv3d_s2patch(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_upconv2x_parity_matches_materialized():
    """Parity-decomposed upsample+conv == upsample2x then SAME 2x2x2 conv."""
    from tpuseg.models.blocks import upsample2x
    from tpuseg.models.conv3d import upconv2x_parity

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 5, 6, 7, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 2, 2, 4, 3)) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        upsample2x(x), w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = upconv2x_parity(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_model_auto_impl_matches_zdecomp():
    """impl="auto" (s2patch downs, parity up_convs, zpack/zdecomp 3x3x3)
    computes the same function as a uniform zdecomp model, with the SAME
    parameter tree (checkpoint compatibility across schedules)."""
    base = dict(features=(4, 8), num_groups=2, head_features=4,
                compute_dtype="float32")
    m_a = build_model(ModelConfig(conv_impl="auto", **base))
    m_z = build_model(ModelConfig(conv_impl="zdecomp", **base))
    v = init_variables(m_z, jax.random.key(0), patch_shape=(8, 8, 8))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 1))
    a = m_a.apply(v, x)
    b = m_z.apply(v, x)
    for key in ("fg_logits", "peak_logits"):
        np.testing.assert_allclose(np.asarray(a[key]), np.asarray(b[key]),
                                   rtol=1e-4, atol=1e-5)
