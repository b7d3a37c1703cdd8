"""Training conv kernel (ops/pallas_convtrain.py) == lax conv + autodiff —
values and BOTH gradients, including across the sample-pair lane packing
(SURVEY.md §4.1; real-chip bf16 parity rides the train-step drive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.ops.pallas_convtrain import (conv3x3_p2, convtrain_supported,
                                         flat_conv3x3, flip_w, pack2_w,
                                         unpack2_w, xla_conv3x3)


def _mk(n, d, h, w, ci, seed=0):
    kx, kw = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, d, h, w, ci), jnp.float32)
    wt = jax.random.normal(kw, (3, 3, 3, ci, 32), jnp.float32) * 0.2
    return x, wt


def test_pack_roundtrip():
    x, _ = _mk(4, 6, 16, 64, 3)
    np.testing.assert_array_equal(
        np.asarray(unpack2_w(pack2_w(x), 4, 64)), np.asarray(x))
    x2, _ = _mk(2, 5, 8, 128, 7, seed=1)
    np.testing.assert_array_equal(
        np.asarray(unpack2_w(pack2_w(x2), 2, 128)), np.asarray(x2))


@pytest.mark.parametrize("n,w,ci", [(4, 64, 32), (2, 64, 64), (2, 128, 16),
                                    (4, 64, 1)])
def test_forward_matches_lax(n, w, ci):
    x, wt = _mk(n, 6, 16, w, ci)
    want = np.asarray(xla_conv3x3(x, wt, dtype=jnp.float32))
    got_flat = flat_conv3x3(pack2_w(x), wt, valid_w=w, interpret=True,
                            compute_dtype="float32")
    got = np.asarray(unpack2_w(got_flat, n, w))
    # f32 reassociation only (the kernel folds dy taps in a different order)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pair_boundary_independence():
    """Each sample's output must ignore its lane neighbor entirely: zeroing
    sample b must not change sample a's conv."""
    x, wt = _mk(2, 4, 8, 64, 8, seed=3)
    both = unpack2_w(flat_conv3x3(pack2_w(x), wt, valid_w=64, interpret=True,
                                  compute_dtype="float32"), 2, 64)
    x_only_a = x.at[1].set(0.0)
    alone = unpack2_w(flat_conv3x3(pack2_w(x_only_a), wt, valid_w=64,
                                   interpret=True, compute_dtype="float32"),
                      2, 64)
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(alone[0]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n,w,ci", [(4, 64, 32), (2, 64, 64)])
def test_gradients_match_lax(n, w, ci):
    x, wt = _mk(n, 6, 16, w, ci, seed=5)
    r = jax.random.normal(jax.random.key(9), (n, 6, 16, w, 32), jnp.float32)
    r_flat = pack2_w(r)

    def loss_ref(x_, w_):
        return jnp.sum(xla_conv3x3(x_, w_, dtype=jnp.float32) * r)

    def loss_pal(x_, w_):
        # interpret mode: run the kernel in f32 via flat_conv3x3 + manual vjp
        # structure is exercised through conv3x3_p2's fwd/bwd pair below
        y = flat_conv3x3(pack2_w(x_), w_, valid_w=w, interpret=True,
                         compute_dtype="float32")
        return jnp.sum(y * r_flat)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, wt)

    # the custom_vjp path (bf16 kernels) checked structurally in f32 via the
    # hand bwd pieces: dx = conv(dy, flip_w), dw = _dw_taps
    from tpuseg.ops.pallas_convtrain import _dw_taps

    dy = r_flat
    dx_flat = flat_conv3x3(dy, flip_w(wt), valid_w=w, interpret=True,
                           compute_dtype="float32")
    gx = np.asarray(unpack2_w(dx_flat[:, :, :ci], n, w))
    gw = np.asarray(_dw_taps(pack2_w(x), dy, ci, w))
    np.testing.assert_allclose(gx, np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw, np.asarray(gw_ref), rtol=1e-3, atol=1e-3)


def test_custom_vjp_wires_the_same_pieces():
    """conv3x3_p2's vjp == the hand composition above (bf16 end to end,
    interpret mode)."""
    x, wt = _mk(2, 4, 8, 64, 16, seed=7)
    xb = pack2_w(x).astype(jnp.bfloat16)

    def loss(x_, w_):
        return jnp.sum(conv3x3_p2(x_, w_, 64, True).astype(jnp.float32))

    gx, gw = jax.grad(loss, argnums=(0, 1))(xb, wt)
    assert gx.shape == xb.shape and gx.dtype == xb.dtype
    assert gw.shape == wt.shape and gw.dtype == wt.dtype

    def loss_ref(x_, w_):
        return jnp.sum(xla_conv3x3(x_, w_).astype(jnp.float32))

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(
        x.astype(jnp.bfloat16), wt)
    gxr = np.asarray(pack2_w(gx_ref.astype(jnp.float32)))
    close = np.isclose(np.asarray(gx, np.float32), gxr,
                       rtol=0.05, atol=0.05)
    assert close.mean() > 0.98, close.mean()
    np.testing.assert_allclose(np.asarray(gw, np.float32),
                               np.asarray(gw_ref, np.float32),
                               rtol=0.05, atol=0.5)


def test_supported_predicate():
    assert convtrain_supported(8, (64, 64, 64), 32, 32)
    assert convtrain_supported(2, (64, 64, 128), 64, 32)
    assert not convtrain_supported(7, (64, 64, 64), 32, 32)   # odd batch
    assert not convtrain_supported(8, (64, 64, 96), 32, 32)   # W not 64/128
    assert not convtrain_supported(8, (64, 64, 64), 32, 64)   # co != 32
