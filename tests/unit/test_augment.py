"""Augmentation invariants (SURVEY.md C4)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.data import augment_patch


def _patch():
    rng = np.random.default_rng(0)
    img = rng.random((8, 8, 8)).astype(np.float32)
    tgt = {"peak": rng.random((8, 8, 8)).astype(np.float32)}
    return jnp.asarray(img), {k: jnp.asarray(v) for k, v in tgt.items()}


def test_spatial_consistency_image_and_targets():
    img, tgt = _patch()
    # encode position into both image and target, check they transform together
    marker = jnp.zeros((8, 8, 8)).at[1, 2, 3].set(1.0)
    out_img, out_tgt = augment_patch(jax.random.key(3), marker, {"m": marker},
                                     intensity=False)
    assert np.array_equal(np.asarray(out_img), np.asarray(out_tgt["m"]))


def test_no_intensity_is_permutation():
    img, tgt = _patch()
    out_img, _ = augment_patch(jax.random.key(1), img, tgt, intensity=False)
    assert np.allclose(np.sort(np.asarray(out_img).ravel()),
                       np.sort(np.asarray(img).ravel()))


def test_deterministic_per_key():
    img, tgt = _patch()
    a, _ = augment_patch(jax.random.key(7), img, tgt)
    b, _ = augment_patch(jax.random.key(7), img, tgt)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_jittable():
    img, tgt = _patch()
    f = jax.jit(lambda k: augment_patch(k, img, tgt))
    out, _ = f(jax.random.key(0))
    assert out.shape == img.shape
    assert not np.isnan(np.asarray(out)).any()


def test_intensity_stays_in_unit_range():
    img, tgt = _patch()
    for s in range(5):
        out, _ = augment_patch(jax.random.key(s), img, tgt, intensity=True)
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 1.0
