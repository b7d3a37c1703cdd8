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


# ---- z-scale (anisotropy) augmentation ----

from tpuseg.data.augment import zscale_patch


def _zpatch(d=32):
    img = jnp.zeros((d, 16, 16))
    # bright plane at z=24 (offset +8 from center 15.5)
    img = img.at[24].set(1.0)
    centers = jnp.array([[24.0, 8.0, 8.0]], jnp.float32)
    halfs = jnp.array([[4.0, 4.0, 4.0]], jnp.float32)
    valid = jnp.array([True])
    return img, centers, halfs, valid


def test_zscale_identity_at_scale_one():
    img, c, h, v = _zpatch()
    out, oc, oh, ov, zw = zscale_patch(jax.random.key(0), img, c, h, v,
                                       (1.0, 1.0))
    assert np.allclose(np.asarray(out), np.asarray(img))
    assert np.allclose(np.asarray(oc), np.asarray(c))
    assert np.allclose(np.asarray(oh), np.asarray(h))
    assert bool(ov[0])
    assert np.all(np.asarray(zw) == 1.0)


def test_zscale_squash_moves_content_and_annotations_together():
    img, c, h, v = _zpatch()
    out, oc, oh, _, _ = zscale_patch(jax.random.key(0), img, c, h, v,
                                     (0.5, 0.5))
    # annotation: 15.5 + (24 - 15.5) * 0.5 = 19.75; half_z: 4 -> 2
    assert np.isclose(float(oc[0, 0]), 19.75)
    assert np.isclose(float(oh[0, 0]), 2.0)
    assert np.allclose(np.asarray(oc[0, 1:]), [8.0, 8.0])
    # image content: brightest output plane sits at the transformed center
    zprofile = np.asarray(out).sum(axis=(1, 2))
    assert abs(int(zprofile.argmax()) - 19.75) <= 1.0
    # in-plane axes untouched: each plane is constant-per-plane scaling of
    # the source's single-hot plane, so xy structure is preserved
    assert np.allclose(np.asarray(out[19]), np.asarray(out[19])[0, 0])


def test_zscale_jits_and_is_deterministic():
    img, c, h, v = _zpatch()
    f = jax.jit(lambda k: zscale_patch(k, img, c, h, v, (0.3, 1.0)))
    o1 = f(jax.random.key(7))
    o2 = f(jax.random.key(7))
    for a, b in zip(o1, o2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    o3 = f(jax.random.key(8))
    assert not np.allclose(np.asarray(o1[0]), np.asarray(o3[0]))


def test_zscale_squash_zero_weights_replicated_planes():
    # s = 0.5 on d=32: output planes whose source z_in = c + (z-c)/s leaves
    # [0, 31] must carry z_weight 0 — those planes edge-replicate the face
    # plane and must not contribute to the fg loss (ADVICE r3)
    img, c, h, v = _zpatch()
    _, _, _, _, zw = zscale_patch(jax.random.key(0), img, c, h, v, (0.5, 0.5))
    zw = np.asarray(zw)
    d, cc = 32, 15.5
    z_in = cc + (np.arange(d) - cc) / 0.5
    expect = ((z_in >= 0) & (z_in <= d - 1)).astype(np.float32)
    assert np.array_equal(zw, expect)
    assert zw.sum() < d  # some planes actually out of range


def test_zscale_stretch_invalidates_offpatch_centers():
    # s = 2 moves the center at z=24 to 15.5 + 8.5*2 = 32.5 > 31 -> invalid
    img, c, h, v = _zpatch()
    _, oc, _, ov, zw = zscale_patch(jax.random.key(0), img, c, h, v,
                                    (2.0, 2.0))
    assert float(oc[0, 0]) > 31.0
    assert not bool(ov[0])
    # stretch: every output plane samples inside the patch
    assert np.all(np.asarray(zw) == 1.0)
