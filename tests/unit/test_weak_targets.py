"""Weak-target synthesis on hand-built annotations (SURVEY.md C5, §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.data import make_weak_targets


def _targets(centers, halfs, valid, shape=(16, 16, 16), **kw):
    return {
        k: np.asarray(v)
        for k, v in make_weak_targets(
            jnp.asarray(centers, jnp.float32),
            jnp.asarray(halfs, jnp.float32),
            jnp.asarray(valid),
            shape,
            **kw,
        ).items()
    }


def test_peak_is_one_at_center_and_decays():
    t = _targets([[8, 8, 8]], [[4, 4, 4]], [True], peak_sigma=2.0)
    assert t["peak"][8, 8, 8] == pytest.approx(1.0)
    assert t["peak"][8, 8, 12] == pytest.approx(np.exp(-0.5 * 16 / 4), rel=1e-5)
    assert t["peak"][0, 0, 0] < 1e-3


def test_fg_inner_outer_and_ignore_ring():
    t = _targets([[8, 8, 8]], [[4, 4, 4]], [True], margin=2.0)
    assert t["fg"][8, 8, 8] == 1.0           # center: inside eroded box
    assert t["fg"][8, 8, 10] == 1.0          # |dx|=2 <= 4-2
    assert t["fg"][8, 8, 13] == 0.0          # |dx|=5: in ring
    assert t["fg_weight"][8, 8, 13] == 0.0   # ... which is ignored
    assert t["fg"][8, 8, 15] == 0.0          # |dx|=7 > 4+2: certain bg
    assert t["fg_weight"][8, 8, 15] == 1.0


def test_invalid_instances_ignored():
    t = _targets(
        [[8, 8, 8], [2, 2, 2]],
        [[4, 4, 4], [4, 4, 4]],
        [True, False],
    )
    assert t["peak"][2, 2, 2] < 0.2   # only distance-tail from the valid one
    assert t["fg"][2, 2, 2] == 0.0


def test_two_instances_max_combine():
    t = _targets(
        [[4, 8, 8], [12, 8, 8]],
        [[3, 3, 3], [3, 3, 3]],
        [True, True],
        peak_sigma=2.0,
    )
    assert t["peak"][4, 8, 8] == pytest.approx(1.0)
    assert t["peak"][12, 8, 8] == pytest.approx(1.0)
    assert t["fg"][4, 8, 8] == 1.0 and t["fg"][12, 8, 8] == 1.0


def test_aniso_sigma_matches_iso_for_isotropic_boxes():
    centers = jnp.array([[8.0, 8.0, 8.0]], jnp.float32)
    halfs = jnp.array([[4.0, 4.0, 4.0]], jnp.float32)
    valid = jnp.array([True])
    iso = make_weak_targets(centers, halfs, valid, (16, 16, 16),
                            peak_sigma=2.5)
    ani = make_weak_targets(centers, halfs, valid, (16, 16, 16),
                            peak_sigma=2.5, aniso_sigma=True)
    # aspect == 1 for an isotropic box: identical gaussian
    assert np.allclose(np.asarray(iso["peak"]), np.asarray(ani["peak"]),
                       atol=1e-6)
    assert np.array_equal(np.asarray(iso["fg"]), np.asarray(ani["fg"]))


def test_aniso_sigma_flattens_peak_with_box():
    centers = jnp.array([[8.0, 8.0, 8.0]], jnp.float32)
    halfs = jnp.array([[2.0, 6.0, 6.0]], jnp.float32)  # z-compressed box
    valid = jnp.array([True])
    t = make_weak_targets(centers, halfs, valid, (16, 16, 16),
                          peak_sigma=3.0, aniso_sigma=True)
    peak = np.asarray(t["peak"])
    assert np.isclose(peak[8, 8, 8], 1.0)
    # same offset decays faster along the compressed axis
    assert peak[11, 8, 8] < peak[8, 11, 8]
