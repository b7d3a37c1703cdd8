"""Peak NMS on volumes with known maxima (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from tpuseg.ops import peak_nms, seed_labels_from_peaks


def _gauss(shape, center, sigma=2.0):
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d2 = (zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2
    return np.exp(-d2 / (2 * sigma**2))


def test_two_isolated_peaks_found():
    vol = _gauss((16, 16, 16), (4, 4, 4)) + _gauss((16, 16, 16), (12, 12, 12))
    seeds = np.asarray(peak_nms(jnp.asarray(vol), threshold=0.5, radius=2))
    coords = np.argwhere(seeds)
    assert len(coords) == 2
    assert {tuple(c) for c in coords} == {(4, 4, 4), (12, 12, 12)}


def test_threshold_suppresses_weak_peak():
    vol = _gauss((16, 16, 16), (4, 4, 4)) + 0.3 * _gauss((16, 16, 16), (12, 12, 12))
    seeds = np.asarray(peak_nms(jnp.asarray(vol), threshold=0.5, radius=2))
    assert seeds.sum() == 1
    assert seeds[4, 4, 4]


def test_plateau_yields_single_seed_per_window():
    vol = np.zeros((8, 8, 8))
    vol[3:5, 3:5, 3:5] = 1.0  # 2^3 plateau, fits inside a radius-2 window
    seeds = np.asarray(peak_nms(jnp.asarray(vol), threshold=0.5, radius=2))
    assert seeds.sum() == 1


def test_nms_radius_merges_close_peaks():
    vol = _gauss((16, 16, 16), (8, 8, 6), sigma=1.5) + _gauss((16, 16, 16), (8, 8, 9), sigma=1.5)
    few = np.asarray(peak_nms(jnp.asarray(vol), threshold=0.3, radius=3)).sum()
    many = np.asarray(peak_nms(jnp.asarray(vol), threshold=0.3, radius=1)).sum()
    assert few <= many


def test_anisotropic_radius_preserves_z_close_peaks():
    """Two peaks 2 z-planes apart: an isotropic radius-2 window suppresses the
    weaker one (whole-instance loss on compressed-z stacks), a (1, 2, 2)
    footprint keeps both."""
    vol = np.zeros((16, 16, 16), np.float32)
    vol[7, 8, 8] = 1.0
    vol[9, 8, 8] = 0.9
    iso = np.asarray(peak_nms(jnp.asarray(vol), threshold=0.5, radius=2))
    assert iso.sum() == 1 and iso[7, 8, 8]
    aniso = np.asarray(peak_nms(jnp.asarray(vol), threshold=0.5, radius=(1, 2, 2)))
    assert aniso.sum() == 2 and aniso[7, 8, 8] and aniso[9, 8, 8]
    # ...while in-plane suppression is unchanged
    vol2 = np.zeros((16, 16, 16), np.float32)
    vol2[8, 7, 8] = 1.0
    vol2[8, 9, 8] = 0.9
    inplane = np.asarray(peak_nms(jnp.asarray(vol2), threshold=0.5, radius=(1, 2, 2)))
    assert inplane.sum() == 1 and inplane[8, 7, 8]


def test_radius3_normalization():
    from tpuseg.ops.peaks import radius3

    assert radius3(2) == (2, 2, 2)
    assert radius3((1, 2, 3)) == (1, 2, 3)
    assert radius3([1, 2, 3]) == (1, 2, 3)


def test_max_seed_count_per_axis():
    from tpuseg.ops.filter import max_seed_count

    assert max_seed_count((16, 16, 16), 2) == 6 * 6 * 6
    # per-axis cells: ceil(16/2) * ceil(16/3) * ceil(16/3)
    assert max_seed_count((16, 16, 16), (1, 2, 2)) == 8 * 6 * 6


def test_seed_labels_are_linear_indices_plus_one():
    vol = _gauss((8, 8, 8), (4, 4, 4))
    lab = np.asarray(seed_labels_from_peaks(jnp.asarray(vol), threshold=0.5, radius=1))
    assert lab[4, 4, 4] == 4 * 64 + 4 * 8 + 4 + 1
    assert (lab > 0).sum() == 1
