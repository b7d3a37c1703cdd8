"""Connected components vs scipy.ndimage.label oracle (SURVEY.md §4.1-4.2)."""

import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from tpuseg.ops import compact_relabel, connected_components


def _canon(lab):
    """Canonicalize labelings for comparison: same partition <=> same canon."""
    lab = np.asarray(lab)
    out = np.zeros_like(lab)
    next_id = 1
    for v in lab[lab > 0].ravel():
        pass  # replaced below by vectorized version
    # vectorized: map each label to the rank of its first occurrence
    flat = lab.ravel()
    first = {}
    canon = np.zeros_like(flat)
    for i, v in enumerate(flat):
        if v > 0:
            if v not in first:
                first[v] = next_id
                next_id += 1
            canon[i] = first[v]
    return canon.reshape(lab.shape)


def test_matches_scipy_on_random_masks(rng):
    for _ in range(3):
        mask = rng.random((12, 12, 12)) < 0.35
        ours = connected_components(jnp.asarray(mask))
        ref, _ = ndi.label(mask)  # default 6-connectivity structure
        assert np.array_equal(_canon(ours), _canon(ref))


def test_two_blocks():
    mask = np.zeros((10, 10, 10), bool)
    mask[1:4, 1:4, 1:4] = True
    mask[6:9, 6:9, 6:9] = True
    lab = np.asarray(connected_components(jnp.asarray(mask)))
    assert len(np.unique(lab[lab > 0])) == 2
    assert (lab[1:4, 1:4, 1:4] == lab[1, 1, 1]).all()
    assert lab[1, 1, 1] != lab[6, 6, 6]


def test_diagonal_not_connected():
    mask = np.zeros((4, 4, 4), bool)
    mask[0, 0, 0] = True
    mask[1, 1, 1] = True  # only diagonal contact -> separate under 6-conn
    lab = np.asarray(connected_components(jnp.asarray(mask)))
    assert lab[0, 0, 0] != lab[1, 1, 1]


def test_snake_long_component():
    # Long winding path exercises the pointer-jumping depth.
    mask = np.zeros((4, 16, 16), bool)
    for y in range(16):
        mask[0, y, :] = True if y % 2 == 0 else False
        if y % 2 == 1:
            mask[0, y, 0 if (y // 2) % 2 else 15] = True
    lab = np.asarray(connected_components(jnp.asarray(mask)))
    ref, nref = ndi.label(mask)
    assert len(np.unique(lab[lab > 0])) == nref


def test_compact_relabel_dense_and_order_preserving():
    lab = np.array([[[0, 5, 5], [900, 0, 17], [17, 900, 0]]], dtype=np.int32)
    out = np.asarray(compact_relabel(jnp.asarray(lab)))
    assert set(np.unique(out)) == {0, 1, 2, 3}
    assert out[0, 0, 1] == 1   # 5 -> 1
    assert out[0, 1, 2] == 2   # 17 -> 2
    assert out[0, 1, 0] == 3   # 900 -> 3
