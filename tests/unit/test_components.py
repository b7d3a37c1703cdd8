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


def test_label_components_and_connectivity_validator():
    """label_components splits equal-label voxels by connectivity;
    labels_are_connected validates the watershed invariant (ARCHITECTURE.md
    "Why there is no CC pass in the pipeline")."""
    import numpy as np

    from tpuseg.ops.components import label_components, labels_are_connected

    lab = np.zeros((4, 8, 8), np.int32)
    lab[1, 1:3, 1:3] = 5          # one connected instance
    lab[1, 5:7, 5:7] = 7          # another label...
    lab[3, 1:3, 1:3] = 7          # ...with a DISCONNECTED second piece
    comps = np.asarray(label_components(lab))
    # the two 7-pieces get different component roots
    assert comps[1, 5, 5] != comps[3, 1, 1]
    assert not labels_are_connected(lab)

    lab[2:4, 1:3, 1:3] = 0        # remove the disconnected piece
    assert labels_are_connected(lab)


def test_pipeline_output_instances_are_connected():
    """The fused pipeline's instances satisfy the connectivity invariant on a
    real (blob-map) run — the production consumer of the C13 validator."""
    import numpy as np

    from tpuseg.ops import size_filter_and_compact, watershed
    from tpuseg.ops.components import labels_are_connected

    rng = np.random.default_rng(3)
    shape = (24, 32, 32)
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                             indexing="ij")
    fg = np.zeros(shape, np.float32)
    pk = np.zeros(shape, np.float32)
    for _ in range(6):
        c = [rng.uniform(4, s - 4) for s in shape]
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        pk = np.maximum(pk, np.exp(-0.5 * d2 / 4.0).astype(np.float32))
        fg = np.maximum(fg, (d2 < 16).astype(np.float32) * 0.9)
    labels = np.asarray(size_filter_and_compact(
        watershed(fg, pk, flood_iters=24), 5))
    assert labels.max() >= 4
    assert labels_are_connected(labels)
