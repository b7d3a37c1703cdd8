"""Saddle-ratio agglomeration (ops/merge.py) on hand-built cases
(SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from tpuseg.ops import watershed
from tpuseg.ops.merge import (apply_merge_table, saddle_merge,
                              saddle_merge_table)


def _gauss(shape, c, sigma):
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    return np.exp(-((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
                  / (2 * sigma ** 2)).astype(np.float32)


def test_plateau_split_merges_separated_does_not():
    """One flat-topped blob falsely split by two seeds MERGES (saddle ≈
    peak); two distinct blobs with a deep valley DO NOT."""
    shape = (16, 16, 48)
    # blob A: flat-ish top -> duplicate peaks at x=8 and x=13 (saddle high)
    a = np.maximum(_gauss(shape, (8, 8, 8), 4.0), _gauss(shape, (8, 8, 13), 4.0))
    # blob B: far away at x=36 (saddle to A ~ 0)
    b = _gauss(shape, (8, 8, 36), 3.0)
    peak = np.maximum(a, b)
    fg = peak > 0.3
    lab = watershed(jnp.asarray(fg.astype(np.float32)), jnp.asarray(peak),
                    peak_threshold=0.5, fg_threshold=0.5, resolve_impl="xla")
    lab = np.asarray(lab)
    ids = np.unique(lab[lab > 0])
    assert len(ids) == 3  # A split in two + B

    merged = np.asarray(saddle_merge(jnp.asarray(lab), jnp.asarray(peak),
                                     ratio=0.6, max_pairs=64))
    mids = np.unique(merged[merged > 0])
    assert len(mids) == 2  # A's halves merged; B intact
    # A's region is one label, B another
    la = merged[8, 8, 8]
    assert merged[8, 8, 13] == la
    assert merged[8, 8, 36] != la
    # merged label is the MIN of the merged pair (root convention)
    split_ids = {lab[8, 8, 8], lab[8, 8, 13]}
    assert la == min(split_ids)


def test_touching_pair_with_valley_survives():
    """Two gaussians close enough to touch but with a real valley between
    their peaks stay separate at a ratio above the valley height."""
    shape = (16, 16, 32)
    peak = np.maximum(_gauss(shape, (8, 8, 10), 2.5),
                      _gauss(shape, (8, 8, 19), 2.5))
    fg = peak > 0.1
    lab = np.asarray(watershed(jnp.asarray(fg.astype(np.float32)),
                               jnp.asarray(peak), peak_threshold=0.5,
                               fg_threshold=0.1, resolve_impl="xla"))
    assert len(np.unique(lab[lab > 0])) == 2
    # valley at x~14.5: exp(-0.5*(4.5/2.5)^2) ~ 0.2 of peak -> ratio .6 keeps
    merged = np.asarray(saddle_merge(jnp.asarray(lab), jnp.asarray(peak),
                                     ratio=0.6, max_pairs=64))
    assert len(np.unique(merged[merged > 0])) == 2
    # a ratio BELOW the valley ratio merges them (sanity of the criterion)
    merged2 = np.asarray(saddle_merge(jnp.asarray(lab), jnp.asarray(peak),
                                      ratio=0.1, max_pairs=64))
    assert len(np.unique(merged2[merged2 > 0])) == 1


def test_transitive_chain_merges():
    """A-B and B-C passing edges merge all three to the min label."""
    shape = (8, 8, 40)
    peak = np.maximum.reduce([
        _gauss(shape, (4, 4, 8), 3.5),
        _gauss(shape, (4, 4, 15), 3.5),
        _gauss(shape, (4, 4, 22), 3.5),
    ])
    fg = peak > 0.3
    lab = np.asarray(watershed(jnp.asarray(fg.astype(np.float32)),
                               jnp.asarray(peak), peak_threshold=0.5,
                               fg_threshold=0.5, resolve_impl="xla"))
    ids = np.unique(lab[lab > 0])
    assert len(ids) == 3
    merged = np.asarray(saddle_merge(jnp.asarray(lab), jnp.asarray(peak),
                                     ratio=0.5, max_pairs=64))
    mids = np.unique(merged[merged > 0])
    assert len(mids) == 1 and mids[0] == ids.min()


def test_apply_table_passthrough():
    lab = jnp.asarray(np.array([[[0, 5, 7, 9]]], np.int32))
    keys = jnp.asarray(np.array([5, 7] + [2**31 - 1] * 6, np.int32))
    roots = jnp.asarray(np.array([5, 5] + [2**31 - 1] * 6, np.int32))
    out = np.asarray(apply_merge_table(lab, keys, roots))
    np.testing.assert_array_equal(out, [[[0, 5, 5, 9]]])


def test_ratio_zero_edges_all_pass_but_table_identity_when_no_contact():
    """Isolated instances produce no edges: table is all-SENT, labels
    unchanged even at ratio 0."""
    shape = (8, 8, 32)
    peak = np.maximum(_gauss(shape, (4, 4, 6), 2.0),
                      _gauss(shape, (4, 4, 26), 2.0))
    fg = peak > 0.5  # tight masks, no contact
    lab = np.asarray(watershed(jnp.asarray(fg.astype(np.float32)),
                               jnp.asarray(peak), peak_threshold=0.6,
                               fg_threshold=0.5, resolve_impl="xla"))
    assert len(np.unique(lab[lab > 0])) == 2
    merged = np.asarray(saddle_merge(jnp.asarray(lab), jnp.asarray(peak),
                                     ratio=0.0, max_pairs=64))
    np.testing.assert_array_equal(merged, lab)
