"""Property-style invariants of the watershed pipeline across random fields.

These hold for ANY input (not just blob fixtures), so they guard the
algebraic contracts the scale-out paths rely on:

  P1  labels are zero exactly off the thresholded foreground, except voxels
      the capped flood could not reach (those are zero ON fg);
  P2  every nonzero label value is the id of an actual NMS seed, and the
      seed voxel itself carries its own label (basin roots stay home);
  P3  every labeled instance is 6-connected (ARCHITECTURE.md §3b);
  P4  dense and index label spaces agree after compaction;
  P5  ascent and flood methods agree on which voxels are labeled by seeds
      reachable within the caps (weaker: both label subsets of fg).
"""

import numpy as np
import pytest

from tpuseg.ops import size_filter_and_compact, watershed
from tpuseg.ops.components import labels_are_connected
from tpuseg.ops.filter import max_seed_count, size_filter_and_compact_dense
from tpuseg.ops.neighbors import linear_index
from tpuseg.ops.peaks import peak_nms

SHAPE = (20, 24, 28)


def _random_maps(seed):
    rng = np.random.default_rng(seed)
    # smooth-ish random fields: random noise blurred by separable box passes
    def smooth(a, k=2):
        for axis in range(3):
            for _ in range(k):
                a = (a + np.roll(a, 1, axis) + np.roll(a, -1, axis)) / 3.0
        return a

    fg = smooth(rng.random(SHAPE, dtype=np.float32)).astype(np.float32)
    pk = smooth(rng.random(SHAPE, dtype=np.float32)).astype(np.float32)
    return fg, pk


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_watershed_invariants(seed):
    fg_prob, pk_prob = _random_maps(seed)
    fg = fg_prob >= 0.5
    seeds = np.asarray(peak_nms(pk_prob, 0.5, 2)) & fg
    idx = np.asarray(linear_index(SHAPE))

    labels = np.asarray(watershed(fg_prob, pk_prob, flood_iters=64))

    # P1: background voxels never labeled
    assert (labels[~fg] == 0).all()

    # P2: label values are seed ids; seeds keep their own label
    seed_ids = set((idx[seeds] + 1).tolist())
    got_ids = set(np.unique(labels[labels > 0]).tolist())
    assert got_ids <= seed_ids, got_ids - seed_ids
    # converged runs (caps far exceed any chain in this volume): every seed
    # is the root of its own basin and carries its own id
    own = labels[seeds]
    np.testing.assert_array_equal(own, idx[seeds] + 1)

    # P3: connectivity invariant
    assert labels_are_connected(labels)

    # P4: dense == index after compaction
    want = np.asarray(size_filter_and_compact(labels, 5))
    dense = np.asarray(size_filter_and_compact_dense(
        watershed(fg_prob, pk_prob, flood_iters=64, label_space="dense"),
        5, max_seed_count(SHAPE, 2)))
    np.testing.assert_array_equal(dense, want)

    # P5: flood method also labels only fg, only with seed ids, connected
    fl = np.asarray(watershed(fg_prob, pk_prob, flood_iters=64, method="flood"))
    assert (fl[~fg] == 0).all()
    assert set(np.unique(fl[fl > 0]).tolist()) <= seed_ids
    assert labels_are_connected(fl)
