"""Regression: global_compact_labels under per-shard table-cap overflow
(ADVICE r2, reconcile.py). The last retained entry's count must be its TRUE
run length — not absorb the truncated runs' voxels — so the global min_size
filter cannot resurrect a too-small instance just because the shard
overflowed its label cap."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tpuseg.parallel.reconcile import global_compact_labels


def test_overflow_does_not_inflate_last_entry_count():
    mesh = Mesh(np.array(jax.devices()[:2]), ("z",))
    cap = 2
    # shard 0 has 4 distinct ids (> cap): id 1 x6, id 2 x1, id 3 x5, id 4 x4.
    # The table keeps the two smallest ids {1, 2}; id 2's true size is 1.
    # Before the fix, id 2's count absorbed the truncated runs (10 voxels)
    # and survived min_size=3; it must be dropped.
    shard0 = np.array([1] * 6 + [2] * 1 + [3] * 5 + [4] * 4, np.int32)
    shard1 = np.zeros(16, np.int32)
    labels = jnp.asarray(np.stack([shard0, shard1]))

    fn = shard_map(
        lambda l: global_compact_labels(l, "z", cap, min_size=3),
        mesh=mesh, in_specs=P("z"), out_specs=P("z"), check_rep=False,
    )
    out = np.asarray(jax.jit(fn)(labels))
    # id 1 (size 6) -> dense rank 1; id 2 (size 1) dropped by the size
    # filter; ids 3, 4 overflowed out of the table -> renamed to 0.
    expected0 = np.array([1] * 6 + [0] * 10, np.int32)
    np.testing.assert_array_equal(out[0], expected0)
    np.testing.assert_array_equal(out[1], np.zeros(16, np.int32))
