"""Pallas chase/flood kernels == XLA reference loops (ops/pallas_resolve.py).

Runs in Pallas interpret mode on the CPU test platform; the compiled TPU path
is exercised by bench/verify drives. Equality contracts:

* flood_resolve == watershed.flood_labels elementwise (same lockstep
  semantics, same (potential, index) tie-break, same iteration cap);
* chase_resolve resolves every fg voxel to its basin root's payload — the
  same labeling as _steepest_parent + _pointer_jump.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpuseg.ops.neighbors import NEIGHBORS_6, linear_index
from tpuseg.ops.pallas_resolve import (
    chase_resolve, flood_resolve, pallas_resolve_supported,
)
from tpuseg.ops.watershed import (
    _pointer_jump, _steepest_parent, flood_labels, steepest_dir_codes,
)
from tpuseg.ops.peaks import peak_nms

SHAPE = (16, 32, 128)


def _blob_maps(seed=0, shape=SHAPE):
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                             indexing="ij")
    peak = np.zeros(shape, np.float32)
    fg = np.zeros(shape, np.float32)
    for _ in range(6):
        c = [rng.uniform(4, s - 4) for s in shape]
        r = rng.uniform(3.0, 5.0)
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        peak = np.maximum(peak, np.exp(-0.5 * d2 / 2.0**2))
        fg = np.maximum(fg, 1 / (1 + np.exp(np.minimum((d2 / r**2 - 1) * 8, 60))))
    return jnp.asarray(fg), jnp.asarray(peak)


def test_supported_guard():
    assert pallas_resolve_supported(SHAPE)
    assert not pallas_resolve_supported((15, 32, 128))   # z not divisible
    assert not pallas_resolve_supported((16, 30, 128))   # y not divisible
    assert not pallas_resolve_supported((16, 32, 96))    # lanes not 128-mult


def test_auto_block_divisibility_and_budget():
    from tpuseg.ops.pallas_resolve import (
        _FLOOD_BLOCKS, _FLOOD_LIVE, auto_block,
    )

    # flagship shape: the biggest candidate divides and fits
    assert auto_block((96, 512, 512), 8, _FLOOD_BLOCKS,
                      live=_FLOOD_LIVE) == (32, 32)
    # D=40 rejects bz in {32, 16}: falls to (8, 16)
    assert auto_block((40, 512, 512), 8, _FLOOD_BLOCKS,
                      live=_FLOOD_LIVE) == (8, 16)
    # wide W: the VMEM estimate demotes to a smaller block than divisibility
    # alone would pick
    bz, by = auto_block((96, 512, 2048), 8, _FLOOD_BLOCKS, live=_FLOOD_LIVE)
    assert ((bz + 16) * (by + 16) * 2048 * 4 * _FLOOD_LIVE
            <= 100 * 1024 * 1024)
    assert (bz, by) != (32, 32)
    # nothing fits -> None, and the small-volume MSA-pinned adjustment makes
    # (16, 32, 2048) unfittable for flood (the measured in-while_loop OOM)
    assert auto_block((96, 512, 1 << 20), 8, _FLOOD_BLOCKS,
                      live=_FLOOD_LIVE) is None
    assert auto_block((16, 32, 2048), 8, _FLOOD_BLOCKS,
                      live=_FLOOD_LIVE) is None
    assert not pallas_resolve_supported((16, 32, 2048))


def test_unfittable_shape_raises_and_watershed_falls_back():
    import jax
    import jax.numpy as jnp

    from tpuseg.ops.watershed import watershed

    shape = (16, 32, 2048)  # flood-unfittable (MSA-pinned small volume)
    with pytest.raises(ValueError, match="no flood block fits"):
        flood_resolve(jnp.zeros(shape, jnp.int32), jnp.zeros(shape, bool),
                      jnp.zeros(shape, jnp.float32), 8)
    # resolve_impl="auto" must route such shapes to the XLA path, not crash
    pk = jax.random.uniform(jax.random.key(0), shape)
    lab = watershed(jnp.ones(shape) * 0.9, pk, peak_threshold=0.995,
                    resolve_impl="auto")
    assert int(lab.max()) > 0


@pytest.mark.parametrize("seed", [0, 1])
def test_flood_resolve_equals_xla_flood(seed):
    fg_prob, peak = _blob_maps(seed)
    fg = fg_prob >= 0.5
    seeds = peak_nms(peak, 0.5, 2) & fg
    idx = linear_index(SHAPE)
    seed_labels = jnp.where(seeds, idx + 1, 0).astype(jnp.int32)
    want = np.asarray(flood_labels(seed_labels, fg, fg_prob, 24))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flood_resolve(seed_labels, fg, fg_prob, 24))
    np.testing.assert_array_equal(got, want)


def test_flood_resolve_capped_matches_xla_cap():
    """Unconverged (capped) flood must run EXACTLY max_iters lockstep steps,
    including the remainder pass (max_iters not divisible by the pass size)."""
    fg_prob, peak = _blob_maps(3)
    fg = fg_prob >= 0.2                       # bigger fg -> longer wavefronts
    seeds = peak_nms(peak, 0.5, 2) & fg
    idx = linear_index(SHAPE)
    seed_labels = jnp.where(seeds, idx + 1, 0).astype(jnp.int32)
    for iters in (3, 5, 11):                  # all below convergence
        want = np.asarray(
            flood_labels(seed_labels, fg, fg_prob, iters, unroll_static=True))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flood_resolve(seed_labels, fg, fg_prob, iters))
        np.testing.assert_array_equal(got, want, err_msg=f"iters={iters}")


@pytest.mark.parametrize("seed", [0, 1])
def test_chase_resolve_equals_pointer_jump(seed):
    fg_prob, peak = _blob_maps(seed)
    fg = fg_prob >= 0.5
    seeds = peak_nms(peak, 0.5, 2) & fg
    idx = linear_index(SHAPE)

    parent = _steepest_parent(peak, fg, self_sticky=seeds)
    root = _pointer_jump(parent.ravel(), 16).reshape(SHAPE)
    want_signed = jnp.where(
        fg,
        jnp.where(seeds.ravel()[root.ravel()].reshape(SHAPE), root + 1,
                  -(root + 1)),
        0,
    )

    dirs = steepest_dir_codes(peak, fg, self_sticky=seeds)
    v0 = jnp.where(fg & (dirs == 0),
                   jnp.where(seeds, idx + 1, -(idx + 1)), 0).astype(jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(chase_resolve(v0, dirs, fg))
    np.testing.assert_array_equal(got, np.asarray(want_signed))


def test_dir_codes_match_parent_indices():
    """steepest_dir_codes picks the same winner as _steepest_parent."""
    fg_prob, peak = _blob_maps(2)
    fg = fg_prob >= 0.5
    seeds = peak_nms(peak, 0.5, 2) & fg
    parent = np.asarray(_steepest_parent(peak, fg, self_sticky=seeds))
    dirs = np.asarray(steepest_dir_codes(peak, fg, self_sticky=seeds))
    idx = np.arange(np.prod(SHAPE), dtype=np.int64).reshape(SHAPE)
    D, H, W = SHAPE
    offs = {0: 0}
    for c, (axis, off) in enumerate(NEIGHBORS_6):
        offs[c + 1] = off * (H * W if axis == 0 else (W if axis == 1 else 1))
    want_parent = idx + np.vectorize(offs.get)(dirs)
    np.testing.assert_array_equal(want_parent, parent.astype(np.int64))
