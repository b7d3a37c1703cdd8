"""Watershed on tiny volumes with hand-computed labelings (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from tpuseg.ops import ascent_labels, flood_labels, size_filter, watershed


def _two_blob_maps(shape=(16, 16, 16), c1=(5, 5, 5), c2=(5, 5, 11), sigma=2.5):
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    g1 = np.exp(-((zz - c1[0]) ** 2 + (yy - c1[1]) ** 2 + (xx - c1[2]) ** 2) / (2 * sigma**2))
    g2 = np.exp(-((zz - c2[0]) ** 2 + (yy - c2[1]) ** 2 + (xx - c2[2]) ** 2) / (2 * sigma**2))
    peak = np.maximum(g1, g2)
    fg = (g1 + g2) > 0.25
    return peak, fg, c1, c2


def test_watershed_splits_touching_blobs():
    peak, fg, c1, c2 = _two_blob_maps()
    lab = np.asarray(
        watershed(jnp.asarray(fg.astype(np.float32)), jnp.asarray(peak),
                  peak_threshold=0.5, fg_threshold=0.5)
    )
    l1, l2 = lab[c1], lab[c2]
    assert l1 > 0 and l2 > 0 and l1 != l2
    assert len(np.unique(lab[lab > 0])) == 2
    # every fg voxel got a label (absorption flood worked)
    assert (lab[fg] > 0).all()
    # boundary between instances falls at the valley plane x=8
    assert (lab[:, :, :8][fg[:, :, :8]] == l1).all()
    assert (lab[:, :, 9:][fg[:, :, 9:]] == l2).all()


def test_flood_and_ascent_agree_on_separated_blobs():
    peak, fg, c1, c2 = _two_blob_maps(c1=(4, 4, 4), c2=(11, 11, 11))
    a = np.asarray(watershed(jnp.asarray(fg.astype(np.float32)), jnp.asarray(peak), method="ascent"))
    f = np.asarray(watershed(jnp.asarray(fg.astype(np.float32)), jnp.asarray(peak), method="flood"))
    # same partition (labels are identical because both use root linear indices)
    assert np.array_equal(a > 0, f > 0)
    assert np.array_equal(a, f)


def test_ascent_seed_sticky_roots():
    peak, fg, c1, c2 = _two_blob_maps()
    seeds = np.zeros_like(fg)
    seeds[c1] = True
    seeds[c2] = True
    lab = np.asarray(ascent_labels(jnp.asarray(peak), jnp.asarray(fg), jnp.asarray(seeds)))
    def lin(c):
        return (c[0] * 16 + c[1]) * 16 + c[2] + 1
    assert lab[c1] == lin(c1)
    assert lab[c2] == lin(c2)


def test_flood_respects_fg_mask_and_cap():
    fg = np.zeros((8, 8, 8), bool)
    fg[4, 4, :] = True
    seeds = np.zeros((8, 8, 8), np.int32)
    seeds[4, 4, 0] = 7
    pot = np.ones((8, 8, 8), np.float32)
    lab = np.asarray(flood_labels(jnp.asarray(seeds), jnp.asarray(fg), jnp.asarray(pot), max_iters=3))
    assert (lab[4, 4, :4] == 7).all()
    assert (lab[4, 4, 4:] == 0).all()  # cap stopped propagation
    lab_full = np.asarray(flood_labels(jnp.asarray(seeds), jnp.asarray(fg), jnp.asarray(pot), max_iters=16))
    assert (lab_full[4, 4, :] == 7).all()
    assert (lab_full[~fg] == 0).all()


def test_flood_static_unroll_matches_while_loop():
    peak, fg, *_ = _two_blob_maps()
    seeds = (peak > 0.9).astype(np.int32) * 5
    a = flood_labels(jnp.asarray(seeds), jnp.asarray(fg), jnp.asarray(peak), 32, unroll_static=False)
    b = flood_labels(jnp.asarray(seeds), jnp.asarray(fg), jnp.asarray(peak), 32, unroll_static=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_size_filter_drops_small():
    lab = np.zeros((8, 8, 8), np.int32)
    lab[0:3, 0:3, 0:3] = 9      # 27 voxels
    lab[6, 6, 6] = 42           # 1 voxel
    out = np.asarray(size_filter(jnp.asarray(lab), min_size=27))
    assert (out == 9).sum() == 27
    assert (out == 42).sum() == 0


def test_size_filter_and_compact_matches_sequential():
    from tpuseg.ops import compact_relabel, size_filter_and_compact

    rng = np.random.default_rng(3)
    lab = np.zeros((12, 12, 12), np.int32)
    lab[0:3, 0:3, 0:3] = 9          # 27 voxels
    lab[5:7, 5:7, 5:7] = 700        # 8 voxels
    lab[10, 10, 10] = 42            # 1 voxel
    seq = np.asarray(compact_relabel(size_filter(jnp.asarray(lab), 8)))
    fused = np.asarray(size_filter_and_compact(jnp.asarray(lab), 8))
    assert np.array_equal(seq, fused)
    assert set(np.unique(fused)) == {0, 1, 2}


def test_threshold_for_fraction_matches_quantile():
    from tpuseg.ops.calibrate import threshold_for_fraction

    rng = np.random.default_rng(0)
    prob = jnp.asarray(rng.random((32, 32, 32)).astype(np.float32))
    for frac in (0.03, 0.1, 0.5):
        t = float(threshold_for_fraction(prob, frac))
        got = float((np.asarray(prob) >= t).mean())
        assert abs(got - frac) < 0.01, (frac, got, t)


def test_expected_fg_fraction():
    from tpuseg.ops.calibrate import expected_fg_fraction

    # one sphere radius 4 in a 32^3 volume
    f = expected_fg_fraction(np.array([[4.0, 4.0, 4.0]]), 32**3)
    want = (4.0 / 3.0) * np.pi * 64 / 32**3
    assert abs(f - want) < 1e-9


def test_saturated_plateau_instance_resolves_with_default_rounds():
    """Confident nets emit exactly-1.0 plateaus over whole instances (bf16
    sigmoid saturation); the ascent tie-break then walks index order, making
    chains ~ the plateau's Manhattan diameter. Default ascent_rounds (2^8
    path budget) must resolve a large plateau to ONE fully-labeled basin."""
    from tpuseg.core import PostprocConfig

    shape = (32, 32, 32)
    fg = np.zeros(shape, np.float32)
    pk = np.zeros(shape, np.float32)
    fg[4:28, 4:28, 4:28] = 1.0   # 24^3 saturated box
    pk[4:28, 4:28, 4:28] = 1.0
    rounds = PostprocConfig().ascent_rounds
    lab = np.asarray(
        watershed(jnp.asarray(fg), jnp.asarray(pk), 0.5, 0.5,
                  peak_radius=2, flood_iters=8, ascent_rounds=rounds)
    )
    inside = lab[4:28, 4:28, 4:28]
    assert (inside > 0).all(), "plateau voxels left unlabeled (rounds too low)"
    assert len(np.unique(inside)) == 1, "plateau split into multiple basins"


def test_dense_label_space_matches_index_space():
    """watershed(label_space="dense") + dense filter == index labels +
    size_filter_and_compact, elementwise (same NMS-rank ordering)."""
    import numpy as np

    from tpuseg.ops import size_filter_and_compact, watershed
    from tpuseg.ops.filter import max_seed_count, size_filter_and_compact_dense

    rng = np.random.default_rng(5)
    shape = (24, 32, 40)
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                             indexing="ij")
    fg = np.zeros(shape, np.float32)
    pk = np.zeros(shape, np.float32)
    for _ in range(8):
        c = [rng.uniform(3, s - 3) for s in shape]
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        pk = np.maximum(pk, np.exp(-0.5 * d2 / 2.0**2).astype(np.float32))
        fg = np.maximum(fg, (d2 < rng.uniform(9, 20)).astype(np.float32) * 0.9)

    for method in ("ascent", "flood"):
        want = np.asarray(size_filter_and_compact(
            watershed(fg, pk, method=method, flood_iters=24,
                      label_space="index"), 10))
        got = np.asarray(size_filter_and_compact_dense(
            watershed(fg, pk, method=method, flood_iters=24,
                      label_space="dense"), 10, max_seed_count(shape, 2)))
        np.testing.assert_array_equal(got, want, err_msg=method)


def test_flood_cap_truncation_is_surfaced(capfd):
    """A tube of fg longer than flood_iters from its only seed leaves voxels
    unlabeled next to labeled ones — watershed must say so (VERDICT r3 #7)."""
    import jax

    d = 64
    fg = np.zeros((4, 4, d), bool)
    fg[1, 1, :] = True
    peak = np.zeros((4, 4, d), np.float32)
    peak[1, 1, 0] = 1.0  # single seed at the x=0 end
    lab = np.asarray(watershed(
        jnp.asarray(fg.astype(np.float32)), jnp.asarray(peak),
        peak_threshold=0.5, fg_threshold=0.5, flood_iters=8))
    jax.effects_barrier()
    # the far end of the tube stayed unlabeled (cap truncated)
    assert (lab[1, 1, :5] > 0).all() and (lab[1, 1, -5:] == 0).all()
    out = capfd.readouterr()
    assert "NOT CONVERGED" in out.out + out.err

    # converged run stays silent
    lab2 = np.asarray(watershed(
        jnp.asarray(fg.astype(np.float32)), jnp.asarray(peak),
        peak_threshold=0.5, fg_threshold=0.5, flood_iters=d + 2))
    jax.effects_barrier()
    assert (lab2[fg] > 0).all()
    out = capfd.readouterr()
    assert "NOT CONVERGED" not in out.out + out.err


def test_flood_truncation_count_as_output():
    """flood_truncation_count — the backend-portable diagnostic (VERDICT r4
    weak #4): positive exactly when the cap truncated, zero at convergence,
    and threaded out of the fused pipeline via with_diagnostics."""
    from tpuseg.ops.watershed import flood_truncation_count

    d = 64
    fg = np.zeros((4, 4, d), bool)
    fg[1, 1, :] = True
    peak = np.zeros((4, 4, d), np.float32)
    peak[1, 1, 0] = 1.0
    fgj, pkj = jnp.asarray(fg.astype(np.float32)), jnp.asarray(peak)

    lab = watershed(fgj, pkj, peak_threshold=0.5, fg_threshold=0.5,
                    flood_iters=8)
    assert int(flood_truncation_count(lab, fgj >= 0.5)) > 0
    lab2 = watershed(fgj, pkj, peak_threshold=0.5, fg_threshold=0.5,
                     flood_iters=d + 2)
    assert int(flood_truncation_count(lab2, fgj >= 0.5)) == 0

    # pipeline plumbing: with_diagnostics returns (labels, diag) with the
    # count computed inside the jitted program
    from flax import linen as nn

    from tpuseg.core import Config, InferConfig, PostprocConfig
    from tpuseg.infer.pipeline import make_infer_fn

    class FixtureNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            fgl = (jnp.asarray(fg.astype(np.float32)) - 0.5) * 50.0
            pkl = (jnp.asarray(peak) - 0.5) * 50.0
            b = x.shape[0]
            return {"fg_logits": jnp.broadcast_to(fgl, (b,) + fgl.shape),
                    "peak_logits": jnp.broadcast_to(pkl, (b,) + pkl.shape)}

    cfg = Config(
        infer=InferConfig(tile=(4, 4, d), halo=0, compute_dtype="float32"),
        postproc=PostprocConfig(peak_threshold=0.5, fg_threshold=0.5,
                                flood_iters=8, min_size=1),
    )
    infer = make_infer_fn(FixtureNet(), cfg, normalize=False,
                          with_diagnostics=True)
    labels, diag = infer({"params": {}}, jnp.zeros((4, 4, d), jnp.float32))
    assert int(diag["flood_truncated"]) > 0
    assert labels.shape == (4, 4, d)
