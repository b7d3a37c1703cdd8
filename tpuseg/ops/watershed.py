"""Seeded watershed as XLA-native kernels (SURVEY.md C12).

NORTH-STAR: the reference's CPU scipy watershed becomes "fused on-device
kernels ... iterative flood-fill relabel". Two interchangeable
implementations (PostprocConfig.method):

* ``ascent_labels`` — steepest-ascent + pointer jumping. Every foreground
  voxel points at its (potential, index)-lexicographically largest neighbor
  (or itself if it is the local max); log2(N) rounds of ``p = p[p]`` resolve
  each voxel to its basin root. Strict lexicographic ordering makes the
  pointer graph a forest (no cycles) and the result deterministic. This is
  the fast path: ~7 stencil passes + ~log2(N) gathers, all dense and
  HBM-bandwidth bound, no data-dependent iteration count.

* ``flood_labels`` — iterative 6-neighbor label propagation from seeds,
  highest-potential-neighbor-first, a fixed-point ``lax.while_loop`` capped at
  ``max_iters`` (SURVEY.md §7 hard part #2: cap + changed flag). Closer to
  scipy's priority-flood semantics; used for parity checks and for absorbing
  unlabeled foreground into adjacent basins.

The standard pipeline (``watershed``) seeds from the peak map (C11), builds
basins on the peak potential (valleys of the summed center-gaussians split
touching instances), constrains extent by the foreground mask, drops basins
whose root is not a seed, and floods those dropped voxels into neighboring
labeled basins.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tpuseg.ops.neighbors import NEIGHBORS_6, linear_index, shift


def _steepest_parent(potential, mask, self_sticky=None):
    """Parent linear index per voxel: argmax over {self} ∪ 6 neighbors of
    (potential, linear_index), neighbors outside ``mask`` ineligible.

    ``self_sticky``: optional bool volume — voxels forced to parent=self
    (watershed seeds)."""
    potential = jnp.where(mask, potential.astype(jnp.float32), -jnp.inf)
    idx = linear_index(potential.shape)
    best_pot, best_idx = potential, idx
    for axis, off in NEIGHBORS_6:
        npot = shift(potential, axis, off, -jnp.inf)
        nidx = shift(idx, axis, off, jnp.int32(-1))
        better = (npot > best_pot) | ((npot == best_pot) & (nidx > best_idx))
        best_pot = jnp.where(better, npot, best_pot)
        best_idx = jnp.where(better, nidx, best_idx)
    parent = jnp.where(mask, best_idx, idx)
    if self_sticky is not None:
        parent = jnp.where(self_sticky & mask, idx, parent)
    return parent


def _pointer_jump(parent_flat: jnp.ndarray, rounds: int) -> jnp.ndarray:
    def body(_, p):
        return p[p]
    return lax.fori_loop(0, rounds, body, parent_flat)


def steepest_dir_codes(potential, mask, self_sticky=None):
    """Direction code per voxel: 0 = self/root, 1..6 = NEIGHBORS_6 order —
    the same (potential, linear_index)-lexicographic winner as
    :func:`_steepest_parent`, expressed as a code instead of an index so the
    Pallas chase kernel (ops/pallas_resolve.py) can follow chains with
    shifted selects instead of gathers."""
    potential = jnp.where(mask, potential.astype(jnp.float32), -jnp.inf)
    idx = linear_index(potential.shape)
    best_pot, best_idx = potential, idx
    best_code = jnp.zeros(potential.shape, jnp.int32)
    for c, (axis, off) in enumerate(NEIGHBORS_6):
        npot = shift(potential, axis, off, -jnp.inf)
        nidx = shift(idx, axis, off, jnp.int32(-1))
        better = (npot > best_pot) | ((npot == best_pot) & (nidx > best_idx))
        best_pot = jnp.where(better, npot, best_pot)
        best_idx = jnp.where(better, nidx, best_idx)
        best_code = jnp.where(better, jnp.int32(c + 1), best_code)
    code = jnp.where(mask, best_code, 0)
    if self_sticky is not None:
        code = jnp.where(self_sticky & mask, 0, code)
    return code.astype(jnp.int32)


def ascent_labels(
    potential: jnp.ndarray,
    fg_mask: jnp.ndarray,
    seed_mask: jnp.ndarray | None = None,
    rounds: int | None = None,
) -> jnp.ndarray:
    """Watershed-by-steepest-ascent. Returns int32 labels = root linear
    index + 1 on foreground, 0 on background.

    If ``seed_mask`` is given, seed voxels are forced to be roots; basins
    whose root is NOT a seed keep their (non-seed) root label — callers that
    want them removed use :func:`watershed`, which drops and re-floods them.

    ``rounds`` pointer-jump iterations resolve ascent paths up to 2^rounds
    voxels long. Paths are bounded by the basin's geodesic extent, so the
    PostprocConfig default (8 -> 256-voxel paths) is generous for nuclei;
    None falls back to the worst-case log2(N) bound. Each round is one
    random gather over the volume — the dominant post-proc cost — so don't
    overshoot (measured: 25 rounds = 5.4 s on a 25 MVoxel stack, 8 = ~1.7 s).
    """
    shape = potential.shape
    n = potential.size
    parent = _steepest_parent(potential, fg_mask, self_sticky=seed_mask)
    if rounds is None:
        rounds = max(1, math.ceil(math.log2(max(n, 2))))
    root = _pointer_jump(parent.ravel(), rounds).reshape(shape)
    return jnp.where(fg_mask, root + 1, 0).astype(jnp.int32)


def flood_labels(
    seed_labels: jnp.ndarray,
    fg_mask: jnp.ndarray,
    potential: jnp.ndarray,
    max_iters: int,
    unroll_static: bool = False,
) -> jnp.ndarray:
    """Propagate seed labels over the foreground mask, one 6-neighbor step per
    iteration; an unlabeled voxel adopts the label of its labeled neighbor with
    the highest (potential, index) key. Labeled voxels never change (first
    arrival wins), matching marker-based region growing.

    ``unroll_static=True`` replaces the while_loop with a fori_loop of exactly
    ``max_iters`` steps — jit-stable shape for the fused inference graph
    (SURVEY.md §7 hard part #2).
    """
    potential = jnp.where(fg_mask, potential.astype(jnp.float32), -jnp.inf)
    idx = linear_index(fg_mask.shape)

    def step(labels):
        best_key = jnp.full(labels.shape, -jnp.inf)
        best_idx = jnp.full(labels.shape, -1, jnp.int32)
        best_lbl = jnp.zeros_like(labels)
        for axis, off in NEIGHBORS_6:
            nlbl = shift(labels, axis, off, jnp.int32(0))
            nkey = shift(potential, axis, off, -jnp.inf)
            nidx = shift(idx, axis, off, jnp.int32(-1))
            valid = nlbl > 0
            nkey = jnp.where(valid, nkey, -jnp.inf)
            better = (nkey > best_key) | ((nkey == best_key) & (nidx > best_idx))
            best_key = jnp.where(better, nkey, best_key)
            best_idx = jnp.where(better, nidx, best_idx)
            best_lbl = jnp.where(better, nlbl, best_lbl)
        can_take = fg_mask & (labels == 0) & (best_lbl > 0)
        return jnp.where(can_take, best_lbl, labels)

    labels0 = jnp.where(fg_mask, seed_labels, 0).astype(jnp.int32)

    if unroll_static:
        return lax.fori_loop(0, max_iters, lambda _, l: step(l), labels0)

    def cond(state):
        i, labels, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, labels, _ = state
        new = step(labels)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = lax.while_loop(cond, body, (jnp.int32(0), labels0, jnp.bool_(True)))
    return labels


def _use_pallas(resolve_impl: str, shape) -> bool:
    from tpuseg.ops.pallas_resolve import pallas_resolve_supported

    if resolve_impl == "pallas":
        # chase_pass/flood_pass grids floor-divide the shape — forcing pallas
        # on a non-block-divisible volume would leave remainder blocks
        # unwritten (silent garbage), so refuse loudly instead (ADVICE r2)
        if not pallas_resolve_supported(shape):
            raise ValueError(
                f"resolve_impl='pallas' requires block-divisible (D,H) and "
                f"W a multiple of 128; got shape {tuple(shape)}. Use "
                f"resolve_impl='auto' to fall back to XLA on such shapes."
            )
        return True
    if resolve_impl == "auto":
        return (jax.default_backend() == "tpu"
                and pallas_resolve_supported(shape))
    return False


@partial(
    jax.jit,
    static_argnames=(
        "peak_radius", "flood_iters", "method", "static_shapes", "ascent_rounds",
        "nms_impl", "resolve_impl", "label_space",
    ),
)
def watershed(
    fg_prob: jnp.ndarray,
    peak_prob: jnp.ndarray,
    peak_threshold: float = 0.5,
    fg_threshold: float = 0.5,
    peak_radius=2,  # int or per-axis (rz, ry, rx) — ops.peaks.radius3
    flood_iters: int = 96,
    method: str = "ascent",
    static_shapes: bool = False,
    ascent_rounds: int | None = None,
    nms_impl: str = "xla",
    resolve_impl: str = "auto",
    label_space: str = "index",
) -> jnp.ndarray:
    """Full instance extraction: peak NMS seeds -> seeded watershed over the
    foreground mask. Returns int32 labels (root-index labels; call
    :func:`tpuseg.ops.compact_relabel` for 1..K numbering).

    Equivalent of the reference's ``post_process(fg_vol, peak_vol)`` stage
    (SURVEY.md §3.2 hot loops 2-3), as one jittable function.

    ``resolve_impl`` selects the chain-resolution/flood backend: "xla"
    (gather pointer-jumping + per-iteration stencil loops), "pallas"
    (block-local VMEM iteration, ops/pallas_resolve.py — ~10-40x less HBM
    traffic on the post-proc stages), or "auto" (pallas on TPU when the
    volume shape supports it). Results are elementwise identical once the
    iteration caps are reached/converged (tests/unit/test_pallas_resolve.py).

    ``label_space``: "index" labels instances by basin-root linear index + 1
    (globally comparable — the sharded/streamed paths need this to lift to
    global ids); "dense" labels by the seed's NMS rank (1..S ascending in
    seed index — same final numbering after compaction) so the downstream
    size filter works on a (max_seed_count,)-sized table instead of an
    (N+1,)-sized one (ops.filter.size_filter_and_compact_dense).
    """
    from tpuseg.ops.peaks import peak_nms  # local import to avoid cycle

    fg_mask = fg_prob >= fg_threshold
    if nms_impl == "pallas":
        from tpuseg.ops.pallas_nms import pallas_peak_nms

        seeds = pallas_peak_nms(peak_prob, peak_threshold, peak_radius)
    else:
        seeds = peak_nms(peak_prob, peak_threshold, peak_radius)
    seeds = seeds & fg_mask
    idx = linear_index(fg_prob.shape)
    pallas = _use_pallas(resolve_impl, fg_prob.shape)

    if label_space == "dense":
        # seed id = NMS rank (1..S, ascending in linear index) — the same
        # ordering compaction produces from index labels
        seed_id = jnp.cumsum(seeds.ravel().astype(jnp.int32)).reshape(seeds.shape)
        unseeded_root_id = jnp.int32(-1)
    elif label_space == "index":
        seed_id = idx + 1
        unseeded_root_id = None  # -(idx+1), set in the branches
    else:
        raise ValueError(f"unknown label_space {label_space!r}")

    def absorb(labels):
        """Flood unlabeled fg voxels into adjacent labeled basins."""
        if pallas:
            from tpuseg.ops.pallas_resolve import flood_resolve

            return flood_resolve(labels, fg_mask, fg_prob, flood_iters)
        return flood_labels(labels, fg_mask, fg_prob, flood_iters,
                            unroll_static=static_shapes)

    if method == "ascent" and pallas:
        from tpuseg.ops.pallas_resolve import chase_resolve
        from tpuseg.ops.pallas_seed import (seed_chase_pass,
                                            seed_pass_supported)
        from tpuseg.ops.peaks import radius3

        r3 = radius3(peak_radius)
        if label_space == "index" and seed_pass_supported(fg_prob.shape, r3):
            # Fused seeding (VERDICT r3 #8): NMS + dir codes + v0 + the
            # first 8 chase steps in ONE VMEM pass over shared halo windows
            # — replaces four HBM round-trips. Elementwise equal to the
            # unfused composition below for any nms_impl (both NMS paths
            # are bit-identical); dense label space needs a global seed
            # cumsum and keeps the unfused path.
            dirs, v = seed_chase_pass(
                peak_prob, fg_prob, peak_threshold, fg_threshold, r3, h0=8)
            v = chase_resolve(v, dirs, fg_mask)
            labels = absorb(jnp.maximum(v, 0))
            return _surface_flood_truncation(labels, fg_mask, flood_iters)

        # Chase the ascent chains in VMEM; the payload's SIGN encodes whether
        # the basin root is a seed (+) or not (-), so dropping unseeded
        # basins needs no root-index gather at all.
        dirs = steepest_dir_codes(peak_prob, fg_mask, self_sticky=seeds)
        neg = unseeded_root_id if unseeded_root_id is not None else -(idx + 1)
        v0 = jnp.where(
            fg_mask & (dirs == 0),
            jnp.where(seeds, seed_id, neg),
            0,
        ).astype(jnp.int32)
        v = chase_resolve(v0, dirs, fg_mask)
        labels = absorb(jnp.maximum(v, 0))
    elif method == "ascent":
        labels = ascent_labels(peak_prob, fg_mask, seed_mask=seeds,
                               rounds=ascent_rounds)
        # Drop basins whose root is not a seed, then flood those voxels into
        # adjacent seeded basins (absorption handles sub-threshold local maxima).
        root = labels - 1
        root_is_seed = jnp.where(labels > 0, seeds.ravel()[root.ravel()].reshape(labels.shape), False)
        labels = jnp.where(root_is_seed, labels, 0)
        if label_space == "dense":
            # root is a seed wherever labels > 0 -> its NMS rank is valid
            labels = jnp.where(
                labels > 0,
                seed_id.ravel()[(labels - 1).ravel()].reshape(labels.shape),
                0,
            )
        labels = absorb(labels)
    elif method == "flood":
        seed_labels = jnp.where(seeds, seed_id, 0).astype(jnp.int32)
        if pallas:
            from tpuseg.ops.pallas_resolve import flood_resolve

            labels = flood_resolve(seed_labels, fg_mask, fg_prob, flood_iters)
        else:
            labels = flood_labels(seed_labels, fg_mask, fg_prob, flood_iters,
                                  unroll_static=static_shapes)
    else:
        raise ValueError(f"unknown watershed method {method!r}")
    return _surface_flood_truncation(labels, fg_mask, flood_iters)


def flood_truncation_count(labels, fg_mask):
    """int32 count of fg voxels the flood cap TRUNCATED: unlabeled fg
    ADJACENT to a labeled basin (one more flood step would make progress).
    Unlabeled fg with no labeled neighbor is a seedless component — dropped
    by design, not counted. Zero iff the flood reached its fixed point.

    This is the real-chip-visible convergence diagnostic (VERDICT r4 weak
    #4): callers thread it out of their jitted programs as an ordinary
    output (pipeline ``with_diagnostics``, ``stream_infer(stats=)``), so it
    works on backends where host callbacks don't (the axon tunnel). Cost: 6
    boolean shifts + a reduction, negligible next to the flood."""
    lab_pos = labels > 0
    nbr_lab = jnp.zeros_like(lab_pos)
    for axis, off in NEIGHBORS_6:
        nbr_lab = nbr_lab | shift(lab_pos, axis, off, False)
    return jnp.sum(fg_mask & (~lab_pos) & nbr_lab, dtype=jnp.int32)


def _surface_flood_truncation(labels, fg_mask, flood_iters: int):
    """Surface flood-cap truncation (VERDICT r3 #7) via the in-test print
    channel; cond_print no-ops on backends without host callbacks
    (utils/debug.py) — production paths thread
    :func:`flood_truncation_count` out as a program output instead."""
    from tpuseg.utils.debug import cond_print

    n_trunc = flood_truncation_count(labels, fg_mask)
    cond_print(
        n_trunc > 0,
        "tpuseg: watershed flood NOT CONVERGED — {c} foreground voxels "
        "adjacent to labeled basins remain unlabeled after flood_iters="
        + str(flood_iters) + " steps; raise PostprocConfig.flood_iters.",
        c=n_trunc,
    )
    return labels
