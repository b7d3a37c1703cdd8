"""Pallas TPU kernels for watershed label resolution (SURVEY.md C12 fast path).

Round-1 profiling on the real chip (benchmarks/profile_stages.py) showed the
post-processing dominated by two HBM-bound XLA loops:

* pointer jumping (``watershed._pointer_jump``): each round is a full-volume
  random gather (~0.22 s / 25 MVox on v5e — TPU gathers are slow), and the
  default 8 rounds cost ~1.8 s;
* flood absorption (``watershed.flood_labels``): every lockstep iteration is
  a full-volume 6-neighbor stencil round-trip through HBM (~22 ms), and noisy
  volumes run ~100 iterations (~2 s).

Both are replaced here by *block-local iteration in VMEM*: stage a
(bz+2h, by+2h, W) window, iterate ``h`` steps on-chip (VPU shifts + selects,
zero HBM traffic between steps), write the core back. The halo-validity
argument makes this exact: one lockstep step reads distance-1 neighbors, so
after ``h`` local steps the core block is bitwise-identical to ``h`` global
lockstep steps — garbage from beyond the window has only reached halo layer 1.
Passes compose (pass k+1 reads pass k's output), so K passes == K*h global
steps at 1/h-th of the HBM traffic and none of the gathers.

Two kernels:

``chase_pass``
    One pass of pointer-chain chasing by direction codes. Instead of parent
    *indices* (which need gathers), every voxel stores a direction code
    0..6 (0 = self/root, 1..6 = the 6-neighborhood in ``NEIGHBORS_6`` order)
    and a payload value; each step pulls the payload from the pointed-at
    neighbor: ``V[v] <- V[v + offset(dir[v])]`` — a 6-way shifted select,
    pure VPU. After enough steps, ``V[v] = V0[root(v)]``. ``ascent_labels``
    seeds ``V0 = +(idx+1)`` at seeded roots and ``-(idx+1)`` at unseeded
    roots, so "basin root is not a seed" falls out of the SIGN with no
    root-index gather at all.

``flood_pass``
    ``h`` lockstep iterations of the seeded flood (same (potential, index)
    tie-break as ``watershed.flood_labels``) — bitwise-equal to the XLA
    version per the argument above; tests/unit/test_pallas_resolve.py asserts
    elementwise equality in interpret mode and the verify drive does so on
    the real chip.

The reference does this stage with scipy's priority-queue ``watershed_ift``
on the CPU (SURVEY.md C12/L6); the block-local lockstep design is the
TPU-native equivalent with a deterministic tie-break.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuseg.ops.neighbors import NEIGHBORS_6


def _shift(x, axis, off, fill):
    """y[v] = x[v + off*e_axis] with `fill` boundary (static slice + concat)."""
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(off)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if off > 0:
        body = lax.slice_in_dim(x, off, x.shape[axis], axis=axis)
        return jnp.concatenate([body, pad], axis=axis)
    body = lax.slice_in_dim(x, 0, x.shape[axis] + off, axis=axis)
    return jnp.concatenate([pad, body], axis=axis)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Candidate (bz, by) blocks, best-first. Bigger blocks amortize the 2*halo
# window overcompute (the kernels are VPU-bound): at (96, 512, 512) the
# measured resolve times are chase 0.41 s -> 0.20 s and flood 0.40 s ->
# 0.13 s going from the old fixed (8, 16)/(8, 8) to (32, 32). The picker
# takes the first candidate that (a) divides (D, H) and (b) fits a VMEM
# budget estimate — wide-W volumes (streamed chunks) automatically get
# smaller blocks instead of failing Mosaic allocation.
_CHASE_BLOCKS = ((32, 32), (16, 32), (16, 16), (8, 16))
_FLOOD_BLOCKS = ((32, 32), (16, 32), (16, 16), (8, 16), (8, 8))
# Live window-sized arrays per kernel, calibrated against measured compile
# pass/fail boundaries on v5e at the 100 MB scoped limit (probe matrix,
# 2026-08-18): chase OK at win 8 MB, OOM at 12 MB -> live 12; flood OK at
# win 4.5 MB, OOM at 6 MB (116.9 MB reported => ~19.5 actual) -> live 20.
_CHASE_LIVE = 12
_FLOOD_LIVE = 20
_VMEM_BUDGET = 100 * 1024 * 1024
# When the padded operands are small, XLA's memory-space assignment may pin
# them AND the kernel output in VMEM *on top of* the kernel's scoped
# allocation (measured: flood at (16,32,2048) inside a while_loop — window
# 4.7 MB, reported 116.77 MB = ~92 MB kernel + ~25 MB pinned operand/output
# buffers, all tagged S(1) in the OOM dump). Large operands are never
# pinned (the flagship (96,512,512) runs (32,32) at ~90 MB scoped, fine).
_MSA_PIN_MAX = 16 * 1024 * 1024


def auto_block(shape, halo: int, candidates, live: int,
               budget: int = _VMEM_BUDGET):
    """Largest candidate block that divides (D, H) and whose (window bytes x
    ``live`` concurrently-resident arrays) estimate fits the kernel's VMEM
    budget. ``live`` is calibrated per kernel from measured compile
    boundaries (see ``_CHASE_LIVE``/``_FLOOD_LIVE``). For small volumes the
    budget is reduced by the XLA-pinned operand/output estimate (see
    ``_MSA_PIN_MAX``). Returns None when no candidate fits — callers fall
    back to the XLA path (``pallas_resolve_supported`` applies the same
    test, so the watershed dispatcher never sends such shapes here)."""
    d, h, w = shape
    padded = (d + 2 * halo) * (h + 2 * halo) * w * 4
    if padded <= _MSA_PIN_MAX:
        budget -= 2 * padded + d * h * w * 4
    for bz, by in candidates:
        if d % bz == 0 and h % by == 0 and (
                (bz + 2 * halo) * (by + 2 * halo) * w * 4 * live <= budget):
            return bz, by
    return None


# --------------------------------------------------------------------------
# chase: pointer-chain resolution by direction codes
# --------------------------------------------------------------------------

def _chase_kernel(iters, hz, hy, bz, by,
                  val_hbm, dir_hbm, out_ref, vscr, dscr, sems):
    z0 = pl.program_id(0) * bz
    y0 = pl.program_id(1) * by
    cp_v = pltpu.make_async_copy(
        val_hbm.at[pl.ds(z0, bz + 2 * hz), pl.ds(y0, by + 2 * hy), :],
        vscr, sems.at[0])
    cp_d = pltpu.make_async_copy(
        dir_hbm.at[pl.ds(z0, bz + 2 * hz), pl.ds(y0, by + 2 * hy), :],
        dscr, sems.at[1])
    cp_v.start()
    cp_d.start()
    cp_v.wait()
    cp_d.wait()

    d = dscr[:]
    # direction-code masks are loop-invariant: hoist the 6 compares
    dmasks = [d == c + 1 for c in range(len(NEIGHBORS_6))]

    def step(_, v):
        out = v
        for c, (axis, off) in enumerate(NEIGHBORS_6):
            out = jnp.where(dmasks[c], _shift(v, axis, off, jnp.int32(0)), out)
        return out

    v = lax.fori_loop(0, iters, step, vscr[:])
    out_ref[:] = v[hz : hz + bz, hy : hy + by, :]


@partial(jax.jit, static_argnames=("iters", "block", "interpret"))
def chase_pass(values, dirs, iters: int = 8, block=(8, 16), interpret=False):
    """One Pallas pass == ``iters`` pointer-chase steps. values/dirs: (D,H,W)
    int32. Requires D,H divisible by block (caller guards)."""
    d, h, w = values.shape
    bz, by = block
    hz = _round_up(iters, 8)
    hy = _round_up(iters, 8)
    grid = (d // bz, h // by)
    pad = ((hz, hz), (hy, hy), (0, 0))
    vp = jnp.pad(values, pad)                      # 0: stable background
    dp = jnp.pad(dirs, pad)                        # 0: self (stable)
    return pl.pallas_call(
        partial(_chase_kernel, iters, hz, hy, bz, by),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((bz, by, w), lambda zi, yi: (zi, yi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * hz, by + 2 * hy, w), jnp.int32),
            pltpu.VMEM((bz + 2 * hz, by + 2 * hy, w), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vp, dp)


def chase_resolve(values, dirs, fg_mask, iters_per_pass: int = 8,
                  max_passes: int = 128, block=None, interpret=False):
    """Iterate ``chase_pass`` until every foreground voxel resolved (nonzero)
    or ``max_passes`` reached. Convergence is checked on zero-ness, not
    change: payloads are 0 along unresolved chains and flip exactly once to
    the root's (signed, nonzero) value, so "no zeros left" is the sound
    fixed-point test (change-based tests can stall in passes where no chain
    happens to terminate). ``block=None`` auto-picks the largest VMEM-fitting
    block (see ``auto_block``); results are block-independent."""
    if block is None:
        block = auto_block(values.shape, _round_up(iters_per_pass, 8),
                           _CHASE_BLOCKS, live=_CHASE_LIVE)
        if block is None:
            raise ValueError(
                f"no chase block fits shape {tuple(values.shape)} in VMEM; "
                "guard with pallas_resolve_supported and use the XLA path")

    def cond(s):
        i, v, unresolved = s
        return unresolved & (i < max_passes)

    def body(s):
        i, v, _ = s
        vn = chase_pass(v, dirs, iters=iters_per_pass, block=block,
                        interpret=interpret)
        return i + 1, vn, jnp.any(fg_mask & (vn == 0))

    _, v, _ = lax.while_loop(
        cond, body, (jnp.int32(0), values, jnp.any(fg_mask & (values == 0))))
    return v


# --------------------------------------------------------------------------
# flood: block-local lockstep seeded flood
# --------------------------------------------------------------------------

def _flood_kernel(iters, hz, hy, bz, by, h, w,
                  pot_hbm, lab_hbm, out_ref, pscr, lscr, sems):
    z0 = pl.program_id(0) * bz
    y0 = pl.program_id(1) * by
    cp_p = pltpu.make_async_copy(
        pot_hbm.at[pl.ds(z0, bz + 2 * hz), pl.ds(y0, by + 2 * hy), :],
        pscr, sems.at[0])
    cp_l = pltpu.make_async_copy(
        lab_hbm.at[pl.ds(z0, bz + 2 * hz), pl.ds(y0, by + 2 * hy), :],
        lscr, sems.at[1])
    cp_p.start()
    cp_l.start()
    cp_p.wait()
    cp_l.wait()

    pot = pscr[:]
    # absolute linear indices for the (potential, index) tie-break — identical
    # across blocks, so block-local lockstep == global lockstep
    az = lax.broadcasted_iota(jnp.int32, pot.shape, 0) + z0 - hz
    ay = lax.broadcasted_iota(jnp.int32, pot.shape, 1) + y0 - hy
    ax = lax.broadcasted_iota(jnp.int32, pot.shape, 2)
    lin = (az * h + ay) * w + ax
    fg = pot > -jnp.inf

    # the shifted potentials/indices are loop-invariant (only labels change):
    # hoist the 12 shifts out of the step loop — 18 shifts/step become 6
    nkeys = [_shift(pot, axis, off, -jnp.inf) for axis, off in NEIGHBORS_6]
    nidxs = [_shift(lin, axis, off, jnp.int32(-1)) for axis, off in NEIGHBORS_6]

    def step(_, labels):
        best_key = jnp.full(labels.shape, -jnp.inf, jnp.float32)
        best_idx = jnp.full(labels.shape, -1, jnp.int32)
        best_lbl = jnp.zeros_like(labels)
        for c, (axis, off) in enumerate(NEIGHBORS_6):
            nlbl = _shift(labels, axis, off, jnp.int32(0))
            nkey = jnp.where(nlbl > 0, nkeys[c], -jnp.inf)
            nidx = nidxs[c]
            better = (nkey > best_key) | ((nkey == best_key) & (nidx > best_idx))
            best_key = jnp.where(better, nkey, best_key)
            best_idx = jnp.where(better, nidx, best_idx)
            best_lbl = jnp.where(better, nlbl, best_lbl)
        can_take = fg & (labels == 0) & (best_lbl > 0)
        return jnp.where(can_take, best_lbl, labels)

    labels = lax.fori_loop(0, iters, step, lscr[:])
    out_ref[:] = labels[hz : hz + bz, hy : hy + by, :]


@partial(jax.jit, static_argnames=("iters", "block", "interpret"))
def flood_pass(potential, labels, iters: int = 8, block=(8, 8),
               interpret=False):
    """One Pallas pass == ``iters`` lockstep flood steps (bitwise-equal to
    ``watershed.flood_labels`` steps). ``potential`` must already be masked
    to -inf outside the foreground; labels int32.

    VMEM note: the inner loop keeps ~15-20 window-sized arrays live (pot,
    labels, lin, fg, the running best triple and the shifted operands), well
    past Mosaic's default 16 MB scoped budget, so the call raises
    ``vmem_limit_bytes`` — v5e has 128 MB physical VMEM and these windows
    peak around 23 MB."""
    d, h, w = labels.shape
    bz, by = block
    hz = _round_up(iters, 8)
    hy = _round_up(iters, 8)
    grid = (d // bz, h // by)
    pad = ((hz, hz), (hy, hy), (0, 0))
    pp = jnp.pad(potential.astype(jnp.float32), pad,
                 constant_values=-jnp.inf)                 # not fg, never taken
    lp = jnp.pad(labels, pad)                              # 0: unlabeled
    return pl.pallas_call(
        partial(_flood_kernel, iters, hz, hy, bz, by, h, w),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((bz, by, w), lambda zi, yi: (zi, yi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * hz, by + 2 * hy, w), jnp.float32),
            pltpu.VMEM((bz + 2 * hz, by + 2 * hy, w), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pp, lp)


def flood_resolve(seed_labels, fg_mask, potential, max_iters: int,
                  iters_per_pass: int = 8, block=None, interpret=False):
    """Seeded lockstep flood to (early-exiting) fixed point — elementwise
    equal to ``watershed.flood_labels(seed_labels, fg, potential, max_iters)``.

    Runs ceil(max_iters / iters_per_pass) Pallas passes plus a remainder pass
    so the CAPPED (unconverged) case executes exactly ``max_iters`` lockstep
    steps like the XLA version; early exit at the fixed point is identical by
    idempotence. ``block=None`` auto-picks (see ``auto_block``); lockstep
    results are block-independent."""
    if block is None:
        block = auto_block(seed_labels.shape, _round_up(iters_per_pass, 8),
                           _FLOOD_BLOCKS, live=_FLOOD_LIVE)
        if block is None:
            raise ValueError(
                f"no flood block fits shape {tuple(seed_labels.shape)} in "
                "VMEM; guard with pallas_resolve_supported and use the XLA "
                "path")
    pot = jnp.where(fg_mask, potential.astype(jnp.float32), -jnp.inf)
    labels0 = jnp.where(fg_mask, seed_labels, 0).astype(jnp.int32)
    full, rem = divmod(max_iters, iters_per_pass)

    def cond(s):
        i, labels, changed = s
        return changed & (i < full)

    def body(s):
        i, labels, _ = s
        new = flood_pass(pot, labels, iters=iters_per_pass, block=block,
                         interpret=interpret)
        return i + 1, new, jnp.any(new != labels)

    _, labels, changed = lax.while_loop(
        cond, body, (jnp.int32(0), labels0, jnp.bool_(True)))
    if rem:
        labels = lax.cond(
            changed,
            lambda l: flood_pass(pot, l, iters=rem, block=block,
                                 interpret=interpret),
            lambda l: l,
            labels,
        )
    return labels


# --------------------------------------------------------------------------
# shape guard shared by the watershed dispatcher
# --------------------------------------------------------------------------

def pallas_resolve_supported(shape, block=None) -> bool:
    """Pallas kernels need a block-divisible (D, H), a nontrivial 128-mult W
    lane dim, AND a candidate block whose VMEM estimate fits (auto_block);
    callers fall back to the XLA path otherwise. With an explicit ``block``
    only divisibility is checked (the caller owns the VMEM trade)."""
    d, h, w = shape
    if w < 128 or w % 128 != 0:
        return False
    if block is not None:
        bz, by = block
        return d % bz == 0 and h % by == 0
    return (auto_block(shape, 8, _CHASE_BLOCKS, live=_CHASE_LIVE) is not None
            and auto_block(shape, 8, _FLOOD_BLOCKS, live=_FLOOD_LIVE)
            is not None)
