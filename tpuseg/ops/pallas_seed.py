"""Fused watershed seeding: peak NMS + steepest-ascent direction codes +
chase seeding + the first chase sweep, in ONE Pallas pass (VERDICT r3 #8).

The unfused pipeline runs four HBM round-trips before the chase loop even
starts: NMS reads the peak map (ops/pallas_nms.py), ``steepest_dir_codes``
reads peak+fg+seeds, the ``v0`` seeding reads dirs+seeds, and the first
``chase_pass`` reads v0+dirs. All four share the same halo'd windows of the
SAME two inputs, so this kernel stages (peak, fg_prob) once per block and
computes, entirely in VMEM:

  fg    = fg_prob >= fg_thr
  seeds = peak-NMS(peak, peak_thr, radius) & fg        (ops/peaks semantics)
  dirs  = steepest_dir_codes(peak, fg, self_sticky=seeds)
  v0    = +lin+1 at seeded roots, -(lin+1) at unseeded roots, 0 elsewhere
  v     = h0 pointer-chase steps of V[x] <- V[x + offset(dirs[x])]

and writes (dirs, v) — exactly the state the existing ``chase_resolve``
while-loop continues from.

Halo-validity (the exactness argument, per ops/pallas_resolve.py): a core
value after ``h0`` chase steps depends on dirs within ``h0`` and on v0
within ``h0``; dirs at distance d needs peak/fg at d+1 and seeds at d;
seeds at distance d needs peak within d+2r (candidate max-pool + plateau
tie-break). So halo = h0 + max(2r, 1) per axis (the max with 1 covers the
dirs stencil when a radius component is 0; y rounded to the 8-sublane tile)
makes the core bitwise-equal to the global-lockstep composition — asserted
elementwise against the unfused ops in tests/unit/test_pallas_seed.py and
by the watershed dispatcher's parity tests.

Only ``label_space="index"`` is supported (dense seed ranks need a global
cumsum over seeds, which no blockwise pass can produce); the watershed
dispatcher falls back to the unfused path otherwise.
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
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(off)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if off > 0:
        body = lax.slice_in_dim(x, off, x.shape[axis], axis=axis)
        return jnp.concatenate([body, pad], axis=axis)
    body = lax.slice_in_dim(x, 0, x.shape[axis] + off, axis=axis)
    return jnp.concatenate([pad, body], axis=axis)


def _sep_maxpool(x, radius, fill):
    for axis in range(3):
        acc = x
        for off in range(1, radius[axis] + 1):
            for sign in (1, -1):
                acc = jnp.maximum(acc, _shift(x, axis, sign * off, fill))
        x = acc
    return x


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _seed_kernel(radius, h0, hz, hy, bz, by, h, w,
                 thr_ref, peak_hbm, fgp_hbm, dirs_ref, v_ref,
                 pscr, fscr, sems):
    peak_thr = thr_ref[0, 0]
    fg_thr = thr_ref[0, 1]
    z0 = pl.program_id(0) * bz
    y0 = pl.program_id(1) * by

    cp_p = pltpu.make_async_copy(
        peak_hbm.at[pl.ds(z0, bz + 2 * hz), pl.ds(y0, by + 2 * hy), :],
        pscr, sems.at[0])
    cp_f = pltpu.make_async_copy(
        fgp_hbm.at[pl.ds(z0, bz + 2 * hz), pl.ds(y0, by + 2 * hy), :],
        fscr, sems.at[1])
    cp_p.start()
    cp_f.start()
    cp_p.wait()
    cp_f.wait()

    vals = pscr[:]
    fg = fscr[:] >= fg_thr           # pad is -inf -> False outside volume

    # absolute linear indices (negative in the pad halo; pad never wins)
    az = lax.broadcasted_iota(jnp.int32, vals.shape, 0) + z0 - hz
    ay = lax.broadcasted_iota(jnp.int32, vals.shape, 1) + y0 - hy
    ax = lax.broadcasted_iota(jnp.int32, vals.shape, 2)
    lin = (az * h + ay) * w + ax

    # ---- peak NMS (ops/peaks.peak_nms semantics) ----
    mx = _sep_maxpool(vals, radius, -jnp.inf)
    cand = (vals >= peak_thr) & (vals >= mx)
    cidx = jnp.where(cand, lin, -1)
    midx = _sep_maxpool(cidx, radius, jnp.int32(-1))
    seeds = cand & (cidx == midx) & fg

    # ---- steepest-ascent direction codes (watershed.steepest_dir_codes) ----
    pot = jnp.where(fg, vals, -jnp.inf)
    best_pot, best_idx = pot, lin
    best_code = jnp.zeros(pot.shape, jnp.int32)
    for c, (axis, off) in enumerate(NEIGHBORS_6):
        npot = _shift(pot, axis, off, -jnp.inf)
        nidx = _shift(lin, axis, off, jnp.int32(-1))
        better = (npot > best_pot) | ((npot == best_pot) & (nidx > best_idx))
        best_pot = jnp.where(better, npot, best_pot)
        best_idx = jnp.where(better, nidx, best_idx)
        best_code = jnp.where(better, jnp.int32(c + 1), best_code)
    dirs = jnp.where(fg & ~seeds, best_code, 0)

    # ---- v0: signed root payloads (watershed ascent+pallas branch) ----
    v = jnp.where(
        fg & (dirs == 0),
        jnp.where(seeds, lin + 1, -(lin + 1)),
        0,
    ).astype(jnp.int32)

    # ---- h0 chase steps in-window ----
    dmasks = [dirs == c + 1 for c in range(len(NEIGHBORS_6))]

    def step(_, v):
        out = v
        for c, (axis, off) in enumerate(NEIGHBORS_6):
            out = jnp.where(dmasks[c], _shift(v, axis, off, jnp.int32(0)), out)
        return out

    v = lax.fori_loop(0, h0, step, v)

    dirs_ref[:] = dirs[hz : hz + bz, hy : hy + by, :]
    v_ref[:] = v[hz : hz + bz, hy : hy + by, :]


_SEED_BLOCKS = ((16, 32), (8, 32), (8, 16), (8, 8))
# live window arrays through the kernel (peak, fg win, maxpool temps, lin,
# dirs, v, chase temps) — CALIBRATED against a measured compile boundary:
# at (128,1024,1024)/r=2 the (8,16) block's scoped allocation was 106.0 MB
# = 16.9 window-sized arrays (Mosaic OOM dump, r4) -> 18 with margin
_SEED_LIVE = 18
_VMEM_BUDGET = 100 * 1024 * 1024


def seed_block(shape, radius, h0: int):
    """Largest block whose halo'd window fits the VMEM budget, or None."""
    d, h, w = shape
    rz, ry, _ = radius
    # max(2r, 1): dirs at chase distance h0 read peak/fg one step further
    # out, so a zero radius component still needs a 1-voxel margin (ADVICE
    # r4 — without it the fused path diverges from the unfused composition
    # near block boundaries for e.g. radius=(0, 2, 2))
    hz = h0 + max(2 * rz, 1)
    hy = _round_up(h0 + max(2 * ry, 1), 8)
    for bz, by in _SEED_BLOCKS:
        if (d % bz == 0 and h % by == 0
                and (bz + 2 * hz) * (by + 2 * hy) * w * 4 * _SEED_LIVE
                <= _VMEM_BUDGET):
            return bz, by
    return None


def seed_pass_supported(shape, radius, h0: int = 8) -> bool:
    d, h, w = shape
    if w < 128 or w % 128 != 0:
        return False
    return seed_block(shape, radius, h0) is not None


@partial(jax.jit, static_argnames=("radius", "h0", "block", "interpret"))
def seed_chase_pass(peak_prob, fg_prob, peak_threshold, fg_threshold,
                    radius=(2, 2, 2), h0: int = 8, block=None,
                    interpret: bool = False):
    """Returns ``(dirs, v)`` — direction codes and chase payloads after
    ``h0`` lockstep chase steps — elementwise equal to the unfused
    composition (NMS & fg, steepest_dir_codes, v0, chase_pass(iters=h0)).
    Thresholds may be traced scalars (ride in SMEM)."""
    d, h, w = peak_prob.shape
    rz, ry, rx = radius
    if block is None:
        block = seed_block(peak_prob.shape, radius, h0)
        if block is None:
            raise ValueError(
                f"no seed block fits shape {tuple(peak_prob.shape)}; guard "
                "with seed_pass_supported")
    bz, by = block
    hz = h0 + max(2 * rz, 1)
    hy = _round_up(h0 + max(2 * ry, 1), 8)
    grid = (d // bz, h // by)
    thr = jnp.stack([jnp.asarray(peak_threshold, jnp.float32),
                     jnp.asarray(fg_threshold, jnp.float32)]).reshape(1, 2)
    pad = ((hz, hz), (hy, hy), (0, 0))
    peak_p = jnp.pad(peak_prob.astype(jnp.float32), pad,
                     constant_values=-jnp.inf)
    fgp_p = jnp.pad(fg_prob.astype(jnp.float32), pad,
                    constant_values=-jnp.inf)
    kernel = partial(_seed_kernel, radius, h0, hz, hy, bz, by, h, w)
    dirs, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda zi, yi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bz, by, w), lambda zi, yi: (zi, yi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bz, by, w), lambda zi, yi: (zi, yi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, h, w), jnp.int32),
            jax.ShapeDtypeStruct((d, h, w), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * hz, by + 2 * hy, w), jnp.float32),
            pltpu.VMEM((bz + 2 * hz, by + 2 * hy, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(thr, peak_p, fgp_p)
    return dirs, v
