"""Pallas TPU kernel: fused 3D peak NMS (SURVEY.md C11 fast path).

One VMEM pass computes what the XLA version (ops/peaks.py) does in two
``reduce_window`` sweeps plus elementwise glue: separable (2r+1)³ max-pool of
the peak map, threshold, plateau tie-break by linear index, seed mask — with
the halo'd block staged HBM→VMEM by an async DMA per grid step.

Semantics are identical to :func:`tpuseg.ops.peaks.peak_nms` (same -inf
boundary convention, same tie-break); tests/unit/test_pallas_nms.py asserts
elementwise equality. Select with ``PostprocConfig.nms_impl="pallas"``.

This is the template kernel for the round-2 Pallas work (fused conv chains,
block-local pointer jumping): grid + manual halo DMA + separable stencil in
VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sep_maxpool(x, radius, fill):
    """Separable per-axis (2r+1) max-pool with `fill` boundary, on a
    VMEM-resident block. ``radius`` is (rz, ry, rx); shifts are static
    slices + pads — pure VPU work."""
    for axis in range(3):
        acc = x
        for off in range(1, radius[axis] + 1):
            for sign in (1, -1):
                acc = jnp.maximum(acc, _shift(x, axis, sign * off, fill))
        x = acc
    return x


def _shift(x, axis, off, fill):
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(off)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if off > 0:
        body = jax.lax.slice_in_dim(x, off, x.shape[axis], axis=axis)
        return jnp.concatenate([body, pad], axis=axis)
    body = jax.lax.slice_in_dim(x, 0, x.shape[axis] + off, axis=axis)
    return jnp.concatenate([pad, body], axis=axis)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _nms_kernel(radius, hz, hy, bz, by, h, w,
                thr_ref, hbm_ref, out_ref, scratch, sem):
    # hbm_ref is the -inf-padded volume (D+2*hz, H+2*hy, W); window offsets
    # are always in-bounds, so the output crop below is a STATIC slice
    # (Mosaic has no dynamic_slice on values). y windows start at multiples
    # of `by` with size by+2*hy — both 8-aligned as Mosaic requires.
    #
    # Halo sizing (hz = 2*radius, hy = 2*radius rounded up to 8): a core
    # voxel's seed status depends on the CANDIDATE status of voxels up to
    # `radius` away, and a halo voxel's candidate status needs ITS OWN
    # (2r+1)^3 max-pool window — values up to 2*radius from the core. A
    # single-radius halo would see -inf beyond the scratch and could let a
    # falsely-candidate halo voxel suppress the true seed on exact-value
    # plateaus crossing a block boundary (ADVICE r1).
    threshold = thr_ref[0, 0]
    z0 = pl.program_id(0) * bz
    y0 = pl.program_id(1) * by

    dma = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(z0, bz + 2 * hz), pl.ds(y0, by + 2 * hy), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    vals = scratch[:].astype(jnp.float32)
    # absolute coordinates in the ORIGINAL (unpadded) volume; negative in the
    # pad halo, but pad values are -inf so they are never candidates and
    # their (masked, -1) indices never win the tie-break — matching XLA SAME.
    az = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0) + z0 - hz
    ay = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1) + y0 - hy
    ax = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 2)
    lin = (az * h + ay) * w + ax

    mx = _sep_maxpool(vals, radius, -jnp.inf)
    cand = (vals >= threshold) & (vals >= mx)
    cidx = jnp.where(cand, lin, -1)
    midx = _sep_maxpool(cidx, radius, jnp.int32(-1))
    seeds = cand & (cidx == midx)

    out_ref[:] = seeds.astype(jnp.int8)[
        hz : hz + bz, hy : hy + by, :
    ]


@partial(jax.jit, static_argnames=("radius", "block"))
def pallas_peak_nms(
    peak_prob: jnp.ndarray,
    threshold,
    radius=2,
    block=(8, 64),
) -> jnp.ndarray:
    """Boolean seed mask == ops.peaks.peak_nms, computed by one Pallas pass.
    ``threshold`` may be a traced scalar (rides in SMEM); ``radius`` is an
    int or a per-axis (rz, ry, rx) tuple (ops.peaks.radius3)."""
    from tpuseg.ops.peaks import radius3

    d, h, w = peak_prob.shape
    bz, by = block
    rz, ry, rx = radius = radius3(radius)
    hz = 2 * rz                    # full tie-break-exact z halo
    hy = _round_up(2 * ry, 8)      # y halo, 8-aligned for the memref tiling
    if (d % bz or h % by or d < bz + 2 * rz or h < by + 2 * ry
            or hy > by or rz > bz):
        # fall back for awkward shapes / radii rather than mask partial tiles
        from tpuseg.ops.peaks import peak_nms

        return peak_nms(peak_prob, threshold, radius)

    grid = (d // bz, h // by)
    kernel = partial(_nms_kernel, radius, hz, hy, bz, by, h, w)
    thr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)
    padded = jnp.pad(
        peak_prob.astype(jnp.float32),
        ((hz, hz), (hy, hy), (0, 0)),
        constant_values=-jnp.inf,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda zi, yi: (0, 0),
                         memory_space=pltpu.SMEM),
            # keep the padded volume in HBM: the kernel DMAs halo'd windows
            # at dynamic offsets, which tiled VMEM memrefs can't be sliced at
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (bz, by, w), lambda zi, yi: (zi, yi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, h, w), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * hz, by + 2 * hy, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(thr, padded)
    return out.astype(jnp.bool_)
