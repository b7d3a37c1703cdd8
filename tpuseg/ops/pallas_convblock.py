"""Fused full-resolution ConvBlock as a single Mosaic/Pallas kernel.

Motivation (ARCHITECTURE.md "layout waterbed"): at the U-Net's full-res
levels (C=32) every XLA schedule is layout-equilibrated at ~150 ms/tile —
~60 ms of conv fusions plus ~90 ms of layout taxes (stride-2 lane shuffles,
tap materializations, f32 head relayouts) that move but never shrink. The
way past the equilibrium is to keep the whole (conv3x3x3 -> BN-affine ->
ReLU) x2 block in VMEM in ONE fixed layout. Inference only: BatchNorm is
folded to a per-channel affine (running stats), so there is no batch-stat
or gradient path here — training keeps the XLA schedules
(models/conv3d.py).

Layout: activations live as (z, C, h*Wp) — C in sublanes, h-rows flattened
into the lane dimension (each row one Wp-aligned lane segment, Wp a
multiple of 128). With C = 32 the usual channels-last layout fills 32 of
128 lanes (the 25% ceiling the waterbed analysis measured); here every MXU
op streams R rows x Wp lanes. Per strip of R output rows:

  U(dy) = concat_dz plane(z+dz)[:, (t0+dy)*Wp : (t0+dy+R)*Wp]  # (3C, R*Wp)
  acc   = sum_dy B[dy]^T-contract U(dy)                        # (96, R*Wp)
  y     = fold_dx(acc) * scale + bias; relu; mask              # VPU
  dst[:, t0*Wp : (t0+R)*Wp] = y                                # (CO, R*Wp)

where B[dy] is the (3C, (dx,co)=96) repack of the 3x3x3 kernel. The MXU
sees K = 3C (96 or 192), N = 96, M = R*Wp (~10k: the streaming dim). The
row batching is what the first (row-serial) version of this kernel lacked —
it measured 5.9% MFU because each (96, Wp) matmul paid a full VPU+loop
latency. The y/h taps are lane-segment offsets inside VMEM (free); the x
taps cost two lane rolls whose wrap-around garbage crosses row segments
only at columns 0 / Wp-1, inside the masked WPAD region — so SAME zero
padding survives the row flattening. The intermediate T never touches HBM:
per flagship tile that removes a ~2 GB activation round-trip plus every
conv<->BN layout transition.

Grid: (h_splits, D) — z innermost, so VMEM scratch carries a 4-plane input
ring (filled by one async DMA per step, prefetched one step ahead) and a
3-plane T ring across z steps. h_splits bounds VMEM; the splits re-read
overlapping input rows but recompute nothing. Strips overlap-recompute at
the tail (t0 clamped to n_rows - R): writes are idempotent because taps
come only from the source ring, never from the destination.

The kernel computes the same function as
    relu(affine2(conv2(relu(affine1(conv1(x))))))
with SAME zero padding, f32 accumulation in the matmuls, affine+ReLU in
f32, rounding to the storage dtype at T and at the output — the same two
rounding points as the XLA eval path; residual bf16 differences come only
from reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CO = 32          # output channels of every full-res conv in the flagship net
WPAD = 16        # left/right w padding (keeps interior slices tile-aligned)
CI_ALIGN = 16    # sublane tile: pad input channels up to this (bf16 tiling)


def fold_bn_affine(bn: dict, eps: float = 1e-5):
    """flax BatchNorm eval collection -> per-channel (scale, bias) f32."""
    inv = 1.0 / np.sqrt(np.asarray(bn["var"], np.float64) + eps)
    scale = np.asarray(bn["scale"], np.float64) * inv
    bias = (np.asarray(bn["bias"], np.float64)
            - np.asarray(bn["mean"], np.float64) * scale)
    return (jnp.asarray(scale, jnp.float32), jnp.asarray(bias, jnp.float32))


def pack_weights_33(w: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(3,3,3,Ci,Co) -> (3, 3*Ci, 3*Co): B[dy][(dz,ci),(dx,co)] = w[dz,dy,dx,ci,co]."""
    kd, kh, kw, ci, co = w.shape
    assert (kd, kh, kw) == (3, 3, 3), w.shape
    return w.transpose(1, 0, 3, 2, 4).reshape(3, 3 * ci, 3 * co).astype(dtype)


def _conv_pass(src_ring, slots, B_ref, sb_ref, dst_write, *, n_rows, wp, R,
               wmask, row_base=None, hparams=None, dtype=jnp.bfloat16):
    """One fused conv+affine+relu pass over a z-plane, R rows per strip.

    src_ring: VMEM ref (S, Ci, rows_src*wp), rows_src = n_rows + 2 (h halo);
    slots: plane indices for taps dz = 0,1,2; B_ref: (3, 3*Ci, 3*CO);
    sb_ref: (2*CO, 1) f32 affine. dst rows [t0, t0+R) are the conv of src
    rows [t0, t0+R+2). wmask: (1, R*wp) f32 valid-W mask. row_base/hparams
    (conv1 only): rows mapping outside [0, H) are zeroed — row_base is the
    (1, R*wp) int32 lane -> row-within-strip table, hparams = (h0_global, H).
    """
    s0, s1, s2 = slots
    Rwp = R * wp
    scale = sb_ref[0:CO]   # (CO, 1) f32
    bias = sb_ref[CO:2 * CO]
    dn = (((0,), (0,)), ((), ()))  # contract dim0 x dim0 -> (3CO, R*wp)

    # strips unrolled in Python: n_rows/R are static, so every lane offset
    # is a compile-time constant — Mosaic emits direct vector loads instead
    # of dynamic-offset slices (measured ~5x on the strip loop)
    for i in range(-(-n_rows // R)):
        t0 = min(i * R, n_rows - R)

        def u(dy):
            off = (t0 + dy) * wp
            return jnp.concatenate(
                [src_ring[s0, :, pl.ds(off, Rwp)],
                 src_ring[s1, :, pl.ds(off, Rwp)],
                 src_ring[s2, :, pl.ds(off, Rwp)]], axis=0)  # (3Ci, R*wp)

        acc = lax.dot_general(B_ref[0], u(0), dn,
                              preferred_element_type=jnp.float32)
        acc += lax.dot_general(B_ref[1], u(1), dn,
                               preferred_element_type=jnp.float32)
        acc += lax.dot_general(B_ref[2], u(2), dn,
                               preferred_element_type=jnp.float32)
        # dx fold: y[co, w] = acc[(0,co), w-1] + acc[(1,co), w] + acc[(2,co), w+1]
        y = (pltpu.roll(acc[0:CO], 1, axis=1)
             + acc[CO:2 * CO]
             + pltpu.roll(acc[2 * CO:3 * CO], Rwp - 1, axis=1))
        mask = wmask
        if row_base is not None:
            h0g, H = hparams
            g = row_base + (h0g - 1 + t0)   # global h of each lane's row
            mask = mask * ((g >= 0) & (g < H)).astype(jnp.float32)
        y = jnp.maximum(y * scale + bias, 0.0) * mask
        dst_write(t0, y.astype(dtype))


def _kernel(xp_hbm, B1_hbm, sb1_hbm, B2_hbm, sb2_hbm, out_hbm,
            xp_ring, t_ring, out_buf, B1_ref, sb1_ref, B2_ref, sb2_ref,
            dma_sems, out_sems, w_sems,
            *, D, H, W, Hh, wp, R, dtype, ablate=frozenset()):
    """Grid (h_splits, D); EVERY HBM operand is memory_space=ANY and moves
    through manual double-buffered DMA. An earlier version used a pipelined
    out BlockSpec; Mosaic's per-step block staging cost ~107 us/step — an
    empty body measured 12 ms on the flagship block — so the output pipeline
    is hand-rolled, per the double-buffering pattern. (A fully in-kernel z
    loop compiled >14 min; the grid form compiles in ~1 min.)

    The weights/affines ride the same rule (r4): as VMEM-BlockSpec inputs
    Mosaic re-staged all ~110 KB of them EVERY grid step — the ablation
    bench measured a 9.8 ms pure-grid floor (~87 us/step) on the r3 block
    with a completely empty body, which is exactly those copies. They are
    now DMA'd ONCE into persistent scratch at the first grid step
    (benchmarks/convblock_floor.py 'body,in_dma,out_dma' leg: 9.8 ms ->
    ~0.1 ms).
    """
    s_idx = pl.program_id(0)
    z = pl.program_id(1)
    h0 = s_idx * Hh
    rows_in = Hh + 4

    # one-time weight staging (first grid step; scratch persists after)
    @pl.when((s_idx == 0) & (z == 0))
    def _():
        cps = [pltpu.make_async_copy(src, dst, w_sems.at[i])
               for i, (src, dst) in enumerate(
                   ((B1_hbm, B1_ref), (sb1_hbm, sb1_ref),
                    (B2_hbm, B2_ref), (sb2_hbm, sb2_ref)))]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    # ablation knobs (floor decomposition, benchmarks/convblock_floor.py):
    # "in_dma"/"out_dma"/"body" turn the respective stage into a no-op so the
    # per-grid-step structural cost can be attributed. Output is garbage
    # under any ablation — timing only.
    class _NoopDma:
        def start(self):
            pass

        def wait(self):
            pass

    def copy_plane(plane, slot):
        if "in_dma" in ablate:
            return _NoopDma()
        return pltpu.make_async_copy(
            xp_hbm.at[plane, :, pl.ds(h0 * wp, rows_in * wp)],
            xp_ring.at[slot],
            dma_sems.at[slot],
        )

    def out_dma(z, slot):
        if "out_dma" in ablate:
            return _NoopDma()
        return pltpu.make_async_copy(
            out_buf.at[slot],
            out_hbm.at[z, :, pl.ds(h0 * wp, Hh * wp)],
            out_sems.at[slot],
        )

    R1 = min(R, Hh + 2)
    R2 = min(R, Hh)

    def make_mask(Rn):
        lane = lax.broadcasted_iota(jnp.int32, (1, Rn * wp), 1)
        w_in = lane % wp
        wm = ((w_in >= WPAD) & (w_in < WPAD + W)).astype(jnp.float32)
        return wm, lane // wp

    wm1, rows1 = make_mask(R1)
    wm2 = wm1 if R2 == R1 else make_mask(R2)[0]

    def conv1_into(j):
        """T(j) <- conv1(xp planes j..j+2) for j in [0, D), else zeros."""
        slot = j % 3
        if "body" in ablate:
            return

        @pl.when(j < D)
        def _():
            def write(t0, rows):
                t_ring[slot, :, pl.ds(t0 * wp, R1 * wp)] = rows

            _conv_pass(
                xp_ring, (j % 4, (j + 1) % 4, (j + 2) % 4), B1_ref, sb1_ref,
                write, n_rows=Hh + 2, wp=wp, R=R1, wmask=wm1,
                row_base=rows1, hparams=(h0, H), dtype=dtype)

        @pl.when(j >= D)
        def _():
            t_ring[slot] = jnp.zeros((CO, (Hh + 2) * wp), dtype)

    # ---- bootstrap (per h-split): planes 0..2 resident, 3 in flight ----
    @pl.when(z == 0)
    def _():
        for p in range(3):
            copy_plane(p, p).start()
        for p in range(3):
            copy_plane(p, p).wait()
        copy_plane(3, 3).start()
        t_ring[2] = jnp.zeros((CO, (Hh + 2) * wp), dtype)  # T(-1), slot (-1)%3
        conv1_into(0)
        copy_plane(3, 3).wait()
        if D > 1:
            copy_plane(4, 0).start()

    @pl.when(z > 0)
    def _():
        # input: wait plane z+3 (conv1_into(z+1) taps z+1..z+3), prefetch z+4
        copy_plane(z + 3, (z + 3) % 4).wait()

        @pl.when(z + 1 < D)
        def _():
            copy_plane(z + 4, (z + 4) % 4).start()

    conv1_into(z + 1)

    # output slot z%2: drain the DMA that used it two planes ago
    @pl.when(z >= 2)
    def _():
        out_dma(z - 2, z % 2).wait()

    def write_out(t0, rows):
        out_buf[z % 2, :, pl.ds(t0 * wp, R2 * wp)] = rows

    if "body" not in ablate:
        _conv_pass(
            t_ring, ((z + 2) % 3, z % 3, (z + 1) % 3), B2_ref, sb2_ref,
            write_out, n_rows=Hh, wp=wp, R=R2, wmask=wm2, dtype=dtype)
    out_dma(z, z % 2).start()

    @pl.when(z == D - 1)
    def _():
        if D >= 2:
            out_dma(D - 2, (D - 2) % 2).wait()
        out_dma(D - 1, (D - 1) % 2).wait()


def _vmem_bytes(Hh, wp, ci, R, dtype):
    b = jnp.dtype(dtype).itemsize
    xp = 4 * (Hh + 4) * wp * ci * b
    tr = 3 * (Hh + 2) * wp * CO * b
    out = 2 * Hh * wp * CO * b            # double-buffered out block
    Rn = min(R, Hh + 2)
    tmp = Rn * wp * (3 * ci * b + 6 * CO * 4 + CO * b)  # u + acc/y + rolls
    return xp + tr + out + tmp


def _pick_h_split(H, wp, ci, R, dtype, budget=68 * 1024 * 1024):
    # budget < the 100MB vmem_limit: Mosaic's scoped accounting adds the
    # strip temporaries' live ranges (~20-25MB) on top of the named scratch
    for s in (1, 2, 4, 8, 16):
        if H % s == 0 and _vmem_bytes(H // s, wp, ci, R, dtype) <= budget:
            return s
    raise ValueError(f"no h-split fits VMEM for H={H}, Wp={wp}, Ci={ci}")


def pad_flat(y, wp: int):
    """Flat-layout SAME padding: (D, C, H*wp) -> (D+4, C, (H+4)*wp).

    Identical values to ``pad(..., ((1,3),(0,0),(2,2),(0,0)))`` on the 4-D
    view followed by the row flatten — but expressed directly on the flat
    layout, where the h pad is a MINOR-DIM pad by 2*wp (a whole number of
    (8,128) lane tiles): XLA emits one pad copy and NO relayout. The 4-D
    route costs pad + copy + materializing reshape ≈ 3 x 3.3 ms per GB at
    the flagship tile (Perfetto, r4) — this is the cheap chaining link
    between fused blocks (``flat_in``/``flat_out``).
    """
    return jnp.pad(y, ((1, 3), (0, 0), (2 * wp, 2 * wp)))


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "compute_dtype", "h_splits", "keep_wpad",
                     "valid_w", "row_strip", "ablate", "flat_in", "flat_out"))
def fused_convblock_chw(x, w1, s1, b1, w2, s2, b2, *,
                        interpret: bool = False, compute_dtype="bfloat16",
                        h_splits: int | None = None, keep_wpad: bool = False,
                        valid_w: int | None = None, row_strip: int = 16,
                        ablate: str = "", flat_in: tuple | None = None,
                        flat_out: bool = False):
    """relu(aff2(conv2(relu(aff1(conv1(x)))))) for 3x3x3 SAME convs, Co=32.

    x: (D, Ci, H, W) — channel-second layout (use `to_chw`/`from_chw` to
    convert DHWC tensors). w1: (3,3,3,Ci,CO); w2: (3,3,3,CO,CO); s*/b*:
    (CO,) f32 folded-BN affines (fold_bn_affine). Returns (D, CO, H, W) in
    the same layout. Inference only (no VJP).

    Chaining: with ``keep_wpad=True`` the result keeps the lane-padded W
    (zeros outside the valid window) and can feed the next call directly
    with ``valid_w=<true W>`` — the W re-pad between chained blocks is
    skipped (the masked zeros ARE the SAME padding).

    Flat chaining (r4, the fast path): ``flat_out=True`` returns the raw
    kernel layout (D, CO, H*wp) with no reshape (the 4-D reshape is a
    materializing relayout — ~3.3 ms/GB); ``flat_in=(H, wp, W)`` accepts
    (D+4, Ci, (H+4)*wp) input ALREADY padded by :func:`pad_flat`. A chain
    link is then ``pad_flat(block(...flat_out=True), wp)`` — one pad copy
    instead of pad + copy + reshape.
    """
    dtype = jnp.dtype(compute_dtype)
    if flat_in is not None:
        H, wp, W = flat_in
        Dp, ci, flat = x.shape
        D = Dp - 4
        assert flat == (H + 4) * wp, (x.shape, flat_in)
        assert ci % CI_ALIGN == 0, "flat_in requires pre-aligned channels"
        assert w1.shape[:4] == (3, 3, 3, ci), (w1.shape, x.shape)
        assert w2.shape == (3, 3, 3, CO, CO), w2.shape
        splits = h_splits or _pick_h_split(H, wp, ci, row_strip, dtype)
        Hh = H // splits
        xq = x.astype(dtype)
    else:
        D, ci, H, Wfull = x.shape
        if valid_w is not None:
            if Wfull % 128:
                raise ValueError("valid_w requires a lane-padded input")
            W, wp, prepadded = valid_w, Wfull, True
        else:
            W = Wfull
            wp = -(-(W + 2 * WPAD) // 128) * 128
            prepadded = False
        assert w1.shape[:4] == (3, 3, 3, ci), (w1.shape, x.shape)
        assert w2.shape == (3, 3, 3, CO, CO), w2.shape
        if ci % CI_ALIGN:  # Mosaic sublane tiling: pad ci with zero channels
            cpad = CI_ALIGN - ci % CI_ALIGN
            x = jnp.pad(x, ((0, 0), (0, cpad), (0, 0), (0, 0)))
            w1 = jnp.pad(w1, ((0, 0),) * 3 + ((0, cpad), (0, 0)))
            ci += cpad
        splits = h_splits or _pick_h_split(H, wp, ci, row_strip, dtype)
        Hh = H // splits

        # pad: z by (1, 3): +1 SAME front, +1 SAME back, +2 DMA prefetch
        # overrun; h by (2, 2): conv2's T halo needs conv1 one row further out
        wpads = (0, 0) if prepadded else (WPAD, wp - W - WPAD)
        xp = jnp.pad(x.astype(dtype), ((1, 3), (0, 0), (2, 2), wpads))
        xq = xp.reshape(D + 4, ci, (H + 4) * wp)  # rows flattened into lanes

    B1 = pack_weights_33(w1, dtype)
    B2 = pack_weights_33(w2, dtype)
    sb1 = jnp.concatenate([s1, b1]).astype(jnp.float32)[:, None]
    sb2 = jnp.concatenate([s2, b2]).astype(jnp.float32)[:, None]

    kern = functools.partial(
        _kernel, D=D, H=H, W=W, Hh=Hh, wp=wp, R=row_strip, dtype=dtype,
        ablate=frozenset(a for a in ablate.split(",") if a))
    out = pl.pallas_call(
        kern,
        grid=(splits, D),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((D, CO, H * wp), dtype),
        scratch_shapes=[
            pltpu.VMEM((4, ci, (Hh + 4) * wp), dtype),
            pltpu.VMEM((3, CO, (Hh + 2) * wp), dtype),
            pltpu.VMEM((2, CO, Hh * wp), dtype),
            pltpu.VMEM((3, 3 * ci, 3 * CO), dtype),
            pltpu.VMEM((2 * CO, 1), jnp.float32),
            pltpu.VMEM((3, 3 * CO, 3 * CO), dtype),
            pltpu.VMEM((2 * CO, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, B1, sb1, B2, sb2)
    if flat_out:
        return out                       # (D, CO, H*wp), kernel layout
    out = out.reshape(D, CO, H, wp)
    if keep_wpad or flat_in is not None:
        return out
    return out[:, :, :, WPAD:WPAD + W] if not prepadded else out


def to_chw(x):
    """(D, H, W, C) -> (D, C, H, W)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def from_chw(x):
    """(D, C, H, W) -> (D, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def fused_convblock(x, w1, s1, b1, w2, s2, b2, **kw):
    """DHWC-boundary wrapper: (D, H, W, Ci) -> (D, H, W, CO).

    The transposes at the boundary are XLA relayouts; production callers
    (models/fused_eval.py) chain chw-layout kernels instead and convert once.
    """
    return from_chw(fused_convblock_chw(to_chw(x), w1, s1, b1, w2, s2, b2, **kw))


def reference_convblock(x, w1, s1, b1, w2, s2, b2, compute_dtype="bfloat16"):
    """XLA reference of the same function (f32 conv accum, storage-dtype
    rounding at the same two points) for parity tests."""
    dtype = jnp.dtype(compute_dtype)

    def one(x, w, s, b):
        y = lax.conv_general_dilated(
            x[None].astype(dtype), w.astype(dtype),
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )[0]
        return jnp.maximum(y * s + b, 0.0).astype(dtype)

    return one(one(x, w1, s1, b1), w2, s2, b2)
