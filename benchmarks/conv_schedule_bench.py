"""Per-level conv schedule sweep on the real chip (round-3 diagnostic).

ARCHITECTURE.md "Why the net sweep is at its ceiling" proves the Cout=32
full-res convs run at 98% of their 25% MXU lane ceiling under XLA's zpack
schedule — but the whole-net MFU (16.2%) is below even a FLOP-weighted mix
of the measured per-conv rates, and the half-res 64->64 conv measured only
17.6% against a 50% lane ceiling. This sweep times EVERY distinct
(level shape, Ci, Co) conv of the flagship U-Net under all three schedules
(zpack / zdecomp / native 3D) so the per-level winner can be pinned rather
than one global `conv_impl`.

Timing: each measured program chains R conv applications through a scalar
data dependence (so XLA cannot hoist or dedupe them) and is synced via a
1-element device_get (axon's block_until_ready returns early); the ~30 ms
per-call sync overhead is measured on an identity program and subtracted.

Usage: python benchmarks/conv_schedule_bench.py [--reps 8] [--out FILE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_BF16_FLOPS = 197e12  # v5e


def main():
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpuseg.models.conv3d import conv3d_zdecomp, conv3d_zpack

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    R = args.reps

    def sync(x):
        np.asarray(jax.numpy.ravel(x)[0])

    # flagship tile (96,256,256) + halo 8 -> padded (112,272,272); Down halves
    L0 = (1, 112, 272, 272)
    L1 = (1, 56, 136, 136)
    L2 = (1, 28, 68, 68)
    L3 = (1, 14, 34, 34)
    # (name, shape, ci, co, kernel) — every distinct conv of the flagship
    # U-Net (features 32/64/128/256): ConvBlock 3x3x3 pairs, the Up blocks'
    # concat convs (2f -> f), and the 2x2x2 up_conv / stride-2 down convs.
    CASES = [
        ("enc0_c1", L0, 1, 32, (3, 3, 3), (1, 1, 1)),
        ("enc0_c2", L0, 32, 32, (3, 3, 3), (1, 1, 1)),
        ("up0_cat", L0, 64, 32, (3, 3, 3), (1, 1, 1)),
        ("up0_up2x", L0, 64, 32, (2, 2, 2), (1, 1, 1)),
        ("down0", L0, 32, 64, (2, 2, 2), (2, 2, 2)),
        ("enc1_c2", L1, 64, 64, (3, 3, 3), (1, 1, 1)),
        ("up1_cat", L1, 128, 64, (3, 3, 3), (1, 1, 1)),
        ("up1_up2x", L1, 128, 64, (2, 2, 2), (1, 1, 1)),
        ("enc2_c2", L2, 128, 128, (3, 3, 3), (1, 1, 1)),
        ("up2_cat", L2, 256, 128, (3, 3, 3), (1, 1, 1)),
        ("bottleneck", L3, 256, 256, (3, 3, 3), (1, 1, 1)),
    ]
    IMPLS = {
        "zpack": conv3d_zpack,
        "zdecomp": conv3d_zdecomp,
        "native": lambda x, k, strides=(1, 1, 1): lax.conv_general_dilated(
            x, k, window_strides=strides, padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
    }

    # sync overhead on an identity program
    ident = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    sync(ident(z))
    t0s = []
    for _ in range(5):
        t = time.perf_counter()
        sync(ident(z))
        t0s.append(time.perf_counter() - t)
    overhead = sorted(t0s)[len(t0s) // 2]
    print(f"sync overhead: {overhead*1e3:.1f} ms", file=sys.stderr)

    def make_prog(impl_fn, out_shape, dtype):
        @jax.jit
        def prog(x, k):
            def body(i, carry):
                _, dep = carry
                xi = x.at[(0,) * x.ndim].add(dep.astype(x.dtype))
                y = impl_fn(xi, k)
                # tiny-but-nonzero so XLA cannot fold the dependence away
                return y, y.reshape(-1)[0].astype(jnp.float32) * jnp.float32(1e-30)
            y, dep = lax.fori_loop(
                0, R, body, (jnp.zeros(out_shape, dtype), jnp.float32(0.0)))
            return y.reshape(-1)[0] + dep
        return prog

    results = []
    key = jax.random.PRNGKey(0)
    for name, shp, ci, co, ksz, strides in CASES:
        n, d, h, w = shp
        x = jax.random.normal(key, (n, d, h, w, ci), jnp.bfloat16)
        k = jax.random.normal(key, (*ksz, ci, co), jnp.bfloat16) * 0.05
        out_vox = n * (d // strides[0]) * (h // strides[1]) * (w // strides[2])
        flops = 2.0 * out_vox * ksz[0] * ksz[1] * ksz[2] * ci * co
        row = {"case": name, "shape": list(shp), "ci": ci, "co": co,
               "kernel": list(ksz), "strides": list(strides),
               "gflop": flops / 1e9, "ms": {}, "mfu": {}}
        oshape = (n, d // strides[0], h // strides[1], w // strides[2], co)
        for iname, ifn in IMPLS.items():
            prog = make_prog(lambda x_, k_, _f=ifn: _f(x_, k_, strides),
                             oshape, jnp.bfloat16)
            try:
                sync(prog(x, k))  # compile + warm
                ts = []
                for _ in range(3):
                    t = time.perf_counter()
                    sync(prog(x, k))
                    ts.append(time.perf_counter() - t)
                t_med = sorted(ts)[1]
                per = max((t_med - overhead) / R, 1e-9)
                row["ms"][iname] = round(per * 1e3, 3)
                row["mfu"][iname] = round(flops / per / PEAK_BF16_FLOPS, 4)
            except Exception as e:  # OOM etc — record and continue
                row["ms"][iname] = None
                row["mfu"][iname] = str(e)[:80]
        best = min((v, n_) for n_, v in row["ms"].items() if v is not None)
        row["best"] = best[1]
        print(f"{name:12s} ci={ci:3d} co={co:3d} " + "  ".join(
            f"{iname}:{row['ms'][iname]}ms/{row['mfu'][iname]}"
            for iname in IMPLS) + f"  -> {best[1]}", file=sys.stderr)
        results.append(row)

    out = {"reps": R, "overhead_ms": overhead * 1e3, "cases": results}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
