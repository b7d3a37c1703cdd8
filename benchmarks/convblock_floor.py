"""Decompose the Mosaic fused-ConvBlock per-grid-step structural floor
(VERDICT r3 next #2 / ARCHITECTURE "Mosaic fused ConvBlock").

r3 measured ~12 ms of empty-body cost per flagship block (~107 us/grid-step:
"Mosaic per-grid-step block staging + non-overlapped DMA") — the reason the
fused path loses e2e despite erasing the layout taxes. This script ablates
the kernel stage by stage (ops/pallas_convblock.py ``ablate=``):

  full                   — the real kernel
  body                   — DMAs + grid only (the r3 "empty body")
  body,out_dma           — input DMA + grid
  body,in_dma            — output DMA + grid
  body,in_dma,out_dma    — pure grid skeleton

Chained K times inside ONE jit (output feeds input) so the ~30 ms axon
dispatch sync amortizes away. Prints one JSON object of ms/block per case.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def measure(D, H, W, ci=32, K=8, reps=3, cases=None, row_strip=16,
            h_splits=None):
    from tpuseg.ops.pallas_convblock import CO, WPAD, fused_convblock_chw
    from tpuseg.utils.profiling import hard_sync

    wp = -(-(W + 2 * WPAD) // 128) * 128
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((D, ci, H, wp)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, ci, CO)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, CO, CO)) * 0.1, jnp.float32)
    s = jnp.ones((CO,), jnp.float32)
    b = jnp.zeros((CO,), jnp.float32)

    cases = cases or ["full", "body", "body,out_dma", "body,in_dma",
                      "body,in_dma,out_dma"]
    out = {}
    for case in cases:
        ablate = "" if case == "full" else case

        @functools.partial(jax.jit, static_argnames=())
        def chained(x):
            def step(i, acc):
                y = fused_convblock_chw(
                    acc, w1, s, b, w2, s, b, valid_w=W, keep_wpad=True,
                    row_strip=row_strip, h_splits=h_splits, ablate=ablate)
                # keep shapes chainable: output CO == input ci required
                return y

            return lax.fori_loop(0, K, step, x)

        assert ci == 32, "chaining needs ci == CO"
        r = chained(x0)
        hard_sync(r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chained(x0)
            hard_sync(r)
            best = min(best, time.perf_counter() - t0)
        out[case] = round(best / K * 1e3, 3)
    return out


def main():
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    res = {}
    for name, (D, H, W) in {
        "r3_block_56x272x528": (56, 272, 528),
        "flagship_96x256x512": (96, 256, 512),
    }.items():
        res[name] = measure(D, H, W)
        print(f"[{name}] {json.dumps(res[name])}", file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
