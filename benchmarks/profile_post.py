"""Per-stage timing of the CURRENT default post-proc program on the
headline noise workload (bench.py's post split): sigmoid -> fg mask ->
peak NMS -> steepest direction codes -> Pallas chase -> Pallas flood ->
sort-based size filter. Each stage jitted separately and synced honestly
(utils.hard_sync). The r2 profiler (profile_stages.py) covers the XLA
fallback path; this one covers the TPU default.

Usage: python benchmarks/profile_post.py [D H W]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.core import Config
    from tpuseg.ops.filter import size_filter_and_compact
    from tpuseg.ops.neighbors import linear_index
    from tpuseg.ops.pallas_nms import pallas_peak_nms
    from tpuseg.ops.pallas_resolve import chase_resolve, flood_resolve
    from tpuseg.ops.peaks import peak_nms
    from tpuseg.ops.watershed import steepest_dir_codes
    from tpuseg.utils import hard_sync

    shape = tuple(int(a) for a in sys.argv[1:4]) or (96, 512, 512)
    if len(shape) != 3:
        shape = (96, 512, 512)
    pp = Config().postproc

    def timeit(fn, *args, reps=3):
        out = hard_sync(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = hard_sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2], out

    rng = np.random.default_rng(0)
    fg_logits = jnp.asarray(rng.normal(2.0, 1.5, shape).astype(np.float32))
    pk_logits = jnp.asarray(rng.normal(-1.0, 1.5, shape).astype(np.float32))

    sig = jax.jit(lambda a, b: (jax.nn.sigmoid(a), jax.nn.sigmoid(b)))
    res = {}
    res["t_sigmoid"], (fg_prob, pk_prob) = timeit(sig, fg_logits, pk_logits)

    nms_xla = jax.jit(lambda p, f: peak_nms(p, pp.peak_threshold,
                                            pp.nms_radius)
                      & (f >= pp.fg_threshold))
    nms_pal = jax.jit(lambda p, f: pallas_peak_nms(p, pp.peak_threshold,
                                                   pp.nms_radius)
                      & (f >= pp.fg_threshold))
    res["t_nms_xla"], seeds = timeit(nms_xla, pk_prob, fg_prob)
    try:
        res["t_nms_pallas"], seeds_p = timeit(nms_pal, pk_prob, fg_prob)
        res["nms_equal"] = bool(jnp.array_equal(seeds, seeds_p))
    except Exception as e:  # pallas path may not support the shape
        res["t_nms_pallas"] = f"failed: {type(e).__name__}"

    dirs_fn = jax.jit(lambda p, f, s: steepest_dir_codes(
        p, f >= pp.fg_threshold, self_sticky=s))
    res["t_dirs"], dirs = timeit(dirs_fn, pk_prob, fg_prob, seeds)

    @jax.jit
    def v0_fn(fg_prob, dirs, seeds):
        fg_mask = fg_prob >= pp.fg_threshold
        idx = linear_index(shape)
        return jnp.where(fg_mask & (dirs == 0),
                         jnp.where(seeds, idx + 1, -(idx + 1)),
                         0).astype(jnp.int32), fg_mask

    res["t_v0"], (v0, fg_mask) = timeit(v0_fn, fg_prob, dirs, seeds)
    res["t_chase"], v = timeit(jax.jit(chase_resolve), v0, dirs, fg_mask)
    pos = jax.jit(lambda v: jnp.maximum(v, 0))
    res["t_relu_labels"], labels0 = timeit(pos, v)
    flood = jax.jit(lambda l, m, p: flood_resolve(l, m, p, pp.flood_iters))
    res["t_flood"], labels = timeit(flood, labels0, fg_mask, fg_prob)
    filt = jax.jit(lambda l: size_filter_and_compact(l, pp.min_size))
    res["t_filter_sort"], final = timeit(filt, labels)

    total = sum(v for k, v in res.items()
                if k.startswith("t_") and isinstance(v, float)
                and k != "t_nms_pallas")
    if isinstance(res.get("t_nms_pallas"), float):
        total -= res["t_nms_pallas"]  # count only the default NMS
    res = {k: (round(t, 4) if isinstance(t, float) else t)
           for k, t in res.items()}
    res["t_sum_default_path"] = round(total, 4)
    res["n_instances"] = int(np.asarray(final).max())
    res["fg_fraction"] = round(float(jnp.mean(fg_mask)), 4)
    res["shape"] = list(shape)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
