"""Per-stage timing of the fused inference pipeline on the real chip.

Splits the north-star e2e time (bench.py) into: normalize, net sweep,
peak NMS, ascent (steepest-parent + pointer jumping), flood absorption,
size-filter/compact — each jitted separately and synced honestly. This is
the diagnostic behind the round-2 post-proc optimization work (VERDICT
"What's weak" #1: ~70% of e2e is post-proc).

Usage: python benchmarks/profile_stages.py [D H W]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sync(x):
    import numpy as np

    # axon platform: block_until_ready can return early; device_get syncs
    np.asarray(jax.numpy.ravel(x)[0])  # noqa: F821


def timeit(fn, *args, reps=3):
    import numpy as np

    out = fn(*args)
    jax.tree_util.tree_map(  # noqa: F821
        lambda l: np.asarray(l.ravel()[0]) if hasattr(l, "ravel") else l, out
    )
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(  # noqa: F821
            lambda l: np.asarray(l.ravel()[0]) if hasattr(l, "ravel") else l, out
        )
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], out


def main():
    global jax
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpuseg.core import Config, InferConfig
    from tpuseg.data import synthesize_volume
    from tpuseg.data.normalize import histogram_percentile_normalize
    from tpuseg.infer.tiles import tiled_forward
    from tpuseg.models import build_model, init_variables
    from tpuseg.ops import size_filter_and_compact
    from tpuseg.ops.peaks import peak_nms
    from tpuseg.ops.watershed import _steepest_parent, _pointer_jump, flood_labels

    shape = tuple(int(a) for a in sys.argv[1:4]) or (96, 512, 512)
    if len(shape) != 3:
        shape = (96, 512, 512)

    cfg = Config(infer=InferConfig(tile=(48, 256, 256), halo=16, tile_batch=2,
                                   compute_dtype="bfloat16"))
    model = build_model(cfg.model)
    variables = init_variables(model, jax.random.key(0),
                               patch_shape=cfg.data.patch_size)
    vol = synthesize_volume(shape=shape, num_instances=600,
                            radius_range=(5.0, 10.0), seed=0)
    v = jnp.asarray(vol.image)
    pp = cfg.postproc

    from tpuseg.core.dtypes import resolve

    @jax.jit
    def stage_norm(v):
        return histogram_percentile_normalize(v.astype(jnp.float32),
                                              cfg.data.normalize_pcts)

    @jax.jit
    def stage_net(variables, nv):
        out = tiled_forward(lambda vr, x: model.apply(vr, x), variables, nv,
                            tile=cfg.infer.tile, halo=cfg.infer.halo,
                            tile_batch=cfg.infer.tile_batch,
                            compute_dtype=resolve(cfg.infer.compute_dtype))
        return jax.nn.sigmoid(out["fg_logits"]), jax.nn.sigmoid(out["peak_logits"])

    @jax.jit
    def stage_nms(peak_prob, fg_prob):
        fg_mask = fg_prob >= pp.fg_threshold
        return peak_nms(peak_prob, pp.peak_threshold, pp.nms_radius) & fg_mask

    @jax.jit
    def stage_parent(peak_prob, fg_prob, seeds):
        fg_mask = fg_prob >= pp.fg_threshold
        return _steepest_parent(peak_prob, fg_mask, self_sticky=seeds)

    @partial(jax.jit, static_argnames=("rounds",))
    def stage_jump(parent, rounds):
        return _pointer_jump(parent.ravel(), rounds).reshape(parent.shape)

    @jax.jit
    def stage_drop_flood(root, seeds, fg_prob):
        fg_mask = fg_prob >= pp.fg_threshold
        labels = jnp.where(fg_mask, root + 1, 0).astype(jnp.int32)
        rootm1 = labels - 1
        root_is_seed = jnp.where(
            labels > 0, seeds.ravel()[rootm1.ravel()].reshape(labels.shape), False)
        labels = jnp.where(root_is_seed, labels, 0)
        return flood_labels(labels, fg_mask, fg_prob, pp.flood_iters)

    @jax.jit
    def stage_filter(labels):
        return size_filter_and_compact(labels, pp.min_size)

    res = {}
    res["t_norm"], nv = timeit(stage_norm, v)
    res["t_net"], (fg_prob, peak_prob) = timeit(stage_net, variables, nv)
    res["t_nms"], seeds = timeit(stage_nms, peak_prob, fg_prob)
    res["t_parent"], parent = timeit(stage_parent, peak_prob, fg_prob, seeds)
    res["t_jump8"], root = timeit(stage_jump, parent, 8)
    res["t_jump1"], _ = timeit(stage_jump, parent, 1)
    res["t_flood"], labels = timeit(stage_drop_flood, root, seeds, fg_prob)
    res["t_filter"], final = timeit(stage_filter, labels)

    total = sum(v for k, v in res.items() if k not in ("t_jump1",))
    res = {k: round(t, 4) for k, t in res.items()}
    res["t_sum"] = round(total, 4)
    res["mvox_s_sum"] = round(v.size / total / 1e6, 3)
    res["n_instances"] = int(jax.device_get(final).max())
    res["shape"] = list(shape)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
