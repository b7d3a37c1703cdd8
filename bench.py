"""North-star benchmark (BASELINE.json): end-to-end fused inference
Mvoxels/sec/chip (net + post-proc) on a full microscopy-stack-sized volume,
bf16 compute, everything on device (config 3).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mvox/s", "vs_baseline": N}

vs_baseline = measured TPU Mvox/s / measured CPU-reference Mvox/s
(torch-CPU sliding window + scipy post-proc, benchmarks/cpu_reference.py —
the NORTH-STAR target is >= 5). The CPU denominator is measured once and
cached in BASELINE_CPU.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPU_BASELINE_PATH = os.path.join(REPO, "BASELINE_CPU.json")
VOLUME_SHAPE = (96, 512, 512)  # NORTH-STAR config 2/3 stack size


def get_cpu_baseline() -> dict:
    if os.path.exists(CPU_BASELINE_PATH):
        with open(CPU_BASELINE_PATH) as f:
            return json.load(f)
    from benchmarks.cpu_reference import run_cpu_reference
    from tpuseg.data import synthesize_volume

    # measured on a sub-volume (per-voxel cost is flat across sizes); full
    # 25-MVoxel stack on this 1-core host would take ~an hour
    vol = synthesize_volume(shape=(32, 256, 256), num_instances=40, seed=0)
    res = run_cpu_reference(vol.image)
    with open(CPU_BASELINE_PATH, "w") as f:
        json.dump(res, f, indent=2)
    return res


def main():
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.core import Config, InferConfig
    from tpuseg.data import synthesize_volume
    from tpuseg.infer import make_infer_fn
    from tpuseg.models import build_model, init_variables

    cpu = get_cpu_baseline()

    # tile/batch tuned on-chip: (48,256,256) tb=2 cuts halo overcompute to
    # 2.1x and beat (32,128,128) tb=4/8 by ~20-40% in the perf probes
    cfg = Config(infer=InferConfig(tile=(48, 256, 256), halo=16, tile_batch=2,
                                   compute_dtype="bfloat16"))
    model = build_model(cfg.model)
    variables = init_variables(model, jax.random.key(0),
                               patch_shape=cfg.data.patch_size)
    vol = synthesize_volume(shape=VOLUME_SHAPE, num_instances=600,
                            radius_range=(5.0, 10.0), seed=0)
    v = jnp.asarray(vol.image)

    infer = make_infer_fn(model, cfg)

    def run_synced():
        lab = infer(variables, v)
        # on the axon platform block_until_ready returns before execution
        # finishes; a 1-element device_get is the only reliable sync
        np.asarray(lab.ravel()[0])
        return lab

    labels = run_synced()  # compile + warmup

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_synced()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    mvox_s = v.size / dt / 1e6
    result = {
        "metric": "e2e_fused_infer_mvox_per_s_per_chip",
        "value": round(mvox_s, 3),
        "unit": "Mvox/s",
        "vs_baseline": round(mvox_s / cpu["mvox_per_s"], 3),
        "detail": {
            "volume": list(VOLUME_SHAPE),
            "t_e2e_s": round(dt, 4),
            "n_instances": int(np.asarray(labels).max()),
            "cpu_ref_mvox_per_s": round(cpu["mvox_per_s"], 4),
            "device": str(jax.devices()[0]),
            "compute_dtype": cfg.infer.compute_dtype,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
