"""Device-op breakdown of the c4 training step (fwd+bwd+update) on the
real chip — the diagnostic behind the r5 fused-training work (VERDICT r4
"next" #1: train MFU stagnant at 14.65% while the eval path got the Mosaic
ConvBlock treatment).

Builds the exact bench.py c4 step (native conv schedule, bf16, 8x64^3
uint16-fed batch), traces a few steps with jax.profiler (perfetto JSON),
and aggregates per-op device time so the layout taxes / conv split is
visible without a UI.

Usage: python benchmarks/profile_train.py [out.json]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from tpuseg.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax
    import numpy as np

    from tpuseg.core import Config
    from tpuseg.data import PatchSampler, synthesize_volume
    from tpuseg.models import build_model
    from tpuseg.train.step import create_train_state, make_train_step
    from tpuseg.utils import hard_sync

    cfg = Config()
    tcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_impl="native"))
    model = build_model(tcfg.model)
    state = create_train_state(model, tcfg, jax.random.key(0))
    step_fn = jax.jit(make_train_step(model, tcfg), donate_argnums=(0,))

    vol = synthesize_volume(shape=(96, 256, 256), num_instances=60, seed=0)
    vol16 = dataclasses.replace(
        vol, image=(np.clip(vol.image, 0, 1) * 65535).astype(np.uint16))
    sampler = PatchSampler([vol16], patch_size=cfg.data.patch_size,
                           batch_size=cfg.data.batch_size,
                           max_instances=cfg.data.max_instances)
    rng = jax.random.key(1)
    batch = jax.device_put(sampler.next_batch())
    state, metrics = step_fn(state, batch, rng)
    hard_sync(metrics["loss"])

    n, t0 = 10, time.perf_counter()
    for _ in range(n):
        state, metrics = step_fn(state, batch, rng)
    hard_sync(metrics["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"pure step: {dt * 1e3:.2f} ms")

    trace_dir = "/tmp/tpuseg_train_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for _ in range(3):
            state, metrics = step_fn(state, batch, rng)
        hard_sync(metrics["loss"])

    # aggregate device-track op durations from the perfetto JSON
    paths = glob.glob(f"{trace_dir}/**/*.json.gz", recursive=True)
    assert paths, f"no perfetto trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = re.sub(r"\d+", "#", e["name"])
            agg[name] += e["dur"]
            total += e["dur"]
    rows = [{"op": k, "ms_per_step": round(v / 3 / 1e3, 3),
             "pct": round(100 * v / max(total, 1), 1)}
            for k, v in agg.most_common(48)]
    out = {"step_ms": round(dt * 1e3, 2),
           "device_total_ms_per_step": round(total / 3 / 1e3, 2),
           "tracks": sorted(pid_names.values()),
           "top_ops": rows}
    dst = sys.argv[1] if len(sys.argv) > 1 else None
    s = json.dumps(out, indent=1)
    print(s)
    if dst:
        with open(dst, "w") as f:
            f.write(s)


if __name__ == "__main__":
    main()
