"""Shared CLI plumbing: config loading + dotted overrides (SURVEY.md C15)."""

from __future__ import annotations

import argparse
import json
from tpuseg.core import Config


def add_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None,
                   help="JSON config file (defaults used if omitted)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="dotted config override, e.g. --set train.lr=3e-4 "
                        "--set infer.tile=[32,128,128] (repeatable)")


def load_config(args) -> Config:
    cfg = Config()
    if args.config:
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    if args.overrides:
        kv = {}
        for item in args.overrides:
            key, _, val = item.partition("=")
            if not _:
                raise SystemExit(f"--set expects KEY=VALUE, got {item!r}")
            try:
                kv[key] = json.loads(val)
            except json.JSONDecodeError:
                kv[key] = val  # bare string
        cfg = cfg.override(**kv)
    return cfg


def load_variables(ckpt: str, model, cfg: Config):
    """Checkpoint-in contract: accept either a torch ``.pth`` (reference
    format) or an Orbax checkpoint directory."""
    import jax

    if ckpt.endswith((".pth", ".pt")):
        from tpuseg.ckpt import load_pth_checkpoint

        return load_pth_checkpoint(ckpt)
    from tpuseg.ckpt import CheckpointManager
    from tpuseg.models import init_variables

    template = init_variables(model, jax.random.key(0),
                              patch_shape=cfg.data.patch_size)
    mgr = CheckpointManager(ckpt)
    params = mgr.restore_params(template["params"])
    out = {"params": params}
    if "batch_stats" in template:
        import orbax.checkpoint as ocp

        step = mgr.latest_step()
        res = mgr.mgr.restore(
            step,
            args=ocp.args.Composite(
                batch_stats=ocp.args.StandardRestore(template["batch_stats"])
            ),
        )
        out["batch_stats"] = res["batch_stats"]
    return out


def bootstrap_runtime() -> None:
    """Process-level runtime setup for every CLI entry point: multi-host
    ``jax.distributed`` bootstrap when the TPUSEG_COORDINATOR /
    TPUSEG_NUM_PROCESSES / TPUSEG_PROCESS_ID environment is present
    (parallel/multihost.py — a no-op single-process), then the persistent
    XLA compilation cache."""
    from tpuseg.parallel.multihost import initialize
    from tpuseg.utils.cache import enable_compilation_cache

    initialize()
    enable_compilation_cache()
