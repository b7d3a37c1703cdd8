"""Persistent XLA compilation cache.

In this environment TPU executables compile through a remote tunnel (~minutes
of wall time for the fused graphs, with near-zero local CPU); the persistent
cache makes every CLI/bench invocation after the first start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "TPUSEG_COMPILE_CACHE", os.path.expanduser("~/.cache/tpuseg_jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
