"""Profiling hooks (SURVEY.md §5 tracing).

``trace`` wraps ``jax.profiler.trace`` (Perfetto-compatible traces under the
given dir); ``Timer`` is the block-until-ready timing harness used by the
benchmarks — it measures device time honestly by synchronizing on the result.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


def hard_sync(x):
    """Force completion of a computation.

    On the axon TPU platform ``jax.block_until_ready`` can return before
    execution finishes; transferring one element is the reliable barrier.
    """
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])
    return x


class Timer:
    """Median-of-k wall timer with device synchronization."""

    def __init__(self, sync=hard_sync):
        self.sync = sync

    def time(self, fn, *args, iters: int = 5, warmup: int = 2, **kw) -> float:
        for _ in range(warmup):
            self.sync(fn(*args, **kw))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            self.sync(fn(*args, **kw))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]
