"""Backend-safe in-graph diagnostics.

``jax.debug.print`` lowers to a host callback; the axon tunnel PJRT used in
this environment reports platform "tpu" but raises UNIMPLEMENTED for host
send/recv callbacks at RUN time — so any program carrying one dies on the
real chip (r4 regression found by benchmarks/aniso_train_ab.py). The helpers
here feature-probe the default backend ONCE (compile + run a trivial
callback) and turn the diagnostics into no-ops where callbacks cannot run.

Best-effort by design: the probe tests the DEFAULT backend, so a program
traced for a different backend inherits its answer. The guarded prints are
operator diagnostics (cap overflow, non-convergence), never load-bearing.
"""

from __future__ import annotations

import functools

import jax
from jax import lax


@functools.cache
def callbacks_supported() -> bool:
    """True iff the default backend can execute host callbacks.

    Identity check, NOT an execution probe: an inner ``jax.jit(...)()``
    does not actually hit the device when first invoked inside an active
    trace (where cond_print calls this), so a try/except probe reports
    True exactly where it matters most. The axon tunnel advertises itself
    in ``platform_version`` ("axon x.y.z; ..."), while reporting platform
    "tpu" — sniff that instead."""
    from jax._src import xla_bridge

    version = getattr(xla_bridge.get_backend(), "platform_version", "")
    return "axon" not in version


def cond_print(pred, fmt: str, **kwargs) -> None:
    """``if pred: print(fmt.format(**kwargs))`` inside jit — emitted only on
    backends where host callbacks work (no-op on the axon tunnel)."""
    if not callbacks_supported():
        return
    lax.cond(
        pred,
        lambda kw: jax.debug.print(fmt, **kw),
        lambda kw: None,
        kwargs,
    )
