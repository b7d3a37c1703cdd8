"""Dtype policy: fp32 params, bf16 compute (NORTH-STAR: "bf16" configs 3-5).

On TPU the MXU natively consumes bf16 operands with fp32 accumulation; keeping
parameters in fp32 and casting activations/weights to bf16 at the conv sites is
the standard mixed-precision recipe. Parity tests flip compute to fp32.
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve(name: str):
    try:
        return _DTYPES[name]
    except KeyError:
        raise ValueError(f"unknown dtype name {name!r}; expected one of {list(_DTYPES)}")
