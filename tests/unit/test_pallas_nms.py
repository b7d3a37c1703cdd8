"""Pallas fused peak NMS == XLA reference implementation (ops/pallas_nms.py).

Runs in Pallas interpret mode on the CPU test platform; the compiled TPU path
is exercised by bench/verify drives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpuseg.ops.pallas_nms import pallas_peak_nms
from tpuseg.ops.peaks import peak_nms


def _cases():
    rng = np.random.default_rng(0)
    yield "random", rng.random((16, 256, 64)).astype(np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in (16, 256, 64)],
                             indexing="ij")
    blobs = np.zeros((16, 256, 64), np.float32)
    for c in [(4, 30, 30), (12, 200, 40), (8, 100, 10)]:
        blobs = np.maximum(
            blobs,
            np.exp(-((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) / 18.0),
        )
    yield "blobs", blobs
    plateau = np.zeros((16, 256, 64), np.float32)
    plateau[6:9, 40:44, 20:24] = 0.9  # exact ties exercise the tie-break
    yield "plateau", plateau


@pytest.mark.parametrize("radius", [1, 2, (1, 2, 2), (2, 1, 2)])
def test_pallas_nms_matches_xla(radius):
    with pltpu.force_tpu_interpret_mode():
        for name, vol in _cases():
            want = np.asarray(peak_nms(jnp.asarray(vol), 0.5, radius))
            got = np.asarray(pallas_peak_nms(jnp.asarray(vol), 0.5, radius,
                                             block=(8, 64)))
            assert np.array_equal(got, want), name


def test_fallback_on_awkward_shapes():
    vol = jnp.asarray(np.random.default_rng(1).random((10, 100, 64)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_peak_nms(vol, 0.5, 2))
    want = np.asarray(peak_nms(vol, 0.5, 2))
    assert np.array_equal(got, want)
