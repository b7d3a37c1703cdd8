"""Data-parallel training over a device mesh (NORTH-STAR config 4).

The reference is single-GPU (SURVEY.md §2: DP `[ABSENT]`); this is the
additive TPU-native story: ``shard_map`` over a 1-D ``Mesh(('data',))`` with
the global batch sharded on axis 0, parameters/optimizer state replicated,
and gradients ``pmean``-ed over ICI inside the mapped step — the XLA
collective replacing any NCCL all-reduce.

Under jit, XLA compiles the psum onto the ICI ring; on the CPU test platform
the same code runs on 8 virtual devices (tests/distributed/).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tpuseg.core import Config
from tpuseg.train.step import make_train_step


def make_data_mesh(axis: str = "data", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_dp_train_step(model, cfg: Config, mesh: Mesh):
    """jitted (state, batch, rng) -> (state, metrics) with batch axis sharded
    over the mesh's data axis; state replicated; grads pmean'd inside.

    The model is rebuilt with ``bn_axis`` bound to the mesh axis so BatchNorm
    statistics are computed over the GLOBAL batch (pmean over ICI), keeping
    DP training numerically identical to single-device (tests/distributed/).
    """
    axis = mesh.axis_names[0]
    if getattr(model, "bn_axis", None) != axis and model.config.norm == "batch":
        from tpuseg.models import build_model

        model = build_model(model.config, bn_axis=axis)
    inner = make_train_step(model, cfg, axis_name=axis,
                            grad_accum=cfg.train.grad_accum)

    def mapped(state, batch, rng):
        # same PRNG on all shards; per-example augmentation keys come from
        # the GLOBAL example index inside the step (train.step.prepare_batch),
        # so augmented DP training equals single-device exactly
        return inner(state, batch, rng)

    smapped = shard_map(
        mapped,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(smapped, donate_argnums=(0,))


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh):
    """Place a host batch with its leading axis sharded over the data axis.

    Multi-process safe: every process passes the same GLOBAL batch (the
    sampler is a pure function of (seed, step), so all hosts can cheaply
    draw it) and uploads only its addressable examples
    (parallel.multihost.put_global)."""
    axis = mesh.axis_names[0]
    from tpuseg.parallel.multihost import put_global

    return {k: put_global(v, mesh, P(axis)) for k, v in batch.items()}
