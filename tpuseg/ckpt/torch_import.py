"""`.pth` checkpoint import: torch state_dict -> flax variable collections.

NORTH-STAR I/O contract: "same checkpoint-in ... as the reference scripts" —
reference checkpoints are torch ``state_dict`` ``.pth`` files. The mirror
(ckpt/torch_mirror.py) shares module naming with models/unet3d.py, so the
mapping is mechanical:

  torch key                        flax path                    transform
  <block>.convN.weight          -> params/<block>/convN/kernel  OIDHW -> DHWIO
  <block>.convN.bias            -> params/<block>/convN/bias    copy
  <block>.normN.weight/.bias    -> params/<block>/normN/scale|bias
  <block>.normN.running_mean    -> batch_stats/<block>/normN/mean
  <block>.normN.running_var     -> batch_stats/<block>/normN/var
  <block>.normN.num_batches_tracked -> (dropped)
  downI.down.*, upI.*, heads    -> same path, conv rule

(SURVEY.md §7 hard part #4: conv layout transpose + BatchNorm running stats.)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _set(tree: Dict[str, Any], path, leaf, value) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def flax_variables_from_torch(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a torch-mirror ``state_dict`` into flax variable collections:
    ``{"params": ..., "batch_stats": ...}`` (batch_stats empty for GroupNorm
    checkpoints)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for key, value in state_dict.items():
        *path, leaf_name = key.split(".")
        if leaf_name == "num_batches_tracked":
            continue
        v = _to_numpy(value).astype(np.float32)
        if leaf_name == "running_mean":
            _set(stats, path, "mean", v)
        elif leaf_name == "running_var":
            _set(stats, path, "var", v)
        elif leaf_name == "weight":
            if v.ndim == 5:  # Conv3d: (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
                _set(params, path, "kernel", np.transpose(v, (2, 3, 4, 1, 0)))
            elif v.ndim == 1:  # BatchNorm/GroupNorm scale
                _set(params, path, "scale", v)
            else:
                raise ValueError(f"unexpected weight rank for {key}: {v.shape}")
        elif leaf_name == "bias":
            _set(params, path, "bias", v)
        else:
            raise ValueError(f"unexpected torch leaf {key}")
    return {"params": params, "batch_stats": stats}


def flax_params_from_torch(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Params collection only (GroupNorm / norm-free checkpoints)."""
    return flax_variables_from_torch(state_dict)["params"]


def _flatten(tree: Mapping[str, Any], prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def torch_state_dict_from_flax(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`flax_variables_from_torch`: flax variable collections
    ``{"params": ..., "batch_stats": ...}`` -> a torch-mirror ``state_dict``.

    Used to run the CPU-reference benchmark with the SAME trained weights as
    the TPU pipeline (benchmarks/cpu_reference.py), keeping the north-star
    denominator apples-to-apples, and to round-trip ``.pth`` export.
    """
    import torch

    sd: Dict[str, Any] = {}
    for path, v in _flatten(variables.get("params", {})).items():
        *mods, leaf = path
        key = ".".join(mods)
        # copy: torch.from_numpy rejects non-writable views (jax exports)
        v = np.array(v, np.float32)
        if leaf == "kernel":  # (kd, kh, kw, I, O) -> (O, I, kd, kh, kw)
            sd[f"{key}.weight"] = torch.from_numpy(
                np.ascontiguousarray(np.transpose(v, (4, 3, 0, 1, 2))))
        elif leaf == "scale":
            sd[f"{key}.weight"] = torch.from_numpy(v)
        elif leaf == "bias":
            sd[f"{key}.bias"] = torch.from_numpy(v)
        else:
            raise ValueError(f"unexpected flax leaf {path}")
    for path, v in _flatten(variables.get("batch_stats", {})).items():
        *mods, leaf = path
        key = ".".join(mods)
        name = {"mean": "running_mean", "var": "running_var"}[leaf]
        sd[f"{key}.{name}"] = torch.from_numpy(np.array(v, np.float32))
    return sd


def load_pth_checkpoint(path: str) -> Dict[str, Any]:
    """Load a ``.pth`` file (state_dict or {'state_dict': ...}) -> flax
    variables ``{"params": ..., "batch_stats": ...}``."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return flax_variables_from_torch(obj)
