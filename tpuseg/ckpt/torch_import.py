"""`.pth` checkpoint import: torch state_dict -> flax param pytree.

NORTH-STAR I/O contract: "same checkpoint-in ... as the reference scripts" —
reference checkpoints are torch ``state_dict`` ``.pth`` files. The mirror
(ckpt/torch_mirror.py) shares module naming with models/unet3d.py, so the
mapping is mechanical:

  torch key                      flax path                      transform
  <block>.convN.weight        -> <block>/convN/kernel           OIDHW -> DHWIO
  <block>.convN.bias          -> <block>/convN/bias             copy
  <block>.normN.weight/.bias  -> <block>/normN/scale|bias       copy
  downI.down.*                -> downI/down/*                   conv rule
  upI.up_conv.*, upI.block.*  -> upI/up_conv|block/*            conv rule
  fg_head/peak_head.*         -> fg_head|peak_head/*            conv rule

(SURVEY.md §7 hard part #4: conv layout transpose + norm naming.)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _to_numpy(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def flax_params_from_torch(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a torch-mirror ``state_dict`` into a nested flax params dict."""
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        v = _to_numpy(value).astype(np.float32)
        *path, leaf_module, leaf_name = key.split(".")
        # leaf_module is the torch nn.Conv3d / nn.GroupNorm attribute name
        if leaf_name == "weight":
            if v.ndim == 5:  # Conv3d: (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
                v = np.transpose(v, (2, 3, 4, 1, 0))
                leaf = "kernel"
            elif v.ndim == 1:  # GroupNorm scale
                leaf = "scale"
            else:
                raise ValueError(f"unexpected weight rank for {key}: {v.shape}")
        elif leaf_name == "bias":
            leaf = "bias"
        else:
            raise ValueError(f"unexpected torch leaf {key}")
        node = params
        for p in (*path, leaf_module):
            node = node.setdefault(p, {})
        node[leaf] = v
    return params


def load_pth_checkpoint(path: str) -> Dict[str, Any]:
    """Load a ``.pth`` file (state_dict or {'state_dict': ...}) -> flax params."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return flax_params_from_torch(obj)
