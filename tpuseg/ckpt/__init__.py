from tpuseg.ckpt.orbax_io import CheckpointManager
from tpuseg.ckpt.torch_import import (
    flax_params_from_torch,
    flax_variables_from_torch,
    load_pth_checkpoint,
)

__all__ = [
    "CheckpointManager",
    "flax_params_from_torch",
    "flax_variables_from_torch",
    "load_pth_checkpoint",
]
