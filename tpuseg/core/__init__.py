from tpuseg.core.config import (
    Config,
    DataConfig,
    InferConfig,
    ModelConfig,
    PostprocConfig,
    TrainConfig,
)

__all__ = [
    "Config",
    "DataConfig",
    "InferConfig",
    "ModelConfig",
    "PostprocConfig",
    "TrainConfig",
]
