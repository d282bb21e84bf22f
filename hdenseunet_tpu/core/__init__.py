from .config import Config, DataConfig, ModelConfig, TrainConfig, InferConfig
from .module import Ctx, init, merge_state, param_count
from . import mesh

__all__ = [
    "Config",
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "InferConfig",
    "Ctx",
    "init",
    "merge_state",
    "param_count",
    "mesh",
]
