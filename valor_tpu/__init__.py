"""VALOR-TPU: TPU-native tri-modal (vision+audio+language) framework."""

from valor_tpu.core.config import Config, ModelConfig, TrainConfig, load_config
from valor_tpu.core.tasks import TaskSpec, parse_task

__version__ = "0.1.0"

__all__ = [
    "Config",
    "ModelConfig",
    "TrainConfig",
    "TaskSpec",
    "load_config",
    "parse_task",
    "__version__",
]
