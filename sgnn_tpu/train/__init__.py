from sgnn_tpu.train.config import load_config, TrainConfig
from sgnn_tpu.train.checkpoint import CheckpointManager

__all__ = ["load_config", "TrainConfig", "CheckpointManager"]
