from dtt.core.config import (AnchorConfig, Config, EvalConfig, InputConfig,
                             ModelConfig, RoIConfig, RPNConfig, TrackConfig,
                             TrainConfig, load_config, save_config)
from dtt.core import boxes, anchors

__all__ = [
    "AnchorConfig", "Config", "EvalConfig", "InputConfig", "ModelConfig",
    "RoIConfig", "RPNConfig", "TrackConfig", "TrainConfig",
    "load_config", "save_config", "boxes", "anchors",
]
