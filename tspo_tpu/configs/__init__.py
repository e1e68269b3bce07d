from .core import (
    SelectorConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
    CLIPConfig,
    MeshConfig,
    TrainConfig,
    PrecomputeConfig,
    EvalConfig,
)

__all__ = [
    "SelectorConfig",
    "CLIPTextConfig",
    "CLIPVisionConfig",
    "CLIPConfig",
    "MeshConfig",
    "TrainConfig",
    "PrecomputeConfig",
    "EvalConfig",
]
