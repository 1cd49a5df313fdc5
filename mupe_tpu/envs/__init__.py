from .base import ENV_REGISTRY, Transition, register_env
from .hover import Hover, HoverCfg
from .hideandseek import HideAndSeek, HideAndSeekCfg

__all__ = [
    "ENV_REGISTRY",
    "Transition",
    "register_env",
    "Hover",
    "HoverCfg",
    "HideAndSeek",
    "HideAndSeekCfg",
]
