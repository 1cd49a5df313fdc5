from .ctbr import (
    CTBRResult,
    hover_prev_action_init,
    pid_rate_transform,
    rate_transform,
)
from .obs import (
    depth_image_norm,
    from_discrete_action,
    from_multidiscrete_action,
    history_init,
    history_push,
    ravel_composite,
)

__all__ = [
    "CTBRResult",
    "hover_prev_action_init",
    "pid_rate_transform",
    "rate_transform",
    "depth_image_norm",
    "from_discrete_action",
    "from_multidiscrete_action",
    "history_init",
    "history_push",
    "ravel_composite",
]
