from .config import RunCfg, apply_overrides, parse_cli
from .debug import StallWatchdog, check_finite, guard_train_iter, profile_trace
from .logging import RunLogger, config_dict
