from .gae import compute_gae
from .mappo import MAPPOCfg, MAPPOPolicy, MAPPOState, RolloutBatch
from .rollout import (IterCarry, RNNIterCarry, init_carry, init_rnn_carry,
                      make_rnn_train_iter, make_split_train_iter,
                      make_train_iter)
from .tp_net import TPNet, denormalize_predictions, normalize_groundtruth
from .valuenorm import ValueNorm1, ValueNorm2

__all__ = [
    "compute_gae",
    "MAPPOCfg",
    "MAPPOPolicy",
    "MAPPOState",
    "RolloutBatch",
    "IterCarry",
    "init_carry",
    "make_train_iter",
    "make_split_train_iter",
    "TPNet",
    "denormalize_predictions",
    "normalize_groundtruth",
    "ValueNorm1",
    "ValueNorm2",
]
