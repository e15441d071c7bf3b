"""Training/eval loops: supervised, adversarial DA, evaluation."""

from .optim import make_optimizer
from .state import TrainState, create_train_state
from .supervised import make_train_step, train
from .adversarial import make_da_step, train_da
from .evaluate import (make_eval_step, make_eval_accum_step,
                       make_eval_scan_step, evaluate)

__all__ = [
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "train",
    "make_da_step",
    "train_da",
    "make_eval_step",
    "make_eval_accum_step",
    "make_eval_scan_step",
    "evaluate",
]
