from .optimizers import get_lr, make_optimizer, with_lr
from .step import TrainState, init_train_state, make_eval_loss_step, make_train_step
from .trainer import Trainer

__all__ = [
    "get_lr",
    "make_optimizer",
    "with_lr",
    "TrainState",
    "init_train_state",
    "make_eval_loss_step",
    "make_train_step",
    "Trainer",
]
