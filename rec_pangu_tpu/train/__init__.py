from .trainer import RankTrainer, SequenceTrainer
from .steps import TrainState, create_train_state, make_train_step, make_eval_step

__all__ = [
    "RankTrainer",
    "SequenceTrainer",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
