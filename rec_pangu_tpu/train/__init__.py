from .trainer import GraphTrainer, RankTrainer, SequenceTrainer
from .steps import TrainState, create_train_state, make_train_step, make_eval_step

__all__ = [
    "GraphTrainer",
    "RankTrainer",
    "SequenceTrainer",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
