from tpuseg.train.step import TrainState, create_train_state, make_train_step
from tpuseg.train.dp import make_dp_train_step
from tpuseg.train.loop import train

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_dp_train_step",
    "train",
]
