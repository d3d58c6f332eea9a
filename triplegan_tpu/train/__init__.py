"""Training subsystem: losses, the three-player state, schedules, the single
compiled D→G→C step, and the epoch-loop driver (SURVEY.md §2.1 #8–10)."""

from triplegan_tpu.train import losses, schedule
from triplegan_tpu.train.state import TrainState, create_state
from triplegan_tpu.train.step import make_train_step, make_eval_step

__all__ = [
    "losses",
    "schedule",
    "TrainState",
    "create_state",
    "make_train_step",
    "make_eval_step",
]
