from openglue_tpu.train.state import MatcherTrainState, create_train_state
from openglue_tpu.train.step import (
    LossConfig,
    make_eval_step,
    make_train_step,
    redraw_favor_projections,
)

__all__ = [
    "MatcherTrainState",
    "create_train_state",
    "LossConfig",
    "make_train_step",
    "make_eval_step",
    "redraw_favor_projections",
]
