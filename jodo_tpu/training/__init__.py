from .ema import ema_update
from .optim import make_optimizer, ClipState, init_clip_state, adaptive_clip
from .state import TrainState
from .step import (make_apply_fn, make_train_step, make_multi_train_step,
                   make_eval_step, shard_batch)
from .checkpoint import CheckpointManager

__all__ = [
    "ema_update",
    "make_optimizer",
    "ClipState",
    "init_clip_state",
    "adaptive_clip",
    "TrainState",
    "make_apply_fn",
    "make_train_step",
    "make_multi_train_step",
    "make_eval_step",
    "shard_batch",
    "CheckpointManager",
]
