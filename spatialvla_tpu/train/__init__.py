from .metrics import action_metrics, build_decode_luts
from .optimizer import OptimizerConfig, make_optimizer, make_schedule, trainable_mask
from .train_step import (
    TrainStepConfig,
    init_train_state,
    jit_train_step,
    make_loss_fn,
    make_train_step,
)

__all__ = [
    "OptimizerConfig",
    "TrainStepConfig",
    "action_metrics",
    "build_decode_luts",
    "init_train_state",
    "jit_train_step",
    "make_loss_fn",
    "make_optimizer",
    "make_schedule",
    "make_train_step",
    "trainable_mask",
]
