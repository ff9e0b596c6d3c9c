from epnn_tpu.train.loop import (
    TrainConfig,
    TrainResult,
    TrainState,
    create_state,
    eval_step,
    make_optimizer,
    train,
    train_step,
)
from epnn_tpu.train.metrics import LOSSES, mae_sums, masked_mse, padded_mse

__all__ = [
    "LOSSES",
    "TrainConfig",
    "TrainResult",
    "TrainState",
    "create_state",
    "eval_step",
    "mae_sums",
    "make_optimizer",
    "masked_mse",
    "padded_mse",
    "train",
    "train_step",
]
