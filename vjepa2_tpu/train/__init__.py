from vjepa2_tpu.train.pretrain import (
    PretrainHParams,
    build_models,
    init_params,
    jepa_loss,
    jit_train_step,
    make_optimizer,
    make_train_step,
    shard_state,
)
from vjepa2_tpu.train.state import TrainState, num_params

__all__ = [
    "PretrainHParams",
    "build_models",
    "init_params",
    "jepa_loss",
    "jit_train_step",
    "make_optimizer",
    "make_train_step",
    "shard_state",
    "TrainState",
    "num_params",
]
