from bitswap_tpu.train.runtime import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_train_step,
    make_eval_step,
    warmup,
    lr_at_step,
)
from bitswap_tpu.train.data import load_dataset, synthetic_images

__all__ = [
    "TrainConfig",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "make_eval_step",
    "warmup",
    "lr_at_step",
    "load_dataset",
    "synthetic_images",
]
