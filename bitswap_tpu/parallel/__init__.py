from bitswap_tpu.parallel.mesh import (
    data_mesh,
    replicate,
    shard_batch,
    shard_lane_state,
    make_dp_train_step,
)

__all__ = [
    "data_mesh",
    "replicate",
    "shard_batch",
    "shard_lane_state",
    "make_dp_train_step",
]
