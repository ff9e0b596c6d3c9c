from epnn_tpu.parallel.sharding import (
    ATOM_AXIS,
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch_args,
    shard_state,
)

__all__ = [
    "ATOM_AXIS",
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch_args",
    "shard_state",
]
