from epnn_tpu.parallel.multihost import (
    initialize_distributed,
    is_coordinator,
    make_multihost_mesh,
)
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
    "initialize_distributed",
    "is_coordinator",
    "make_mesh",
    "make_multihost_mesh",
    "replicated",
    "shard_batch_args",
    "shard_state",
]
