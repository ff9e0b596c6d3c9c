from epnn_tpu.ops.fused import (
    FusedParams,
    PairMLPWeights,
    build_neighbors,
    build_neighbors_batch,
    forward_blocked,
    fuse_params,
    max_neighbor_count,
    refresh_neighbor_d2,
)

__all__ = [
    "FusedParams",
    "PairMLPWeights",
    "build_neighbors",
    "build_neighbors_batch",
    "forward_blocked",
    "fuse_params",
    "max_neighbor_count",
    "refresh_neighbor_d2",
]
