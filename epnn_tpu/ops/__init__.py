from epnn_tpu.ops.fused import (
    FusedParams,
    PairMLPWeights,
    forward_blocked,
    fuse_params,
)

__all__ = ["FusedParams", "PairMLPWeights", "forward_blocked", "fuse_params"]
