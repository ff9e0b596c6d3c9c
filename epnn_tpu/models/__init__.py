from epnn_tpu.models.config import EPNNConfig, PRESETS, reference_compat
from epnn_tpu.models.epnn import EPNN, count_params, init_params, pair_gate
from epnn_tpu.models.mlp import MLP

__all__ = [
    "EPNN",
    "EPNNConfig",
    "MLP",
    "PRESETS",
    "count_params",
    "init_params",
    "pair_gate",
    "reference_compat",
]
