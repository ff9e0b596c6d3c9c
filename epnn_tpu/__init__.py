"""epnn_tpu — a TPU-native framework for charge-conserving electron-passing
graph neural networks.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with capability
parity against the reference EPNN research code (see SURVEY.md): RBF pair
featurization, T-round message passing, antisymmetric electron passing with
exact total-charge conservation, TF-checkpoint import, training/inference/
analysis tooling, and single-chip-to-pod scaling (multi-host entry via
``epnn_tpu.parallel.initialize_distributed`` / ``make_multihost_mesh``;
only single-process meshes are integration-testable in this environment —
see ``parallel/multihost.py``).
"""

__version__ = "0.1.0"

from epnn_tpu import compat, data, models
from epnn_tpu.elements import INFER_TABLE, TRAIN_TABLE, ElementTable, table_for_n_elems
from epnn_tpu.featurize import rbf_edges, rbf_edges_np

__all__ = [
    "ElementTable",
    "INFER_TABLE",
    "TRAIN_TABLE",
    "compat",
    "data",
    "models",
    "rbf_edges",
    "rbf_edges_np",
    "table_for_n_elems",
]
