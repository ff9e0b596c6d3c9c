from epnn_tpu.data.xyz import (
    Molecule,
    XYZParseError,
    load_directory,
    load_molecule,
    parse_xyz_file,
    parse_xyz_text,
)
from epnn_tpu.data.dataset import (
    MolBatch,
    bucket_molecules,
    minibatches,
    pad_molecules,
    round_up,
    train_val_split,
    uniform_q0_contract,
)

__all__ = [
    "Molecule",
    "XYZParseError",
    "load_directory",
    "load_molecule",
    "parse_xyz_file",
    "parse_xyz_text",
    "MolBatch",
    "bucket_molecules",
    "minibatches",
    "pad_molecules",
    "round_up",
    "train_val_split",
    "uniform_q0_contract",
]
