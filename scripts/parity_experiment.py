"""Exploratory parity check: shipped checkpoints vs our JAX forward.

Run: JAX_PLATFORMS=cpu python scripts/parity_experiment.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from epnn_tpu.data.xyz import load_molecule
from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.featurize import rbf_edges_np, soft_envelope_np
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.models import EPNN

REF = "/root/reference"
MIXED = "/root/repo/.cache/refdata/mixed"
MS = os.path.join(REF, "models", "model_systems")

params, cfg = import_reference_model(os.path.join(REF, "models"), "model")
print("imported config:", cfg)
table = table_for_n_elems(cfg.n_elems)
print("table:", table.name)

val_names = np.load(os.path.join(MS, "val_names.npy"), allow_pickle=True)
golden = np.load(os.path.join(MS, "test_pred_charges.npy"))
print("val:", val_names.shape, golden.shape, golden.dtype)

K = int(os.environ.get("NMOL", "64"))  # subset first for speed
names = [str(n) for n in val_names[:K]]
mols = [load_molecule(os.path.join(MIXED, n + ".xyz")) for n in names]
batch = pad_molecules(mols, table, pad_to=41)

# oracle edges, exactly what the reference fed the model
e = np.zeros((len(mols), 41, 41, cfg.e_dim), np.float32)
for i, m in enumerate(mols):
    ei, _ = rbf_edges_np(m.xyz, e_dim=cfg.e_dim)
    e[i, : m.natoms, : m.natoms] = ei

model = EPNN(cfg)
apply = jax.jit(lambda p, x, q0, e, m: model.apply(p, x, q0, e, m))
q = np.asarray(apply(params, batch.x, batch.q0, e, batch.node_mask))

g = golden[:K]
diff = np.abs(q - g)
print("max|diff| =", diff.max(), " mean =", diff.mean())
for thresh in (1e-4, 1e-5, 1e-6):
    print(f"  frac > {thresh}: {(diff > thresh).mean():.4f}")
# conservation sanity
print("sum check:", np.abs(q.sum(1) - batch.total_q).max())
