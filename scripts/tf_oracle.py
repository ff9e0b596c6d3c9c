"""Run the reference TF layers eagerly as a parity oracle (Keras 3 cannot
rebuild the reference's functional model, so weights are assigned by name)."""
import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import numpy as np
import tensorflow as tf
import charge_gn

REF = "/root/reference"
MIXED = "/root/repo/.cache/refdata/mixed"
MS = os.path.join(REF, "models", "model_systems")
CKPT = os.path.join(REF, "models", "model_weights")

val_names = np.load(os.path.join(MS, "val_names.npy"), allow_pickle=True)
golden = np.load(os.path.join(MS, "test_pred_charges.npy"))

from epnn_tpu.data.xyz import load_molecule
from epnn_tpu.featurize import rbf_edges_np
from epnn_tpu.elements import TRAIN_TABLE

idx = int(os.environ.get("IDX", "0"))
name = str(val_names[idx])
mol = load_molecule(os.path.join(MIXED, name + ".xyz"))
n = mol.natoms
print("molecule:", name, "natoms:", n, "Q:", mol.total_charge)

N, h_dim, e_dim, T, n_elems = 41, 48, 48, 5, 10
x_at = TRAIN_TABLE.featurize_symbols(mol.symbols)
e_np, _ = rbf_edges_np(mol.xyz, e_dim=e_dim)
avg_q = np.float32(mol.total_charge) / n

# per-atom (already untiled) tensors, padded to 41
x = np.zeros((1, N, n_elems), np.float32); x[0, :n] = x_at
h = np.zeros((1, N, h_dim), np.float32)
q = np.zeros((1, N, 1), np.float32); q[0, :n, 0] = avg_q
e = np.zeros((1, N, N, e_dim), np.float32); e[0, :n, :n] = e_np
mask = np.zeros((1, N, N, 1), np.float32); mask[0, :n, :n, 0] = 1.0

update_fn = charge_gn.MLP_layer([32, 32], out_dim=h_dim)
gnn = charge_gn.GNN_layer(charge_gn.MLP_layer, update_fn, T)
epn = charge_gn.EPN_layer(charge_gn.MLP_layer, T=T)

reader = tf.train.load_checkpoint(CKPT)
SUF = "/.ATTRIBUTES/VARIABLE_VALUE"

def get(path):
    return reader.get_tensor(path + SUF)

def assign_mlp(mlp, base):
    # build BEFORE the first call: the tf.function traces capture values
    for k, dense in enumerate(mlp.layer_set):
        kern = get(f"{base}/layer_set/{k}/kernel")
        dense.build((None, kern.shape[0]))
        dense.kernel.assign(kern)
        dense.bias.assign(get(f"{base}/layer_set/{k}/bias"))

for t in range(T - 1):
    assign_mlp(gnn.message_fns[t], f"layer_with_weights-0/message_fns/{t}")
    assign_mlp(epn.pass_fns[t], f"layer_with_weights-1/pass_fns/{t}")
assign_mlp(gnn.message_fns[T - 1], "layer_with_weights-0/message_fn")
assign_mlp(epn.pass_fns[T - 1], "layer_with_weights-1/pass_fn")
assign_mlp(gnn.update_fn, "layer_with_weights-0/update_fn")

graph_feats = gnn(tf.constant(h), tf.constant(e), tf.constant(x), tf.constant(q), tf.constant(mask))
q_pred = epn(graph_feats, tf.constant(e), tf.constant(x), tf.constant(q), tf.constant(mask))
tf_pred = q_pred.numpy()[0, :, 0]
print("tf  [:6]:", tf_pred[:6])
print("gold[:6]:", golden[idx][:6])
print("tf vs golden   max|diff|:", np.abs(tf_pred - golden[idx]).max())

from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.models import EPNN

params, cfg = import_reference_model(os.path.join(REF, "models"), "model")
m_b = np.zeros((1, N), np.float32); m_b[0, :n] = 1.0
ours = np.asarray(EPNN(cfg).apply(params, x, q[..., 0], e, m_b))[0]
print("ours[:6]:", ours[:6])
print("ours vs tf     max|diff|:", np.abs(ours - tf_pred).max())
print("ours vs golden max|diff|:", np.abs(ours - golden[idx]).max())
