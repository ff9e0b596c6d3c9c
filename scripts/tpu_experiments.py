"""One-process TPU experiment battery (claim turnaround between processes is
slow on the tunnel, so everything runs in a single session; the first run in
a process measures inflated and is discarded)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax

from epnn_tpu.data.xyz import load_molecule
from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.ops import forward_blocked, fuse_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
params, cfg = import_reference_model("/root/reference/models", "decay_model")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))

mol = load_molecule(os.path.join(REPO, ".cache/refdata/protein/6qlp_capped.xyz"))
pb = pad_molecules([mol], table, pad_to=2220)
gold = np.load(os.path.join(REPO, ".cache/refdata/protein/preds.npy")).reshape(-1)
x, q0, xyz, mask = [jax.device_put(a) for a in
                    (pb.x, pb.q0, pb.xyz, pb.node_mask)]


def run(tag, c, it=10, **kw):
    fn = lambda q0_in: forward_blocked(fused, x, q0_in, xyz, mask, c, **kw)
    t0 = time.perf_counter()
    qp = np.asarray(fn(q0))[0]
    compile_s = time.perf_counter() - t0
    np.asarray(fn(q0))
    qin = q0
    t0 = time.perf_counter()
    for _ in range(it):
        out = fn(qin)
        qin = q0 + 0.0 * out[:, :1]
    np.asarray(out)
    ms = 1e3 * (time.perf_counter() - t0) / it
    print(f"{tag}: {ms:8.2f} ms  parity {np.abs(qp-gold).max():.2e}  "
          f"sum {qp.sum():+.6f}  (compile {compile_s:.0f}s)", flush=True)
    return ms


EXPS = [
    ("warmup discard   ", dict(matmul_precision="default"), dict(block=256, neighbor_k=32)),
    ("highest v2       ", dict(matmul_precision="highest"), dict(block=256, neighbor_k=32)),
    ("default v2       ", dict(matmul_precision="default"), dict(block=256, neighbor_k=32)),
    ("highest v2 (2)   ", dict(matmul_precision="highest"), dict(block=256, neighbor_k=32)),
    ("highest v2 b128  ", dict(matmul_precision="highest"), dict(block=128, neighbor_k=32)),
    ("highest v2 b740  ", dict(matmul_precision="highest"), dict(block=740, neighbor_k=32)),
    ("highest v2 k24   ", dict(matmul_precision="highest"), dict(block=256, neighbor_k=24)),
]
for tag, crepl, kw in EXPS:
    run(tag, cfg.replace(**crepl), **kw)
