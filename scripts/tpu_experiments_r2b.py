"""Round-2 battery B: packed message kernel, fixed fused dense kernels,
bf16 with f32 charge accumulation."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from epnn_tpu.data.xyz import load_molecule
from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.ops import forward_blocked, fuse_params

params, cfg = import_reference_model("/root/reference/models", "decay_model")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))

mol = load_molecule(os.path.join(REPO, ".cache/refdata/protein/6qlp_capped.xyz"))
pb = pad_molecules([mol], table, pad_to=2220)
gold = np.load(os.path.join(REPO, ".cache/refdata/protein/preds.npy")).reshape(-1)
x, q0, xyz, mask = [jax.device_put(a) for a in (pb.x, pb.q0, pb.xyz, pb.node_mask)]


def run(tag, c, it=15, **kw):
    fn = lambda q0_in: forward_blocked(fused, x, q0_in, xyz, mask, c, **kw)
    t0 = time.perf_counter()
    try:
        qp = np.asarray(fn(q0))[0]
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    qin = q0
    for _ in range(it):
        out = fn(qin)
        qin = q0 + 0.0 * out[:, :1]
    np.asarray(out)
    qin = q0
    t0 = time.perf_counter()
    for _ in range(it):
        out = fn(qin)
        qin = q0 + 0.0 * out[:, :1]
    np.asarray(out)
    ms = 1e3 * (time.perf_counter() - t0) / it
    print(f"{tag}: {ms:8.2f} ms  parity {np.abs(qp - gold).max():.2e}  "
          f"sum {qp.sum():+.6f}  (compile {compile_s:.0f}s)", flush=True)
    return ms


H = dict(matmul_precision="highest")
D = dict(matmul_precision="default")
NBR = dict(block=256, neighbor_k=32)

print("== neighbor-split path with the PACKED dense-message kernel ==", flush=True)
run("warmup discard        ", cfg.replace(**D), **NBR)
run("fast (default) base   ", cfg.replace(**D), **NBR)
run("fast + packed kernel  ", cfg.replace(**D), use_pallas=True, **NBR)
run("parity: hi+far default", cfg.replace(**H, dense_matmul_precision="default"), **NBR)
run("parity: hi+packed def ", cfg.replace(**H, dense_matmul_precision="default"),
    use_pallas=True, **NBR)
print("== fully-fused Pallas dense path (fixed) ==", flush=True)
run("pallas dense bi32 def ", cfg.replace(**D), use_pallas=True, block=32)
run("pallas dense bi64 def ", cfg.replace(**D), use_pallas=True, block=64)
print("== bf16 (f32 charge accumulator) ==", flush=True)
run("bf16 nbr              ", cfg.replace(compute_dtype="bfloat16"), **NBR)
