"""Round-2 one-process TPU experiment battery.

Questions answered here (one TPU process at a time; the first measurement
after every fresh compile is inflated on the tunnel and discarded):

1. Do the fixed/new Pallas kernels beat the XLA paths (VERDICT #2)?
2. Which configuration reaches parity-grade (<=1e-5 vs golden) protein
   inference under 10 ms (VERDICT #3)?  Candidates: all-HIGHEST baseline,
   far-field at bf16x3 split-float, far-field via the Pallas kernel at
   HIGHEST, fully-fused Pallas dense path.
3. bf16 compute_dtype end-to-end speed (VERDICT #9 follow-up).
4. Mixed-set throughput with a reconciled methodology (VERDICT #6).
"""
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
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    # discard a full measurement loop after every fresh compile
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

print("== protein 2220 atoms, neighbor-split path ==", flush=True)
run("warmup discard       ", cfg.replace(**D), **NBR)
run("fast (default)       ", cfg.replace(**D), **NBR)
run("parity (highest)     ", cfg.replace(**H), **NBR)
print("== parity candidates: cheapen the far-field only ==", flush=True)
run("hi + far bf16x3      ", cfg.replace(**H, dense_matmul_precision="bf16x3"), **NBR)
run("hi + far default     ", cfg.replace(**H, dense_matmul_precision="default"), **NBR)
run("hi + pallas far hi   ", cfg.replace(**H), use_pallas=True, **NBR)
run("hi + pallas far def  ", cfg.replace(**H, dense_matmul_precision="default"),
    use_pallas=True, **NBR)
run("fast + pallas far    ", cfg.replace(**D), use_pallas=True, **NBR)
print("== fully-fused Pallas dense path (no neighbor split) ==", flush=True)
run("pallas dense b64 def ", cfg.replace(**D), use_pallas=True, block=64)
run("pallas dense b64 hi  ", cfg.replace(**H), use_pallas=True, block=64)
run("pallas dense b128 def", cfg.replace(**D), use_pallas=True, block=128)
print("== XLA dense blocked path (reference point) ==", flush=True)
run("xla blocked b256 def ", cfg.replace(**D), block=256)
print("== bf16 compute_dtype ==", flush=True)
run("bf16 nbr             ", cfg.replace(compute_dtype="bfloat16"), **NBR)

# ---- mixed-set throughput, reconciled methodology ----
print("== mixed throughput (batch 128, padded 48) ==", flush=True)
from epnn_tpu.data import load_directory

mixed_dir = os.path.join(REPO, ".cache/refdata/mixed")
mols = [m for m in load_directory(mixed_dir) if m.labels is not None][:1024]
mbatch = pad_molecules(mols, table, pad_to=48)
c = cfg.replace(**D)
bs = 128
subs = [mbatch.select(np.arange(s, s + bs)) for s in range(0, len(mols), bs)]


def tput(tag, pre_put):
    if pre_put:
        batches = [tuple(jax.device_put(a) for a in (sl.x, sl.q0, sl.xyz, sl.node_mask))
                   for sl in subs]
    else:
        batches = [(sl.x, sl.q0, sl.xyz, sl.node_mask) for sl in subs]

    def run_all():
        outs = [forward_blocked(fused, *b, c, block=48) for b in batches]
        np.asarray(outs[-1])
        return outs

    run_all()
    run_all()  # discard post-compile loop
    t0 = time.perf_counter()
    run_all()
    dt = time.perf_counter() - t0
    print(f"{tag}: {len(mols) / dt:9.0f} mol/s ({dt * 1e3:.1f} ms)", flush=True)


tput("throughput host->dev ", pre_put=False)
tput("throughput pre-put   ", pre_put=True)

# bench.py's exact previous methodology (select() inside the loop)
def run_batches_old():
    outs = []
    for s in range(0, len(mols), bs):
        sl = mbatch.select(np.arange(s, s + bs))
        outs.append(forward_blocked(fused, sl.x, sl.q0, sl.xyz, sl.node_mask, c, block=48))
    return outs

np.asarray(run_batches_old()[-1])
np.asarray(run_batches_old()[-1])
t0 = time.perf_counter()
outs = run_batches_old()
np.asarray(outs[-1])
dt = time.perf_counter() - t0
print(f"throughput old method: {len(mols) / dt:9.0f} mol/s", flush=True)
