"""Round-3 profiling battery: component-level timing of the two frontiers.

A) Large-N scaling (17,760-atom synthetic system, fast mode): the measured
   506 ms is far above a speed-of-light estimate (~50 ms) for the packed
   far-field kernel + O(N·k) near work — find where the time goes.
B) Fused dense Pallas path (protein, 74 ms vs 33 ms XLA): bound the
   featurization cost by comparing against the featurization-free far-field
   kernel at identical shapes.

Timing: serialized dependency chain + terminal host readback; one full
measurement loop discarded after every fresh compile (tunnel inflation is
per-executable).


SUPERSEDED METHODOLOGY NOTE: this battery's per-call timings
include the tunnel's eager output download (~0.4 GB/s x output
bytes) — use the scan-timed batteries (r3c+) / scripts/profile_util
for ground truth; kept for the round-3 evidence trail.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from epnn_tpu.data.dataset import pad_molecules, round_up
from epnn_tpu.data.xyz import Molecule
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.ops import forward_blocked, fuse_params
from epnn_tpu.ops.fused import build_neighbors, max_neighbor_count, _rbf_gathered
from epnn_tpu.ops.pallas_kernels import (
    dense_message_rowsum, dense_message_pad, fused_message_rowsum,
    fused_epn_rowsum,
)

params, cfg = import_reference_model("/root/reference/models", "decay_model")
cfg = cfg.replace(matmul_precision="default")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))
rng = np.random.default_rng(0)


def timeit(tag, fn, chain, it=12):
    """fn: jitted callable taking one chained input; chain(out)->next input."""
    t0 = time.perf_counter()
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    for loop in range(2):
        t0 = time.perf_counter()
        o = None
        for _ in range(it):
            o = fn() if o is None else fn(chain(o))
        np.asarray(jax.tree_util.tree_leaves(o)[0])
        ms = 1e3 * (time.perf_counter() - t0) / it
    print(f"{tag:<46s} {ms:9.2f} ms  (compile {compile_s:5.1f}s)", flush=True)
    return ms


def synth(n):
    side = (n / 0.1) ** (1 / 3)
    symbols = list(rng.choice(["H", "C", "N", "O", "S"], size=n,
                              p=[0.5, 0.3, 0.1, 0.09, 0.01]))
    xyz = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
    return Molecule(name=f"synth{n}", symbols=symbols, xyz=xyz,
                    total_charge=0.0)


# ---------------------------------------------------------------- A) N=17760
N = 17760
mol = synth(N)
b = pad_molecules([mol], table, pad_to=N)
k = round_up(max_neighbor_count(b.xyz[0], b.node_mask[0], cfg.cutoff) + 4, 8)
print(f"== A) scaling frontier N={N}, k={k} ==", flush=True)
x, q0, xyz, mask = [jax.device_put(a[0]) for a in (b.x, b.q0, b.xyz, b.node_mask)]

# full forward (reference point; bench_scaling measured ~506 ms)
full = jax.jit(lambda qi: forward_blocked(
    fused, x[None], qi[None], xyz[None], mask[None], cfg,
    block=256, neighbor_k=int(k), use_pallas=True)[0])
timeit("full forward (use_pallas, fast)", lambda qi=q0: full(qi),
       lambda o: q0 + 0.0 * o)

full_nopallas = jax.jit(lambda qi: forward_blocked(
    fused, x[None], qi[None], xyz[None], mask[None], cfg,
    block=256, neighbor_k=int(k), use_pallas=False)[0])
timeit("full forward (XLA dense scan, fast)", lambda qi=q0: full_nopallas(qi),
       lambda o: q0 + 0.0 * o)

# neighbor construction alone (runs once inside every forward)
nbr = jax.jit(lambda xi: build_neighbors(xi, mask, cfg.cutoff, int(k)))
timeit("build_neighbors", lambda xi=xyz: nbr(xi),
       lambda o: xyz + 0.0 * o[1][:, :1])

# gathered featurization alone
idx, nbr_mask = jax.block_until_ready(nbr(xyz))
gath = jax.jit(lambda xi: _rbf_gathered(xi, xi[idx], nbr_mask, cfg))
timeit("rbf_gathered (N,k) featurization", lambda xi=xyz: gath(xi),
       lambda o: xyz + 0.0 * o[1][:, :1])

# packed far-field kernel alone, x3 rounds chained (the message rounds' dense part)
h1 = int(fused.messages.b1.shape[-1])
lcm = dense_message_pad(128, 64, h1)
n_pad = int(-(-N // lcm) * lcm)
w2, b2 = jax.tree_util.tree_map(lambda a: a[0], fused.messages.mids[0])
pi0 = jnp.asarray(rng.standard_normal((n_pad, h1)), jnp.float32)
pj0 = jnp.asarray(rng.standard_normal((n_pad, h1)), jnp.float32)
cv = jnp.pad(jnp.ones((N,), jnp.float32), (0, n_pad - N))

one_ff = jax.jit(lambda pi: dense_message_rowsum(
    pi, pj0, cv, w2, b2, block_i=128, block_jp=64, precision="default"))
timeit(f"far-field packed kernel x1 (n_pad={n_pad})",
       lambda pi=pi0: one_ff(pi), lambda o: pi0 + 0.0 * o)

# the near-field correction of one message round (gathered double compute)
pj_pad = pj0[:N]
def near_round(pi):
    pj_nbr = pj_pad[idx]
    rbf_nbr, _ = _rbf_gathered(xyz, xyz[idx], nbr_mask, cfg)
    epart = jnp.dot(rbf_nbr, fused.messages.w1_e[0])
    base = pi[:, None, :] + pj_nbr
    hf = jax.nn.relu(base + epart)
    hn = jax.nn.relu(base)
    for wm, bm in [(w2, b2)]:
        hf = jax.nn.relu(jnp.dot(hf, wm) + bm)
        hn = jax.nn.relu(jnp.dot(hn, wm) + bm)
    return jnp.sum((hf - hn) * nbr_mask[:, :, None], axis=1)
near = jax.jit(near_round)
timeit("near-field correction x1 (gathered)",
       lambda pi=pi0[:N]: near(pi), lambda o: pi0[:N] + 0.0 * o)

# ---------------------------------------------------------------- B) protein dense
print("== B) fused dense Pallas path, protein-size N=2304 ==", flush=True)
N2 = 2304
mol2 = synth(2220)
b2m = pad_molecules([mol2], table, pad_to=N2)
xyz2 = jax.device_put(b2m.xyz[0])
mask2 = jax.device_put(b2m.node_mask[0])
pi2 = jnp.asarray(rng.standard_normal((N2, h1)), jnp.float32)
pj2 = jnp.asarray(rng.standard_normal((N2, h1)), jnp.float32)
cv2 = mask2
w1e = fused.messages.w1_e[0]

ff2 = jax.jit(lambda pi: dense_message_rowsum(
    pi, pj2, cv2, w2, b2, block_i=128, block_jp=64, precision="default"))
timeit("far-field kernel (no featurization)", lambda pi=pi2: ff2(pi),
       lambda o: pi2 + 0.0 * o)

msg2 = jax.jit(lambda pi: fused_message_rowsum(
    pi, pj2, xyz2, mask2, cv2, w1e, w2, b2, cutoff=cfg.cutoff, eta=cfg.eta,
    tol=cfg.is_near_tol, masked=True, block_i=64, block_j=128,
    precision="default"))
timeit("fused message kernel (in-tile RBF)", lambda pi=pi2: msg2(pi),
       lambda o: pi2 + 0.0 * o)

epn2 = jax.jit(lambda pi: fused_epn_rowsum(
    pi, pj2, xyz2, mask2, w1e, w2, b2, cutoff=cfg.cutoff, eta=cfg.eta,
    tol=cfg.is_near_tol, soft_gate=False, block_i=64, block_j=128,
    precision="default"))
timeit("fused EPN kernel (RBF + both orderings)", lambda pi=pi2: epn2(pi),
       lambda o: pi2 + 0.0 * o)
print("done", flush=True)
