"""Round-3 battery B: (1) doubling-RBF kernels vs direct on hardware,
(2) isolate the row-gather cost that battery A implicated at large N.

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
from epnn_tpu.ops import fuse_params
from epnn_tpu.ops.fused import (
    build_neighbors, max_neighbor_count, _forward_single_pallas, rbf_and_gate,
)
from epnn_tpu.ops.pallas_kernels import fused_message_rowsum, fused_epn_rowsum

params, cfg = import_reference_model("/root/reference/models", "decay_model")
cfg = cfg.replace(matmul_precision="default")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))
rng = np.random.default_rng(0)


def timeit(tag, fn, chain, it=12):
    t0 = time.perf_counter()
    try:
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    except Exception as e:
        print(f"{tag:<52s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    compile_s = time.perf_counter() - t0
    for loop in range(2):
        t0 = time.perf_counter()
        o = None
        for _ in range(it):
            o = fn() if o is None else fn(chain(o))
        np.asarray(jax.tree_util.tree_leaves(o)[0])
        ms = 1e3 * (time.perf_counter() - t0) / it
    print(f"{tag:<52s} {ms:9.2f} ms  (compile {compile_s:5.1f}s)", flush=True)
    return ms


def synth(n):
    side = (n / 0.1) ** (1 / 3)
    symbols = list(rng.choice(["H", "C", "N", "O", "S"], size=n,
                              p=[0.5, 0.3, 0.1, 0.09, 0.01]))
    xyz = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
    return Molecule(name=f"synth{n}", symbols=symbols, xyz=xyz,
                    total_charge=0.0)


# ------------------------------------------------- 1) doubling vs direct, N=2304
N2 = 2304
b2m = pad_molecules([synth(2220)], table, pad_to=N2)
xyz2 = jax.device_put(b2m.xyz[0])
mask2 = jax.device_put(b2m.node_mask[0])
h1 = int(fused.messages.b1.shape[-1])
w2, b2 = jax.tree_util.tree_map(lambda a: a[0], fused.messages.mids[0])
w1e = fused.messages.w1_e[0]
pi2 = jnp.asarray(rng.standard_normal((N2, h1)), jnp.float32)
pj2 = jnp.asarray(rng.standard_normal((N2, h1)), jnp.float32)

print("== 1) fused kernels, N=2304, direct vs doubling ==", flush=True)
for meth, bi in (("direct", 64), ("doubling", 32), ("doubling", 16)):
    f = jax.jit(lambda pi, m=meth, b=bi: fused_message_rowsum(
        pi, pj2, xyz2, mask2, mask2, w1e, w2, b2, cutoff=cfg.cutoff,
        eta=cfg.eta, tol=cfg.is_near_tol, masked=True, block_i=b,
        block_j=128, precision="default", rbf_method=m))
    timeit(f"msg kernel [{meth} bi={bi}]", lambda pi=pi2: f(pi),
           lambda o: pi2 + 0.0 * o)
for meth, bi in (("direct", 64), ("doubling", 32), ("doubling", 16)):
    f = jax.jit(lambda pi, m=meth, b=bi: fused_epn_rowsum(
        pi, pj2, xyz2, mask2, w1e, w2, b2, cutoff=cfg.cutoff,
        eta=cfg.eta, tol=cfg.is_near_tol, soft_gate=False, block_i=b,
        block_j=128, precision="default", rbf_method=m))
    timeit(f"epn kernel [{meth} bi={bi}]", lambda pi=pi2: f(pi),
           lambda o: pi2 + 0.0 * o)

x2 = jax.device_put(b2m.x[0])
q02 = jax.device_put(b2m.q0[0])
gold = None
for meth, bi in (("direct", 64), ("doubling", 32)):
    f = jax.jit(lambda qi, m=meth, b=bi: _forward_single_pallas(
        fused, x2, qi, xyz2, mask2, cfg, block=b, rbf_method=m))
    try:
        q = np.asarray(f(q02))
    except Exception as e:
        print(f"   [{meth}] forward FAILED: {str(e)[:160]}", flush=True)
        continue
    if gold is None:
        gold = q
    print(f"   [{meth}] sum {q.sum():+.6f}  maxdiff-vs-direct "
          f"{np.abs(q - gold).max():.2e}", flush=True)
    timeit(f"full dense pallas forward [{meth} bi={bi}]",
           lambda qi=q02: f(qi), lambda o: q02 + 0.0 * o[:1])

# ------------------------------------------------- 2) gather isolation
for N, K in ((17760, 32), (2220, 24)):
    print(f"== 2) gather costs, N={N}, k={K} ==", flush=True)
    b = pad_molecules([synth(N)], table, pad_to=N)
    xyz = jax.device_put(b.xyz[0])
    mask = jax.device_put(b.node_mask[0])
    idx, nbr_mask = jax.block_until_ready(jax.jit(
        lambda: build_neighbors(xyz, mask, cfg.cutoff, K))())
    idx = jax.device_put(np.asarray(idx))
    nbr_mask = jax.device_put(np.asarray(nbr_mask))

    g1 = jax.jit(lambda xi: xi[idx])
    timeit("gather xyz[idx] -> (N,k,3)", lambda xi=xyz: g1(xi),
           lambda o: xyz + 0.0 * o[:, 0, :])
    pj = jnp.asarray(rng.standard_normal((N, h1)), jnp.float32)
    g2 = jax.jit(lambda p: p[idx])
    timeit("gather pj[idx] -> (N,k,32)", lambda p=pj: g2(p),
           lambda o: pj + 0.0 * o[:, 0, :])
    xyz_nbr = jax.block_until_ready(g1(xyz))
    g3 = jax.jit(lambda xi: rbf_and_gate(
        jnp.sum((xi[:, None, :] - xyz_nbr) ** 2, axis=-1), nbr_mask, cfg))
    timeit("rbf_and_gate on pre-gathered (N,k)", lambda xi=xyz: g3(xi),
           lambda o: xyz + 0.0 * o[1][:, :1])
print("done", flush=True)
