"""Round-3 battery C: dispatch-free component timing via in-jit lax.scan.

Battery B's standalone numbers disagreed with the full-forward totals
(standalone featurization > the forward containing it), so every number
here times ONE jitted program that runs the op `iters` times in a
lax.scan with a data dependency between iterations, and reads back a
scalar.  Dispatch, chain, and readback overheads amortize to ~zero.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.data.xyz import Molecule
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.ops import fuse_params
from epnn_tpu.ops.fused import build_neighbors, rbf_and_gate
from epnn_tpu.ops.pallas_kernels import (
    dense_message_rowsum, fused_message_rowsum, fused_epn_rowsum,
)

params, cfg = import_reference_model("/root/reference/models", "decay_model")
cfg = cfg.replace(matmul_precision="default")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))
rng = np.random.default_rng(0)
ITERS = 20


def scan_time(tag, step, x0):
    """step: (carry) -> carry, same shape/dtype. Times ITERS scanned calls."""
    @jax.jit
    def run(x):
        c, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None, length=ITERS)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a.astype(jnp.float32)), c)

    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(run(x0))[0])
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(x0))[0])
        ms = 1e3 * (time.perf_counter() - t0) / ITERS
        best = ms if best is None else min(best, ms)
    print(f"{tag:<52s} {best:9.3f} ms  (compile {compile_s:5.1f}s)", flush=True)
    return best


def synth(n):
    side = (n / 0.1) ** (1 / 3)
    symbols = list(rng.choice(["H", "C", "N", "O", "S"], size=n,
                              p=[0.5, 0.3, 0.1, 0.09, 0.01]))
    xyz = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
    return Molecule(name=f"synth{n}", symbols=symbols, xyz=xyz,
                    total_charge=0.0)


h1 = int(fused.messages.b1.shape[-1])
w2, b2 = jax.tree_util.tree_map(lambda a: a[0], fused.messages.mids[0])
w1e = fused.messages.w1_e[0]

for N, K in ((17760, 32), (2220, 24)):
    print(f"== N={N}, k={K} ==", flush=True)
    b = pad_molecules([synth(N)], table, pad_to=N)
    xyz = jax.device_put(b.xyz[0])
    mask = jax.device_put(b.node_mask[0])
    idx, nbr_mask = jax.block_until_ready(jax.jit(
        lambda: build_neighbors(xyz, mask, cfg.cutoff, K))())
    idx = jax.device_put(np.asarray(idx))
    nbr_mask = jax.device_put(np.asarray(nbr_mask))
    pj = jnp.asarray(rng.standard_normal((N, h1)), jnp.float32)

    scan_time("gather pj[idx] (N,k,32)",
              lambda p: p + 0.0 * p[idx][:, 0, :], pj)
    # same but with each row's neighbor indices sorted ascending (locality)
    idx_s = jax.device_put(np.sort(np.asarray(idx), axis=1))
    scan_time("gather pj[idx_sorted]",
              lambda p: p + 0.0 * p[idx_s][:, 0, :], pj)
    scan_time("gather xyz[idx] (N,k,3)",
              lambda xi: xi + 0.0 * xi[idx][:, 0, :], xyz)
    xyz_nbr = jax.block_until_ready(jax.jit(lambda: xyz[idx])())

    def feat(xi):
        rbf, gate = rbf_and_gate(
            jnp.sum((xi[:, None, :] - xyz_nbr) ** 2, axis=-1), nbr_mask, cfg)
        return xi + 0.0 * rbf[:, 0, :3] + 0.0 * gate[:, :3]
    scan_time("rbf_and_gate on pre-gathered (N,k)", feat, xyz)

    def nearfield(p):
        pj_nbr = p[idx]
        base = p[:, None, :] + pj_nbr
        hf = jax.nn.relu(base)
        hf = jax.nn.relu(jnp.dot(hf, w2) + b2)
        out = jnp.sum(hf * nbr_mask[:, :, None], axis=1)
        return p + 0.0 * out
    scan_time("near-field MLP + gather (no feat)", nearfield, pj)

print("== dense pallas kernels, N=2304 (scan-timed) ==", flush=True)
N2 = 2304
b2m = pad_molecules([synth(2220)], table, pad_to=N2)
xyz2 = jax.device_put(b2m.xyz[0])
mask2 = jax.device_put(b2m.node_mask[0])
pj2 = jnp.asarray(rng.standard_normal((N2, h1)), jnp.float32)

scan_time("far-field packed kernel", lambda p: p + 0.0 * dense_message_rowsum(
    p, pj2, mask2, w2, b2, block_i=128, block_jp=64, precision="default"), pj2)
for meth, bi in (("direct", 64), ("direct", 32), ("doubling", 32)):
    scan_time(f"msg kernel [{meth} bi={bi}]",
              lambda p, m=meth, b=bi: p + 0.0 * fused_message_rowsum(
                  p, pj2, xyz2, mask2, mask2, w1e, w2, b2, cutoff=cfg.cutoff,
                  eta=cfg.eta, tol=cfg.is_near_tol, masked=True, block_i=b,
                  block_j=128, precision="default", rbf_method=m), pj2)
for meth, bi in (("direct", 64), ("direct", 32), ("doubling", 32)):
    scan_time(f"epn kernel [{meth} bi={bi}]",
              lambda p, m=meth, b=bi: p + 0.0 * fused_epn_rowsum(
                  p, pj2, xyz2, mask2, w1e, w2, b2, cutoff=cfg.cutoff,
                  eta=cfg.eta, tol=cfg.is_near_tol, soft_gate=False,
                  block_i=b, block_j=128, precision="default",
                  rbf_method=m), pj2)
print("done", flush=True)
