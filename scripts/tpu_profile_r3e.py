"""Round-3 battery E: is vmap-over-batch the missing 390 ms at N=17,760?

Times _forward_single_nbr directly (no vmap) vs forward_blocked (vmap, B=1),
both scan-timed, plus vmapped variants of the individual suspects (gather,
top_k) to locate exactly which op degrades under vmap.
"""
import os, sys, time, functools

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
from epnn_tpu.ops import forward_blocked, fuse_params
from epnn_tpu.ops.fused import build_neighbors, _forward_single_nbr

params, cfg = import_reference_model("/root/reference/models", "decay_model")
cfg = cfg.replace(matmul_precision="default")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))
rng = np.random.default_rng(0)


def scan_time(tag, step, x0, iters=6):
    @jax.jit
    def run(x):
        c, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None,
                            length=iters)
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32)), c)

    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(run(x0))[0])
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(x0))[0])
        ms = 1e3 * (time.perf_counter() - t0) / iters
        best = ms if best is None else min(best, ms)
    print(f"{tag:<52s} {best:9.3f} ms  (compile {compile_s:5.1f}s)",
          flush=True)
    return best


def synth(n):
    side = (n / 0.1) ** (1 / 3)
    symbols = list(rng.choice(["H", "C", "N", "O", "S"], size=n,
                              p=[0.5, 0.3, 0.1, 0.09, 0.01]))
    xyz = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
    return Molecule(name=f"synth{n}", symbols=symbols, xyz=xyz,
                    total_charge=0.0)


N, K = 17760, 32
b = pad_molecules([synth(N)], table, pad_to=N)
x = jax.device_put(b.x[0])
q0 = jax.device_put(b.q0[0])
xyz = jax.device_put(b.xyz[0])
mask = jax.device_put(b.node_mask[0])
print(f"== N={N}, k={K}, mask_messages={cfg.mask_messages} ==", flush=True)

single = functools.partial(_forward_single_nbr, cfg=cfg, block=256, k=K,
                           use_pallas=True)
scan_time("single forward, NO vmap",
          lambda qi: q0 + 0.0 * single(fused, x, qi, xyz, mask), q0)

vm = jax.vmap(lambda xx, qq, xy, mm: single(fused, xx, qq, xy, mm),
              in_axes=(0, 0, 0, 0))
scan_time("single forward, vmap B=1",
          lambda qi: q0 + 0.0 * vm(x[None], qi[None], xyz[None],
                                   mask[None])[0], q0)

# individual suspects under vmap
idx, nbr_mask = jax.block_until_ready(jax.jit(
    lambda: build_neighbors(xyz, mask, cfg.cutoff, K))())
idx = jax.device_put(np.asarray(idx))
pj = jnp.asarray(rng.standard_normal((N, 32)), jnp.float32)

scan_time("gather pj[idx], no vmap", lambda p: p + 0.0 * p[idx][:, 0, :], pj)
gv = jax.vmap(lambda p, ii: p[ii], in_axes=(0, 0))
idxb = idx[None]
scan_time("gather pj[idx], vmap B=1",
          lambda p: p + 0.0 * gv(p[None], idxb)[0][:, 0, :], pj)

scan_time("build_neighbors, no vmap",
          lambda xi: xi + 0.0 * build_neighbors(xi, mask, cfg.cutoff,
                                                K)[1][:, :1], xyz)
bv = jax.vmap(lambda xi, mm: build_neighbors(xi, mm, cfg.cutoff, K),
              in_axes=(0, 0))
scan_time("build_neighbors, vmap B=1",
          lambda xi: xi + 0.0 * bv(xi[None], mask[None])[1][0][:, :1], xyz)
print("done", flush=True)
