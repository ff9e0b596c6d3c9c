"""Round-3 battery F: neighbor_compact kernel vs top_k on hardware, and the
full forward with kernel-built neighbors (scan-timed)."""
import os, sys, time, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.data.xyz import Molecule, load_molecule
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.ops import fuse_params
from epnn_tpu.ops.fused import build_neighbors, _forward_single_nbr
from epnn_tpu.ops.pallas_kernels import neighbor_compact

params, cfg = import_reference_model("/root/reference/models", "decay_model")
cfg = cfg.replace(matmul_precision="default")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))
rng = np.random.default_rng(0)


def scan_time(tag, step, x0, iters=8):
    @jax.jit
    def run(x):
        c, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None,
                            length=iters)
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32)), c)

    t0 = time.perf_counter()
    try:
        np.asarray(jax.tree_util.tree_leaves(run(x0))[0])
    except Exception as e:
        print(f"{tag:<52s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
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


for N, K in ((17760, 32), (2220, 24)):
    b = pad_molecules([synth(N)], table, pad_to=N)
    x = jax.device_put(b.x[0])
    q0 = jax.device_put(b.q0[0])
    xyz = jax.device_put(b.xyz[0])
    mask = jax.device_put(b.node_mask[0])
    print(f"== N={N}, k={K} ==", flush=True)
    scan_time("build_neighbors (top_k)",
              lambda xi: xi + 0.0 * build_neighbors(
                  xi, mask, cfg.cutoff, K)[1][:, :1], xyz)
    for bi in (64, 128, 256):
        scan_time(f"neighbor_compact kernel bi={bi}",
                  lambda xi, b=bi: xi + 0.0 * neighbor_compact(
                      xi, mask, cfg.cutoff, K, block_i=b)[1][:, :1], xyz)

    # set-equality spot check on hardware
    i1, m1 = map(np.asarray, jax.jit(
        lambda: build_neighbors(xyz, mask, cfg.cutoff, K))())
    i2, m2 = map(np.asarray, jax.jit(
        lambda: neighbor_compact(xyz, mask, cfg.cutoff, K))())
    eq = (np.sort(np.where(m1 > 0, i1, -1), 1)
          == np.sort(np.where(m2 > 0, i2, -1), 1)).all()
    print(f"   set equality vs top_k: {bool(eq)}  counts match: "
          f"{bool((m1.sum(1) == m2.sum(1)).all())}", flush=True)

    single = functools.partial(_forward_single_nbr, cfg=cfg, block=256, k=K,
                               use_pallas=True)
    scan_time("forward, kernel neighbors (use_pallas)",
              lambda qi: q0 + 0.0 * single(fused, x, qi, xyz, mask), q0,
              iters=4)
    q = np.asarray(jax.jit(lambda: single(fused, x, q0, xyz, mask))())
    print(f"   conservation |sum q|: {abs(q.sum()):.2e}", flush=True)
print("done", flush=True)
