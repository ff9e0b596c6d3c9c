"""Latency vs system size: how far past the reference's 2,220-atom ceiling
the neighbor-split path scales on one chip.

Synthetic protein-density systems (0.1 atoms/Å³) at N = 555…17,760 atoms;
fast mode (default matmul precision), serialized-chain timing.
"""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from epnn_tpu.data.dataset import pad_molecules, round_up, uniform_q0_contract
from epnn_tpu.data.xyz import Molecule
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.ops import forward_blocked, fuse_params
from epnn_tpu.ops.fused import max_neighbor_count

params, cfg = import_reference_model("/root/reference/models", "decay_model")
cfg = cfg.replace(matmul_precision="default")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))
rng = np.random.default_rng(0)


def synth(n):
    # protein-like density: n atoms in a cube at 0.1 atoms/A^3
    side = (n / 0.1) ** (1 / 3)
    symbols = list(rng.choice(["H", "C", "N", "O", "S"], size=n,
                              p=[0.5, 0.3, 0.1, 0.09, 0.01]))
    xyz = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
    return Molecule(name=f"synth{n}", symbols=symbols, xyz=xyz,
                    total_charge=0.0)


first = True
for n in (555, 1110, 2220, 4440, 8880, 17760):
    mol = synth(n)
    b = pad_molecules([mol], table, pad_to=n)
    k = round_up(max_neighbor_count(b.xyz[0], b.node_mask[0], cfg.cutoff) + 4, 8)
    x, q0, xyz, mask = [jax.device_put(a) for a in (b.x, b.q0, b.xyz, b.node_mask)]
    on_tpu = jax.devices()[0].platform == "tpu"

    from epnn_tpu.ops.fused import build_neighbors_batch, cell_grid_params

    nbrs = jax.block_until_ready(
        build_neighbors_batch(xyz, mask, cfg.cutoff, int(k)))
    # cold path = the production Predictor path: in-forward cell-list
    # selection for big graphs (r4), rounded grid bounds
    nc_, cap_ = cell_grid_params(b.xyz[0], b.node_mask[0], cfg.cutoff)
    grid = (round_up(nc_, 512), round_up(cap_, 4)) if n >= 1024 else None

    def timed(fn):
        t0 = time.perf_counter()
        q = np.asarray(fn(q0))[0]
        compile_s = time.perf_counter() - t0
        # jitted chain (the eager chain-add is a 2nd tunnel RPC, r4);
        # one full discard loop per executable (tunnel inflation)
        chained = jax.jit(lambda qb, prev: fn(qb + 0.0 * prev[:, :1]))
        prev = q0
        for _ in range(15):
            prev = chained(q0, prev)
        np.asarray(prev)
        it = 10
        prev = q0
        t0 = time.perf_counter()
        for _ in range(it):
            prev = chained(q0, prev)
        np.asarray(prev)
        return 1e3 * (time.perf_counter() - t0) / it, q, compile_s

    uq0 = uniform_q0_contract(b.x, b.q0, b.node_mask)
    ms_cold, q, compile_s = timed(
        lambda qi: forward_blocked(fused, x, qi, xyz, mask, cfg, block=256,
                                   neighbor_k=k, use_pallas=on_tpu,
                                   neighbor_grid=grid, uniform_q0=uq0))
    ms_reuse, _, _ = timed(
        lambda qi: forward_blocked(fused, x, qi, xyz, mask, cfg, block=256,
                                   neighbor_k=k, use_pallas=on_tpu,
                                   neighbors=nbrs, uniform_q0=uq0))
    print(json.dumps({
        "natoms": n, "ms": round(ms_cold, 2),
        "ms_reuse_neighbors": round(ms_reuse, 2), "neighbor_k": int(k),
        "conservation": float(abs(q.sum())), "compile_s": round(compile_s, 1),
    }), flush=True)
