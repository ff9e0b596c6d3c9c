"""Virtual-mesh scaling sanity sweep (VERDICT r2 item 7).

Real multi-chip hardware is not available here, so wall-clock scaling is
unmeasurable — but WORK DIVISION is: XLA compiles one SPMD module per
device, and its cost_analysis()/memory_analysis() describe what ONE device
executes.  If the sharded forwards actually divide the pair grid, the
per-device flop count must fall ~1/D for the dominant O(N²) term.

Run (CPU, any host):  python scripts/mesh_scaling_sweep.py
Writes a markdown table to stdout; the regression guard lives in
tests/test_sharding.py::test_scaling_work_divides.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def sweep(n=256, k=16, b=1):
    import optax

    from epnn_tpu.models import EPNNConfig, init_params
    from epnn_tpu.ops import fuse_params
    from epnn_tpu.parallel import make_mesh
    from epnn_tpu.parallel.atom_shard import (
        forward_atom_sharded_nbr_batch, make_sharded_train_step)
    from epnn_tpu.parallel.ring_shard import forward_ring_sharded_nbr_batch
    from epnn_tpu.train.loop import TrainState

    cfg = EPNNConfig(h_dim=16, e_dim=16, msg_dim=8, mlp_hidden=(8, 8), T=2)
    params = init_params(cfg, jax.random.key(0))
    fused = fuse_params(params, cfg)
    g = np.random.default_rng(0)
    x = g.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
    xyz = g.uniform(0, 14, size=(b, n, 3)).astype(np.float32)
    mask = np.ones((b, n), np.float32)
    q0 = np.zeros((b, n), np.float32)
    y = np.zeros((b, n), np.float32)
    w = np.ones((b,), np.float32)

    opt = optax.adam(1e-3)
    state = TrainState(params=params, opt_state=opt.init(params), step=0)

    rows = {}
    for d in (1, 2, 4, 8):
        mesh = make_mesh(n_data=1, n_atoms=d)

        def fa(fused, x, q0, xyz, mask):
            return forward_atom_sharded_nbr_batch(
                fused, x, q0, xyz, mask, cfg, mesh, k=k)

        def fr(fused, x, q0, xyz, mask):
            return forward_ring_sharded_nbr_batch(
                fused, x, q0, xyz, mask, cfg, mesh, k_blk=min(k, n // d))

        def fc(fused, x, q0, xyz, mask):
            # round-6: round-1 far-field collapse (q0 here is all-zero —
            # uniform — and x is synthetic, so we just exercise the path)
            return forward_atom_sharded_nbr_batch(
                fused, x, q0, xyz, mask, cfg, mesh, k=k, uniform_q0=True)

        from epnn_tpu.ops.fused import build_neighbors_batch

        nbrs = tuple(np.asarray(a) for a in build_neighbors_batch(
            jax.numpy.asarray(xyz), jax.numpy.asarray(mask), cfg.cutoff, k))

        def fs(fused, x, q0, xyz, mask, nbrs):
            # round-6: precomputed-neighbor serving (tables shard over
            # (data, atoms) — the per-device module must lose the O(N²/D)
            # selection scoring but keep the far-field division)
            return forward_atom_sharded_nbr_batch(
                fused, x, q0, xyz, mask, cfg, mesh, k=k, neighbors=nbrs)

        comp_a = jax.jit(fa).lower(fused, x, q0, xyz, mask).compile()
        comp_r = jax.jit(fr).lower(fused, x, q0, xyz, mask).compile()
        comp_c = jax.jit(fc).lower(fused, x, q0, xyz, mask).compile()
        comp_s = jax.jit(fs).lower(fused, x, q0, xyz, mask, nbrs).compile()
        step = make_sharded_train_step(cfg, opt, mesh, neighbor_k=k)
        comp_t = step.lower(state, x, q0, xyz, mask, y, w).compile()

        def stats(comp):
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            return float(ca.get("flops", float("nan")))

        rows[d] = (stats(comp_a), stats(comp_r), stats(comp_t),
                   stats(comp_c), stats(comp_s))

    print(f"per-device SPMD-module flops, N={n}, k={k} "
          "(atom-sharded nbr fwd / ring nbr fwd / sharded train step / "
          "r6 collapse fwd / r6 reuse fwd):")
    print("| D | atom fwd | ring fwd | train step | collapse fwd | "
          "reuse fwd | atom 1/D ratio |")
    print("|---|---|---|---|---|---|---|")
    for d, (a, r, t, c_, s_) in rows.items():
        print(f"| {d} | {a:.3g} | {r:.3g} | {t:.3g} | {c_:.3g} | {s_:.3g} | "
              f"{rows[1][0] / a:.2f}x |")
    return rows


if __name__ == "__main__":
    sweep()
