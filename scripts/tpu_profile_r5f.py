"""Round-5f battery: fused near-field Pallas kernels A/B.

The r5 backlog's remaining lever: near_message_corr + near_pass_rowsum
(pallas_kernels.py) replace the XLA (N, k, H) elementwise chains in
_forward_single_nbr, keeping the row gathers in XLA.  Expected win:
~0.8 ms/round of k-minor layout copies at N=17,760 (r5b trace), ~0.1 ms/
round at protein scale.

Stages (each its own TPU process — Mosaic aborts can kill a process, so
the risky compiles are isolated; run sequentially, never concurrently):

  python scripts/tpu_profile_r5f.py compile-parity   # HIGHEST in-kernel dots
  python scripts/tpu_profile_r5f.py compile-vmap     # vmapped kernels (B=16)
  python scripts/tpu_profile_r5f.py main             # fwd A/B battery
  python scripts/tpu_profile_r5f.py train            # train-step A/B
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("EPNN_PLATFORM") == "cpu":  # smoke-testing the battery
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import (load_decay, scan_time, setup_cache,  # noqa: E402
                                  synth_molecule)

setup_cache()


def _protein_setup(params_cfg=None, natoms=2220):
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import cell_grid_params, max_neighbor_count

    params, cfg, table, fused = params_cfg or load_decay()
    bb = pad_molecules([synth_molecule(natoms, np.random.default_rng(0))],
                       table, pad_to=natoms)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    nc_, cap_ = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
    grid = (round_up(nc_, 512), round_up(cap_, 4))
    put = lambda a: jax.device_put(np.asarray(a))
    return (cfg, fused, put(bb.x[0]), put(bb.q0[0]), put(bb.xyz[0]),
            put(bb.node_mask[0]), k, grid)


def stage_compile_parity():
    """Parity config = near/pass math at fp32-HIGHEST.  Known Mosaic risk:
    HIGHEST dots on big tiles inside Pallas can abort the compiler."""
    from epnn_tpu.ops.fused import forward_blocked

    cfg, fused, x, q0, z, m, k, grid = _protein_setup()
    c = cfg.replace(matmul_precision="highest",
                    dense_matmul_precision="default")
    os.environ["EPNN_NEAR_KERNEL"] = "1"
    out = forward_blocked(fused, x[None], q0[None], z[None], m[None], c,
                          block=256, neighbor_k=k, use_pallas=True,
                          neighbor_grid=grid)
    q = np.asarray(out)[0]
    print("PARITY-COMPILE-OK", float(np.abs(q).max()),
          "cons", float(abs(q.sum())))


def stage_compile_vmap():
    """Mixed-training shape: B=16 molecules of N=48, vmapped kernels."""
    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.ops.fused import forward_blocked

    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(1)
    mols = [synth_molecule(40 + int(rng.integers(0, 8)), rng)
            for _ in range(16)]
    bb = pad_molecules(mols, table, pad_to=48)
    put = lambda a: jax.device_put(np.asarray(a))
    x, q0, z, m = put(bb.x), put(bb.q0), put(bb.xyz), put(bb.node_mask)
    os.environ["EPNN_NEAR_KERNEL"] = "1"
    out = forward_blocked(fused, x, q0, z, m,
                          cfg.replace(matmul_precision="default"),
                          block=48, neighbor_k=32, use_pallas=True)
    q = np.asarray(out)
    cons = np.abs((q * np.asarray(bb.node_mask)).sum(1)
                  - np.asarray([mm.total_charge for mm in mols])).max()
    print("VMAP-COMPILE-OK", float(np.abs(q).max()), "cons", float(cons))

    # and the vmapped TRAIN step (backward = XLA recompute through the ref)
    def loss(f):
        o = forward_blocked(f, x, q0, z, m,
                            cfg.replace(matmul_precision="default"),
                            block=48, neighbor_k=32, use_pallas=True)
        return jnp.sum(o**2)

    g = jax.jit(jax.grad(loss))(fused)
    gn = float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g, 0.0))
    print("VMAP-GRAD-OK", gn)


def _ab(tag, fn_factory, q0, iters=10):
    """Build + time the same forward with the near kernels off then on.
    Separate jit wrappers per setting (env is read at trace time)."""
    for flag in ("0", "1"):
        os.environ["EPNN_NEAR_KERNEL"] = flag
        fn = fn_factory()
        q = np.asarray(fn(q0))
        scan_time(f"  {tag} near={flag}", fn, q0, iters=iters)
        yield q


def stage_main():
    from epnn_tpu.ops.fused import build_neighbors, forward_blocked

    print("device:", jax.devices()[0])
    pc = load_decay()

    for natoms, iters in ((2220, 10), (17760, 8)):
        cfg, fused, x, q0, z, m, k, grid = _protein_setup(pc, natoms)
        c_fast = cfg.replace(matmul_precision="default")
        print(f"== N={natoms} k={k} ==")

        def cold_factory():
            def fwd(qq):
                return forward_blocked(
                    fused, x[None], qq[None], z[None], m[None], c_fast,
                    block=256, neighbor_k=k, use_pallas=True,
                    neighbor_grid=grid)[0]
            return fwd

        q_off, q_on = _ab("cold", cold_factory, q0, iters)
        print(f"  cold |q_on - q_off|max = {np.abs(q_on - q_off).max():.3e}"
              f"  cons_on = {abs(q_on.sum()):.3e}")

        nbrs = jax.block_until_ready(
            build_neighbors(z, m, float(cfg.cutoff), k, with_d2=True))

        def reuse_factory():
            def fwd(qq):
                return forward_blocked(
                    fused, x[None], qq[None], z[None], m[None], c_fast,
                    block=256, neighbor_k=k, use_pallas=True,
                    neighbors=tuple(a[None] for a in nbrs))[0]
            return fwd

        q_off, q_on = _ab("reuse", reuse_factory, q0, iters)
        print(f"  reuse |q_on - q_off|max = {np.abs(q_on - q_off).max():.3e}")

    # parity-grade config (near math at HIGHEST) — A/B only if stage
    # compile-parity passed; EPNN_R5F_PARITY=0 skips the near=1 arm.
    cfg, fused, x, q0, z, m, k, grid = _protein_setup(pc)
    c_par = cfg.replace(matmul_precision="highest",
                        dense_matmul_precision="default")
    print("== N=2220 parity-grade ==")

    def par_factory():
        def fwd(qq):
            return forward_blocked(
                fused, x[None], qq[None], z[None], m[None], c_par,
                block=256, neighbor_k=k, use_pallas=True,
                neighbor_grid=grid)[0]
        return fwd

    if os.environ.get("EPNN_R5F_PARITY", "1") == "1":
        q_off, q_on = _ab("parity", par_factory, q0, 10)
        print(f"  parity |q_on - q_off|max = {np.abs(q_on - q_off).max():.3e}")
    else:
        os.environ["EPNN_NEAR_KERNEL"] = "0"
        fn = par_factory()
        np.asarray(fn(q0))
        scan_time("  parity near=0", fn, q0, iters=10)


def stage_train():
    """Protein-scale fine-tune step (B=1, remat) A/B — the backward runs
    the XLA-recompute custom VJPs of both near kernels under jax.checkpoint."""
    import optax

    from epnn_tpu.train.loop import TrainState, train_step_fused

    print("device:", jax.devices()[0])
    pc = load_decay()
    cfg, fused, x, q0, z, m, k, grid = _protein_setup(pc)
    params = pc[0]
    tx = optax.adam(1e-4, eps=1e-7)
    y = jax.device_put(np.zeros((1, 2220), np.float32))
    w = jax.device_put(np.ones((1,), np.float32))
    xb, qb, zb, mb = x[None], q0[None], z[None], m[None]

    for flag in ("0", "1"):
        os.environ["EPNN_NEAR_KERNEL"] = flag
        state0 = TrainState(params=params, opt_state=tx.init(params),
                            step=jnp.zeros((), jnp.int32))

        # carry the STATE through the scan (real training dependency chain)
        def timed(state):
            s2, loss, pred, mets = train_step_fused(
                state, cfg, "masked_mse", tx, 256, int(k),
                xb, qb, zb, mb, y, w, use_pallas=True)
            return s2

        jax.block_until_ready(timed(state0).params)
        scan_time(f"  train-step near={flag}", timed, state0, iters=8)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "main"
    {"compile-parity": stage_compile_parity,
     "compile-vmap": stage_compile_vmap,
     "main": stage_main,
     "train": stage_train}[stage]()
