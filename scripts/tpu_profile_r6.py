"""Round-6 battery: uniform_q0 round-1 far-field collapse A/B.

Message round 1 runs with h = 0 and q = q0; with the pad_molecules data
contract (q0 = Q/n on valid atoms, [Z, onehot] features) the j-side
projections take one value per element and the O(N²) round-1 far-field
reduction collapses to a count-weighted (N, E+1) grid
(ops/fused.py::_forward_single_nbr uniform_q0).  Expected win: ~1/T of
the far-field cost (T=5 message rounds) at every size.

  python scripts/tpu_profile_r6.py main     # fwd A/B battery + parity
  python scripts/tpu_profile_r6.py train    # train-step A/B
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("EPNN_PLATFORM") == "cpu":  # smoke-testing the battery
    jax.config.update("jax_platforms", "cpu")

from scripts.profile_util import (load_decay, scan_time, setup_cache,  # noqa: E402
                                  synth_molecule)

setup_cache()


def _setup(natoms, params_cfg=None, mol=None):
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import cell_grid_params, max_neighbor_count

    params, cfg, table, fused = params_cfg or load_decay()
    if mol is None:
        mol = synth_molecule(natoms, np.random.default_rng(0))
    bb = pad_molecules([mol], table, pad_to=natoms)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    nc_, cap_ = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
    grid = (round_up(nc_, 512), round_up(cap_, 4))
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    return (cfg, fused, put(bb.x[0]), put(bb.q0[0]), put(bb.xyz[0]),
            put(bb.node_mask[0]), k, grid)


def _fwd_ab(tag, setup, c, use_pallas=True, reuse=False, iters=10):
    from epnn_tpu.ops.fused import build_neighbors, forward_blocked

    cfg, fused, x, q0, z, m, k, grid = setup
    nbrs = None
    if reuse:
        nbrs = jax.block_until_ready(build_neighbors(z, m, c.cutoff, k,
                                                     with_d2=True))
        nbrs = tuple(a[None] for a in nbrs)

    outs = {}
    for uq0 in (False, True):
        def step(qc, uq0=uq0):
            return forward_blocked(
                fused, x[None], qc[None], z[None], m[None], c, block=256,
                neighbor_k=k, use_pallas=use_pallas, neighbors=nbrs,
                neighbor_grid=None if reuse else grid, uniform_q0=uq0,
            )[0]

        scan_time(f"{tag} uq0={int(uq0)}", step, q0, iters=iters)
        outs[uq0] = np.asarray(step(q0))
    d = np.abs(outs[True] - outs[False]).max()
    print(f"{tag} |collapse - base|max = {d:.3e}", flush=True)
    return outs


def stage_main():
    dec = load_decay()

    # real protein for the parity-vs-golden check
    import tarfile

    from epnn_tpu.data.xyz import load_molecule

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "refdata")
    xyz_path = os.path.join(cache, "protein", "6qlp_capped.xyz")
    if not os.path.exists(xyz_path):
        with tarfile.open("/root/reference/data/protein.tar.gz") as tf:
            tf.extractall(cache, filter="data")
    prot = load_molecule(xyz_path)
    golden = np.load(os.path.join(cache, "protein", "preds.npy")).reshape(-1)

    sp = _setup(2220, dec, mol=prot)
    cfg = sp[0]
    fast = cfg.replace(matmul_precision="default")
    parity = cfg.replace(matmul_precision="highest",
                         dense_matmul_precision="default")

    _fwd_ab("protein fast cold", sp, fast)
    _fwd_ab("protein fast reuse", sp, fast, reuse=True)
    po = _fwd_ab("protein parity cold", sp, parity)
    for uq0, q in po.items():
        print(f"parity vs golden (uq0={int(uq0)}): "
              f"{np.abs(q - golden).max():.3e}  cons "
              f"{abs(q.sum() - 2.0):.2e}", flush=True)

    sb = _setup(17760, dec)
    _fwd_ab("17760 fast cold", sb, fast, iters=6)
    _fwd_ab("17760 fast reuse", sb, fast, reuse=True, iters=6)


def stage_train():
    """Protein fine-tune train-step A/B (the remat+vmap path)."""
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import forward_blocked, max_neighbor_count
    import jax.numpy as jnp

    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(0)
    bb = pad_molecules([synth_molecule(2220, rng)], table, pad_to=2220)
    y = rng.normal(size=bb.q0.shape).astype(np.float32) * 0.1
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m, y = map(put, (bb.x, bb.q0, bb.xyz, bb.node_mask, y))

    for uq0 in (False, True):
        def loss(f, uq0=uq0):
            q = forward_blocked(f, x, q0, z, m, c, block=256, neighbor_k=k,
                                use_pallas=True, remat=True, uniform_q0=uq0)
            return jnp.sum((q - y) ** 2 * m)

        def step(f, uq0=uq0):
            g = jax.grad(lambda ff: loss(ff, uq0))(f)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, f, g)

        scan_time(f"train-step 2220 uq0={int(uq0)}", step, fused, iters=6)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "main"
    {"main": stage_main, "train": stage_train}[stage]()
