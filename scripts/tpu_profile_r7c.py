"""Round-7c battery (one TPU process): clustered-tier FIT-cost levers.

  python scripts/tpu_profile_r7c.py           # all stages
  python scripts/tpu_profile_r7c.py fit       # just the 17,760 variants

The r7b trace showed the k-means fit is the dominant message-round cost
at C=128 (far-field kernel itself is down to 0.5 ms/iter).  This battery
A/Bs the fit knobs shipped in ops/cluster.py — Lloyd iteration count,
fit-dot precision (HIGHEST is 6 MXU passes/dot on a latency-bound chain),
sort-free strided seeding, and subsampled fitting — at the sweep-winning
C=32 and at C=128.  Every variant reports latency, measured max|dq| vs
the exact forward, AND the max intra-cluster radius (the error-bound
factor — max|dq| is 0.0 for these checkpoints regardless, so radius is
the real quality signal between variants).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from scripts.profile_util import load_decay, scan_time, setup_cache, \
    synth_molecule  # noqa: E402

setup_cache()

from epnn_tpu.data.dataset import pad_molecules, round_up  # noqa: E402
from epnn_tpu.ops.fused import (build_neighbors, forward_blocked,  # noqa: E402
                                max_neighbor_count)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".cache", "refdata")

ENVS = ("EPNN_FAR_CLUSTER_ITERS", "EPNN_FAR_CLUSTER_FIT_PREC",
        "EPNN_FAR_CLUSTER_FIT_ROWS", "EPNN_FAR_CLUSTER_SEED")


def _set(iters=None, prec=None, rows=None, seed=None):
    vals = {"EPNN_FAR_CLUSTER_ITERS": iters,
            "EPNN_FAR_CLUSTER_FIT_PREC": prec,
            "EPNN_FAR_CLUSTER_FIT_ROWS": rows,
            "EPNN_FAR_CLUSTER_SEED": seed}
    for k in ENVS:
        if vals[k] is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = str(vals[k])
    jax.clear_caches()


def _big_system(n=17760):
    params, cfg, table, fused = load_decay()
    mol = synth_molecule(n, np.random.default_rng(0))
    bb = pad_molecules([mol], table, pad_to=n)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m = (put(bb.x[0]), put(bb.q0[0]), put(bb.xyz[0]),
                   put(bb.node_mask[0]))
    nbrs = jax.block_until_ready(
        build_neighbors(z, m, c.cutoff, k, with_d2=True))
    nbrs = tuple(a[None] for a in nbrs)
    return fused, c, k, x, q0, z, m, nbrs


VARIANTS = [
    # (tag, iters, prec, rows, seed)
    ("iters=8 norm highest full   [baseline]", None, None, None, None),
    ("iters=2", 2, None, None, None),
    ("iters=2 prec=default", 2, "default", None, None),
    ("iters=2 prec=default seed=stride", 2, "default", None, "stride"),
    ("iters=2 prec=default stride fit_rows=4096", 2, "default", 4096,
     "stride"),
    ("iters=4 prec=default seed=stride", 4, "default", None, "stride"),
]


def stage_fit():
    fused, c, k, x, q0, z, m, nbrs = _big_system()

    def make_fwd(fc):
        def fwd(q0_in):
            q, rad = forward_blocked(
                fused, x[None], q0_in[None], z[None], m[None], c, block=256,
                neighbor_k=k, use_pallas=True, neighbors=nbrs,
                uniform_q0=True, far_cluster=fc, far_diag=True)
            # keep ONE executable for eval + timing: the scan chain carries
            # q; rad rides along as a dead add (0 * rad)
            return q[0] + 0.0 * rad[0]

        def diag(q0_in):
            return forward_blocked(
                fused, x[None], q0_in[None], z[None], m[None], c, block=256,
                neighbor_k=k, use_pallas=True, neighbors=nbrs,
                uniform_q0=True, far_cluster=fc, far_diag=True)

        return fwd, diag

    def exact(q0_in):
        return forward_blocked(
            fused, x[None], q0_in[None], z[None], m[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=nbrs,
            uniform_q0=True)[0]

    q_exact = np.asarray(jax.block_until_ready(exact(q0)))
    scan_time("17760 reuse exact", exact, q0, iters=8)

    # full variant ladder at the sweep-winning C=32; at C=128 only the
    # bracketing combos (baseline was measured in r7b: 28.1 ms)
    for fc, variants in ((32, VARIANTS), (128, [VARIANTS[3], VARIANTS[5]])):
        for tag, iters, prec, rows, seed in variants:
            _set(iters, prec, rows, seed)
            fwd, diag = make_fwd(fc)
            qc, rad = jax.block_until_ready(diag(q0))
            dq = float(np.abs(np.asarray(qc)[0] - q_exact).max())
            r = float(np.asarray(rad)[0])
            scan_time(f"C={fc} {tag} (dq={dq:.1e} rad={r:.3f})",
                      fwd, q0, iters=8)
    _set()


def stage_protein():
    params, cfg, table, fused = load_decay()
    import tarfile

    tgz = os.path.join("/root/reference/data", "protein.tar.gz")
    pdir = os.path.join(CACHE, "protein")
    if not os.path.exists(os.path.join(pdir, "6qlp_capped.xyz")):
        os.makedirs(CACHE, exist_ok=True)
        with tarfile.open(tgz) as t:
            t.extractall(CACHE)
    from epnn_tpu.data.xyz import parse_xyz_file

    mol = parse_xyz_file(os.path.join(pdir, "6qlp_capped.xyz"))
    bb = pad_molecules([mol], table, pad_to=2220)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m = (put(bb.x), put(bb.q0), put(bb.xyz), put(bb.node_mask))
    nbrs = jax.block_until_ready(
        build_neighbors(z[0], m[0], c.cutoff, k, with_d2=True))
    nbrs = tuple(a[None] for a in nbrs)

    def fwd(q0_in, fc):
        return forward_blocked(fused, x, q0_in, z, m, c, block=256,
                               neighbor_k=k, use_pallas=True,
                               neighbors=nbrs, uniform_q0=True,
                               far_cluster=fc)

    q_exact = np.asarray(jax.block_until_ready(fwd(q0, 0)))[0]
    scan_time("protein reuse exact", lambda qi: fwd(qi, 0), q0, iters=15)
    for tag, iters, prec, rows, seed in (VARIANTS[0], VARIANTS[3]):
        _set(iters, prec, rows, seed)
        qc = np.asarray(jax.block_until_ready(fwd(q0, 32)))[0]
        dq = float(np.abs(qc - q_exact).max())
        scan_time(f"protein C=32 {tag} (dq={dq:.1e})",
                  lambda qi: fwd(qi, 32), q0, iters=15)
    _set()


if __name__ == "__main__":
    stages = sys.argv[1:] or ["fit", "protein"]
    for s in stages:
        {"fit": stage_fit, "protein": stage_protein}[s]()
