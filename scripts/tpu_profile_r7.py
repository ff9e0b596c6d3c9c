"""Round-7 battery (one TPU process): clustered far-field tier deep-dive.

  python scripts/tpu_profile_r7.py             # all stages
  python scripts/tpu_profile_r7.py sweep       # just the C sweep

Stage sweep: 17,760 atoms, serving reuse mode — latency + measured
max|dq| vs the exact forward across C (the bench captures only C=128);
also k-means iteration-count sensitivity (EPNN_FAR_CLUSTER_ITERS).

Stage trace: device-time breakdown at 17,760 with far_cluster=128 (the
post-cluster twin of the r6b trace — decides the NEXT bottleneck: pass
scan? k-means? near path?).  Parse with
scripts/trace_parse.py /tmp/trace_r7_cluster 10.

Stage protein: clustered tier at 2,220 atoms (protein is base-dominated;
expected ~1 ms of the 3.7 ms — measure, don't guess).
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


def stage_sweep():
    fused, c, k, x, q0, z, m, nbrs = _big_system()

    def fwd(q0_in, fc):
        return forward_blocked(
            fused, x[None], q0_in[None], z[None], m[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=nbrs,
            uniform_q0=True, far_cluster=fc)[0]

    q_exact = np.asarray(jax.block_until_ready(fwd(q0, 0)))
    scan_time("17760 reuse exact", lambda qi: fwd(qi, 0), q0, iters=8)
    for fc in (32, 64, 128, 256, 512):
        qc = np.asarray(jax.block_until_ready(fwd(q0, fc)))
        dq = float(np.abs(qc - q_exact).max())
        scan_time(f"17760 reuse C={fc} (max_dq={dq:.2e})",
                  lambda qi: fwd(qi, fc), q0, iters=8)
    # k-means iteration sensitivity at C=128 (fit cost is O(N*C*iters))
    for it in ("2", "4", "16"):
        os.environ["EPNN_FAR_CLUSTER_ITERS"] = it
        jax.clear_caches()
        qc = np.asarray(jax.block_until_ready(fwd(q0, 128)))
        dq = float(np.abs(qc - q_exact).max())
        scan_time(f"17760 reuse C=128 iters={it} (max_dq={dq:.2e})",
                  lambda qi: fwd(qi, 128), q0, iters=8)
    os.environ.pop("EPNN_FAR_CLUSTER_ITERS", None)


def stage_trace():
    fused, c, k, x, q0, z, m, nbrs = _big_system()

    def f(q0_in):
        return forward_blocked(
            fused, x[None], q0_in[None], z[None], m[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=nbrs,
            uniform_q0=True, far_cluster=128)[0]

    scan_time("17760 reuse C=128 (pre-trace warm)", f, q0, iters=8)
    with jax.profiler.trace("/tmp/trace_r7_cluster"):
        o = q0
        for _ in range(10):
            o = q0 + 0.0 * f(o)
        np.asarray(o)
    print("cluster trace captured -> /tmp/trace_r7_cluster", flush=True)


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
    for fc in (32, 128):
        qc = np.asarray(jax.block_until_ready(fwd(q0, fc)))[0]
        dq = float(np.abs(qc - q_exact).max())
        scan_time(f"protein reuse C={fc} (max_dq={dq:.2e})",
                  lambda qi: fwd(qi, fc), q0, iters=15)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["sweep", "protein", "trace"]
    for s in stages:
        {"sweep": stage_sweep, "protein": stage_protein,
         "trace": stage_trace}[s]()
