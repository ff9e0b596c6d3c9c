"""Round-7d battery (one TPU process): near-field kernels in the
clustered regime.

r5f measured the fused near-field Pallas kernels (EPNN_NEAR_KERNEL=1)
NEUTRAL — the XLA near-chain's layout copies overlapped with the big
far-field kernel in context.  The clustered tier changed the context:
the far-field kernel is down to 0.5 ms/iter at 17,760 (r7b trace), so
the near chain's gathers/copies (~5.7 ms of copies + the multiply_reduce
fusions) are now exposed.  Re-measure the kernels where they matter:
serving reuse at 17,760 with far_cluster=32, plus exact mode and protein
as controls.  Also capture a trace of the winner for the next lever.
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


def stage_big():
    fused, c, k, x, q0, z, m, nbrs = _big_system()

    def fwd(q0_in, fc):
        return forward_blocked(
            fused, x[None], q0_in[None], z[None], m[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=nbrs,
            uniform_q0=True, far_cluster=fc)[0]

    q_ref = {}
    for nk in ("0", "1"):
        os.environ["EPNN_NEAR_KERNEL"] = nk
        jax.clear_caches()
        for fc in (32, 0):
            q = np.asarray(jax.block_until_ready(fwd(q0, fc)))
            if fc in q_ref:
                dq = float(np.abs(q - q_ref[fc]).max())
            else:
                q_ref[fc] = q
                dq = 0.0
            scan_time(f"17760 reuse fc={fc} near_kernel={nk} (dq={dq:.1e})",
                      lambda qi: fwd(qi, fc), q0, iters=8)
    os.environ.pop("EPNN_NEAR_KERNEL", None)


def stage_trace():
    """Trace the clustered C=32 config with near kernels ON (or OFF via
    argv env already set) to find the next lever."""
    fused, c, k, x, q0, z, m, nbrs = _big_system()
    os.environ["EPNN_NEAR_KERNEL"] = os.environ.get("TRACE_NK", "1")
    jax.clear_caches()

    def f(q0_in):
        return forward_blocked(
            fused, x[None], q0_in[None], z[None], m[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=nbrs,
            uniform_q0=True, far_cluster=32)[0]

    scan_time("17760 reuse C=32 (pre-trace warm)", f, q0, iters=8)
    with jax.profiler.trace("/tmp/trace_r7d"):
        o = q0
        for _ in range(10):
            o = q0 + 0.0 * f(o)
        np.asarray(o)
    print("trace captured -> /tmp/trace_r7d", flush=True)
    os.environ.pop("EPNN_NEAR_KERNEL", None)


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

    q_ref = {}
    for nk in ("0", "1"):
        os.environ["EPNN_NEAR_KERNEL"] = nk
        jax.clear_caches()
        for fc in (32, 0):
            q = np.asarray(jax.block_until_ready(fwd(q0, fc)))[0]
            if fc in q_ref:
                dq = float(np.abs(q - q_ref[fc]).max())
            else:
                q_ref[fc] = q
                dq = 0.0
            scan_time(f"protein reuse fc={fc} near_kernel={nk} "
                      f"(dq={dq:.1e})", lambda qi: fwd(qi, fc), q0, iters=15)
    os.environ.pop("EPNN_NEAR_KERNEL", None)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["big", "protein"]
    for s in stages:
        {"big": stage_big, "protein": stage_protein,
         "trace": stage_trace}[s]()
