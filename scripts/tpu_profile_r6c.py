"""Round-6c battery (one TPU process): r6b traces + mixed-throughput recheck.

  python scripts/tpu_profile_r6c.py            # all stages
  python scripts/tpu_profile_r6c.py mixed      # just the throughput recheck

Stage trace: device-time breakdown at 17,760 with the collapse on (cold =
in-forward cell-list; reuse = prebuilt neighbors).  Parse with
scripts/trace_parse.py /tmp/trace_r6b_{cold,reuse} 10.

Stage mixed: the bench.py mixed-set host-fed throughput loop, repeated 3x,
to separate tunnel-session variance from a real regression (r5 recorded
17.4k mol/s host-fed; the r6 bench run read 6.9k with an identical code
path).
"""

import os
import sys
import tarfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from scripts.profile_util import load_decay, scan_time, setup_cache, \
    synth_molecule  # noqa: E402

setup_cache()

from epnn_tpu.data.dataset import pad_molecules, round_up  # noqa: E402
from epnn_tpu.ops.fused import (build_neighbors, cell_grid_params,  # noqa: E402
                                forward_blocked, max_neighbor_count)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".cache", "refdata")


def stage_trace():
    params, cfg, table, fused = load_decay()
    n = 17760
    mol = synth_molecule(n, np.random.default_rng(0))
    bb = pad_molecules([mol], table, pad_to=n)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    nc_, cap_ = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
    grid = (round_up(nc_, 512), round_up(cap_, 4))
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m = (put(bb.x[0]), put(bb.q0[0]), put(bb.xyz[0]),
                   put(bb.node_mask[0]))
    nbrs = jax.block_until_ready(
        build_neighbors(z, m, c.cutoff, k, with_d2=True))
    nbrs = tuple(a[None] for a in nbrs)

    def fwd(q0_in, neighbors, g):
        return forward_blocked(
            fused, x[None], q0_in[None], z[None], m[None], c, block=256,
            neighbor_k=k, use_pallas=True, neighbors=neighbors,
            neighbor_grid=g, uniform_q0=True)[0]

    for tag, kw in (("cold", dict(neighbors=None, g=grid)),
                    ("reuse", dict(neighbors=nbrs, g=None))):
        f = lambda qi: fwd(qi, **kw)  # noqa: E731
        scan_time(f"17760 {tag} uq0=1", f, q0, iters=8)
        with jax.profiler.trace(f"/tmp/trace_r6b_{tag}"):
            o = q0
            for _ in range(10):
                o = q0 + 0.0 * f(o)
            np.asarray(o)
        print(f"{tag} trace captured", flush=True)


def stage_mixed():
    from epnn_tpu.data import load_directory

    params, cfg, table, fused = load_decay()
    fused = jax.device_put(fused)
    mixed_dir = os.path.join(CACHE, "mixed")
    if not os.path.isdir(mixed_dir):
        with tarfile.open("/root/reference/data/mixed.tar.gz") as tf:
            tf.extractall(CACHE, filter="data")
    mols = [m for m in load_directory(mixed_dir)
            if m.labels is not None][:1024]
    mbatch = pad_molecules(mols, table, pad_to=48)
    c = cfg.replace(matmul_precision="default")
    bs = 128
    batches = [
        tuple(np.ascontiguousarray(a) for a in
              (sl.x, sl.q0, sl.xyz, sl.node_mask))
        for sl in (mbatch.select(np.arange(s, s + bs))
                   for s in range(0, len(mols), bs))
    ]

    def run_batches(bl):
        outs = [forward_blocked(fused, *b, c, block=48) for b in bl]
        np.asarray(outs[-1])

    run_batches(batches)  # compile
    run_batches(batches)  # discard post-compile measurement
    for rep in range(3):
        t0 = time.perf_counter()
        run_batches(batches)
        dt = time.perf_counter() - t0
        print(f"mixed host-fed rep{rep}: {len(mols)/dt:,.1f} mol/s "
              f"({dt*1e3:.1f} ms)", flush=True)
    dev_batches = [tuple(jax.device_put(a) for a in b) for b in batches]
    run_batches(dev_batches)
    for rep in range(3):
        t0 = time.perf_counter()
        run_batches(dev_batches)
        dt = time.perf_counter() - t0
        print(f"mixed device-resident rep{rep}: {len(mols)/dt:,.1f} mol/s",
              flush=True)


def stage_skin():
    """Verlet-skin MD-step cost vs plain reuse (protein + 17,760).

    skin: d2 re-gather (O(N·k)) INSIDE the timed step (2-tuple neighbors,
    one jitted call) — the honest cost of an MD loop with moving
    coordinates.  reuse: fixed-geometry lower bound."""
    params, cfg, table, fused = load_decay()
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    for n in (2220, 17760):
        mol = synth_molecule(n, np.random.default_rng(0))
        bb = pad_molecules([mol], table, pad_to=n)
        x, q0, z, m = (put(bb.x), put(bb.q0), put(bb.xyz),
                       put(bb.node_mask))
        for skin in (0.0, 0.5):
            cut = c.cutoff + skin
            k = int(round_up(max_neighbor_count(
                bb.xyz[0], bb.node_mask[0], cut) + 4, 8))
            nbrs = jax.block_until_ready(build_neighbors(
                z[0], m[0], cut, k, with_d2=True))
            idx0, m0, d20 = (a[None] for a in nbrs)

            if skin:
                def step(qc, idx0=idx0, m0=m0, k=k):
                    return forward_blocked(
                        fused, x, qc, z, m, c, block=256, neighbor_k=k,
                        use_pallas=True, neighbors=(idx0, m0),
                        uniform_q0=True)
            else:
                def step(qc, nb=(idx0, m0, d20), k=k):
                    return forward_blocked(
                        fused, x, qc, z, m, c, block=256, neighbor_k=k,
                        use_pallas=True, neighbors=nb, uniform_q0=True)

            scan_time(f"N={n} skin={skin} k={k}", step, q0,
                      iters=8 if n > 4000 else 15)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["trace", "mixed", "skin"]
    for s in stages:
        {"trace": stage_trace, "mixed": stage_mixed,
         "skin": stage_skin}[s]()
