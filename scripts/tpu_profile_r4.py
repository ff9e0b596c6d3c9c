"""Round-4 TPU measurement battery: far-field kernel roofline work.

One process, one chip (CLAUDE.md: never run two TPU processes).  Measures,
scan-timed (data-dependent repeats inside one jit, scalar readback — the
only methodology that excludes tunnel dispatch, benchmarks/RESULTS.md):

  A. isolated dense_message_rowsum: f32 (new in-tile-spread kernel) vs
     mid_dtype='int8' at protein scale,
  B. end-to-end protein forward: fast / fast+int8 / parity, chained
     wall-clock (bench.py methodology) + numerics vs the golden artifact,
  C. a jax.profiler trace of the fast forward for device-time parsing
     (compare the r3 ground truth: 2.39 ms/inference, 0.247 ms/round
     far-field kernel, 0.22 ms copies).

Run:  python scripts/tpu_profile_r4.py [trace]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import scan_time, setup_cache  # noqa: E402

setup_cache()

REFERENCE_DIR = os.environ.get("EPNN_REFERENCE_DIR", "/root/reference")
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "refdata")


def run_cell_compare(tag, xyz_np, mask_np, cutoff, k):
    from epnn_tpu.ops.fused import (build_neighbors, build_neighbors_cell,
                                    cell_grid_params)

    z = jax.device_put(xyz_np)
    m = jax.device_put(mask_np)
    ncells, cap = cell_grid_params(xyz_np, mask_np, cutoff)
    print(f"  {tag}: k={k} ncells_pad={ncells} cell_cap={cap}")

    def chain(fn):
        # data-dependent chain on the coordinates, scalar-free wall timing
        return lambda zz: zz + 0.0 * fn(zz)[2].sum()

    def topk_fn(zz):
        return build_neighbors(zz, m, cutoff, k, with_d2=True)

    def cell_fn(zz):
        return build_neighbors_cell(zz, m, cutoff, k, ncells, cap,
                                    with_d2=True)

    scan_time(f"  top_k builder {tag}", chain(topk_fn), z, iters=10)
    scan_time(f"  cell builder  {tag}", chain(cell_fn), z, iters=10)
    i1, m1, _ = topk_fn(z)
    i2, m2, _ = cell_fn(z)
    n1 = int(np.asarray(m1).sum())
    n2 = int(np.asarray(m2).sum())
    print(f"    pair counts: topk {n1}  cell {n2}  (must match)")


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.data.xyz import load_molecule
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.io.tf_import import import_reference_model
    from epnn_tpu.ops import forward_blocked, fuse_params
    from epnn_tpu.ops.fused import build_neighbors_batch, max_neighbor_count
    from epnn_tpu.ops.pallas_kernels import dense_message_rowsum

    params, cfg = import_reference_model(
        os.path.join(REFERENCE_DIR, "models"), "decay_model")
    mol = load_molecule(os.path.join(CACHE, "protein", "6qlp_capped.xyz"))
    golden = np.load(os.path.join(CACHE, "protein", "preds.npy")).reshape(-1)
    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules([mol], table, pad_to=2220)
    fused = jax.device_put(fuse_params(params, cfg))
    k = round_up(max_neighbor_count(batch.xyz[0], batch.node_mask[0],
                                    cfg.cutoff) + 4, 8)
    x_d, q0_d, xyz_d, mask_d = (jax.device_put(a) for a in (
        batch.x, batch.q0, batch.xyz, batch.node_mask))
    nbrs = jax.block_until_ready(
        build_neighbors_batch(xyz_d, mask_d, cfg.cutoff, int(k)))

    # ---- A. isolated kernel --------------------------------------------
    print("== A. isolated dense_message_rowsum (N_pad=2304, H=32) ==")
    n_pad, h = 2304, 32
    g = np.random.default_rng(0)
    pi = jax.device_put(g.normal(size=(n_pad, h)).astype(np.float32))
    pj = jax.device_put(g.normal(size=(n_pad, h)).astype(np.float32))
    cv = jax.device_put(np.ones(n_pad, np.float32))
    w2 = jax.device_put((g.normal(size=(h, h)) * 0.3).astype(np.float32))
    b2 = jax.device_put((g.normal(size=h) * 0.1).astype(np.float32))

    for mid in ("float32", "int8"):
        try:
            fn = lambda p: dense_message_rowsum(  # noqa: E731
                p, pj, cv, w2, b2, block_i=128, block_jp=64,
                precision="default", mid_dtype=mid)
            scan_time(f"kernel mid_dtype={mid}",
                      lambda p: pi + 0.0 * fn(p), pi, iters=30)
            out = np.asarray(fn(pi))
            from epnn_tpu.ops.pallas_kernels import (
                dense_message_rowsum_reference)
            ref = dense_message_rowsum_reference(
                np.asarray(pi), np.asarray(pj), np.asarray(cv),
                np.asarray(w2), np.asarray(b2))
            print(f"    max|err| vs f32 oracle: {np.abs(out-ref).max():.3e} "
                  f"(scale {np.abs(ref).max():.3g})")
        except Exception as e:
            print(f"  kernel mid={mid} FAILED: {type(e).__name__}: {e}"[:300])

    # ---- B. end-to-end protein -----------------------------------------
    print("== B. protein end-to-end (chained, reuse-neighbors) ==")

    def run(c, label, neighbors=None, iters=20):
        def fn(q0_in):
            return forward_blocked(fused, x_d, q0_in, xyz_d, mask_d, c,
                                   block=256, neighbor_k=int(k),
                                   use_pallas=True, neighbors=neighbors)

        q = np.asarray(fn(q0_d))[0]
        for _ in range(2):  # discard loops after compile
            q0_in = q0_d
            for _ in range(iters):
                out = fn(q0_in)
                q0_in = q0_d + 0.0 * out[:, :1]
            np.asarray(out)
        q0_in = q0_d
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(q0_in)
            q0_in = q0_d + 0.0 * out[:, :1]
        np.asarray(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        dev_g = np.abs(q - golden).max()
        cons = abs(q.sum() - mol.total_charge)
        print(f"  {label}: {ms:.3f} ms  max|q-golden|={dev_g:.3e}  "
              f"cons={cons:.2e}")
        return ms, q

    c_fast = cfg.replace(matmul_precision="default")
    c_int8 = cfg.replace(matmul_precision="default",
                         dense_matmul_precision="int8")
    c_par = cfg.replace(matmul_precision="highest",
                        dense_matmul_precision="default")
    run(c_fast, "warmup-discard", neighbors=nbrs)
    try:
        run(c_fast, "fast f32 (cold nbrs)")
        run(c_fast, "fast f32 (reuse)", neighbors=nbrs)
    except Exception as e:
        print("  fast FAILED:", f"{type(e).__name__}: {e}"[:300])
    try:
        run(c_int8, "fast int8 (cold nbrs)")
        run(c_int8, "fast int8 (reuse)", neighbors=nbrs)
    except Exception as e:
        print("  int8 FAILED:", f"{type(e).__name__}: {e}"[:300])
    try:
        run(c_par, "parity (cold nbrs)")
    except Exception as e:
        print("  parity FAILED:", f"{type(e).__name__}: {e}"[:300])

    # ---- D. neighbor builders: top_k vs cell list ----------------------
    if "cell" in sys.argv[1:]:
        from epnn_tpu.ops.fused import (build_neighbors, build_neighbors_cell,
                                        cell_grid_params)
        from scripts.profile_util import synth_molecule

        print("== D. neighbor selection: top_k vs cell list ==")
        for tag, z, m, cut in [
            ("protein N=2220", np.asarray(batch.xyz[0]),
             np.asarray(batch.node_mask[0]), cfg.cutoff),
        ]:
            run_cell_compare(tag, z, m, cut, int(k))
        gbig = np.random.default_rng(0)
        big = synth_molecule(17760, gbig)
        bb = pad_molecules([big], table, pad_to=17760)
        from epnn_tpu.ops.fused import max_neighbor_count
        kb = round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                         cfg.cutoff) + 4, 8)
        run_cell_compare("synth N=17760", np.asarray(bb.xyz[0]),
                         np.asarray(bb.node_mask[0]), cfg.cutoff, int(kb))

    # ---- C. profiler trace ---------------------------------------------
    if "trace" in sys.argv[1:]:
        print("== C. profiler trace of fast (reuse) ==")
        tdir = "/tmp/r4trace"

        def fn(q0_in):
            return forward_blocked(fused, x_d, q0_in, xyz_d, mask_d, c_fast,
                                   block=256, neighbor_k=int(k),
                                   use_pallas=True, neighbors=nbrs)

        np.asarray(fn(q0_d))
        with jax.profiler.trace(tdir):
            q0_in = q0_d
            for _ in range(10):
                out = fn(q0_in)
                q0_in = q0_d + 0.0 * out[:, :1]
            np.asarray(out)
        print("trace written to", tdir)


if __name__ == "__main__":
    main()
