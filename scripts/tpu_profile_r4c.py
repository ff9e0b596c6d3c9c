"""Round-4c: bench-harness overhead decomposition on the tunnel.

Same forward, three chain implementations:
  (a) bench.py today: jitted forward + EAGER chain-add per iteration
      (two dispatches per iter),
  (b) jitted chain: forward and the zero-weighted dependency fused into
      ONE jitted call per iteration (one dispatch per iter),
  (c) lax.scan over iterations inside one jit (zero per-iter dispatch —
      the device-time ground truth).

(a)-(b) = the eager-op dispatch cost; (b)-(c) = the per-call dispatch
cost of one jitted program.  Run: python scripts/tpu_profile_r4c.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import setup_cache  # noqa: E402

setup_cache()

REFERENCE_DIR = os.environ.get("EPNN_REFERENCE_DIR", "/root/reference")
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "refdata")


def main():
    print("device:", jax.devices()[0])
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.data.xyz import load_molecule
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.io.tf_import import import_reference_model
    from epnn_tpu.ops import forward_blocked, fuse_params
    from epnn_tpu.ops.fused import (build_neighbors_batch, cell_grid_params,
                                    max_neighbor_count)

    params, cfg = import_reference_model(
        os.path.join(REFERENCE_DIR, "models"), "decay_model")
    mol = load_molecule(os.path.join(CACHE, "protein", "6qlp_capped.xyz"))
    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules([mol], table, pad_to=2220)
    fused = jax.device_put(fuse_params(params, cfg))
    k = round_up(max_neighbor_count(batch.xyz[0], batch.node_mask[0],
                                    cfg.cutoff) + 4, 8)
    nc_, cap_ = cell_grid_params(batch.xyz[0], batch.node_mask[0], cfg.cutoff)
    grid = (round_up(nc_, 512), round_up(cap_, 4))
    x_d, q0_d, xyz_d, mask_d = (jax.device_put(a) for a in (
        batch.x, batch.q0, batch.xyz, batch.node_mask))
    c = cfg.replace(matmul_precision="default")
    iters = 20

    def fwd(q0_in):
        return forward_blocked(fused, x_d, q0_in, xyz_d, mask_d, c,
                               block=256, neighbor_k=int(k), use_pallas=True,
                               neighbor_grid=grid)

    @jax.jit
    def fwd_chained(q0_base, prev):
        return fwd(q0_base + 0.0 * prev[:, :1])

    @jax.jit
    def fwd_scan(q0_base):
        def body(prev, _):
            out = fwd(q0_base + 0.0 * prev[:, :1])
            return out, out[0, 0]

        _, ys = jax.lax.scan(body, q0_base, None, length=iters)
        return ys.sum()

    def measure(label, loop):
        loop()  # compile
        for _ in range(2):
            loop()
        t0 = time.perf_counter()
        loop()
        print(f"  {label}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms/iter")

    def loop_eager():
        q0_in = q0_d
        for _ in range(iters):
            out = fwd(q0_in)
            q0_in = q0_d + 0.0 * out[:, :1]
        np.asarray(out)

    def loop_jitted():
        prev = q0_d[:, :]
        for _ in range(iters):
            prev = fwd_chained(q0_d, prev)
        np.asarray(prev)

    def loop_scan():
        float(fwd_scan(q0_d))

    print("== harness overhead decomposition (protein, fast, cold) ==")
    measure("(a) eager chain-add (bench.py today)", loop_eager)
    measure("(b) jitted chain (one dispatch/iter)", loop_jitted)
    measure("(c) lax.scan in one jit (device time)", loop_scan)

    if "trace" in sys.argv[1:]:
        import shutil

        shutil.rmtree("/tmp/r4cold", ignore_errors=True)
        prev = q0_d
        with jax.profiler.trace("/tmp/r4cold"):
            for _ in range(10):
                prev = fwd_chained(q0_d, prev)
            np.asarray(prev)
        print("trace written to /tmp/r4cold")


if __name__ == "__main__":
    main()
