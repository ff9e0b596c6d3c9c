"""Shared helpers for the TPU profiling batteries (scripts/tpu_profile_*).

ONE copy of the measurement methodology (benchmarks/RESULTS.md round-3
pitfalls):

* `scan_time` — ground truth: repeat the op inside a single jitted
  `lax.scan` with a data dependency between iterations and read back one
  scalar.  Un-scanned per-call timings on this tunnel include an eager
  download of the executable's outputs at ~0.4 GB/s, which inflated
  early round-3 numbers by up to 70×.
* best-of-3 measurement loops after one discarded compile+run (the
  per-executable inflation window).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def setup_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def scan_time(tag, step, x0, iters=10, operands=None):
    """step: carry -> carry (same pytree structure).  Prints/returns the
    best per-iteration ms over 3 measurement loops of one jitted
    scan(length=iters); compile + first run are excluded.

    ``operands``: optional pytree of LARGE arrays forwarded to ``step`` as
    a second argument.  Closed-over concrete arrays are embedded in the
    lowered MLIR as dense constants — at huge N the serialized payload
    blows past the axon remote-compile helper's HTTP body limit (413 at
    568k atoms: ~300 MB of neighbor tables in the closure).  Explicit jit
    operands stay runtime parameters."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def run(x, ops):
        body = ((lambda c, _: (step(c), None)) if operands is None
                else (lambda c, _: (step(c, ops), None)))
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32)), c)

    t0 = time.perf_counter()
    try:
        np.asarray(jax.tree_util.tree_leaves(run(x0, operands))[0])
    except Exception as e:
        print(f"{tag:<52s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(x0, operands))[0])
        ms = 1e3 * (time.perf_counter() - t0) / iters
        best = ms if best is None else min(best, ms)
    print(f"{tag:<52s} {best:9.3f} ms  (compile {compile_s:5.1f}s)",
          flush=True)
    return best


def synth_molecule(n, rng, density=0.1):
    """Protein-density synthetic system (the scaling-benchmark geometry)."""
    import numpy as np

    from epnn_tpu.data.xyz import Molecule

    side = (n / density) ** (1 / 3)
    symbols = list(rng.choice(["H", "C", "N", "O", "S"], size=n,
                              p=[0.5, 0.3, 0.1, 0.09, 0.01]))
    xyz = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
    return Molecule(name=f"synth{n}", symbols=symbols, xyz=xyz,
                    total_charge=0.0)


def load_decay(matmul_precision="default"):
    """(params, cfg, table, fused) for the reference decay model."""
    import jax

    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.io.tf_import import import_reference_model
    from epnn_tpu.ops import fuse_params

    params, cfg = import_reference_model("/root/reference/models",
                                         "decay_model")
    if matmul_precision:
        cfg = cfg.replace(matmul_precision=matmul_precision)
    table = table_for_n_elems(cfg.n_elems)
    fused = jax.device_put(fuse_params(params, cfg))
    return params, cfg, table, fused
