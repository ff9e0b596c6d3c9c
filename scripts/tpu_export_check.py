"""TPU validation of the AOT serving-export surface (round-10).

One process, three stages (CLAUDE.md: batch TPU experiments):
  1. export the protein serving forward (blocked mode, the Predictor's
     real dispatch incl. the packed Pallas far-field kernel) on the
     axon tunnel, round-trip serialize/deserialize, compare charges
     against the live Predictor;
  2. same for the clustered far-field tier (far_cluster=32);
  3. time artifact serving vs live serving with the serialized-chain
     methodology (the artifact should match live latency — same
     program modulo the export wrapper's re-fusion).

Usage: python scripts/tpu_export_check.py [natoms]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.abspath(".cache/jaxcache"))
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".cache/jaxcache"))

from epnn_tpu.data import load_molecule
from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.infer import Predictor
from epnn_tpu.io.export_serving import export_predictor, load_serving
from epnn_tpu.utils.timing import benchmark_chained

PROTEIN = ".cache/refdata/protein/6qlp_capped.xyz"


def main():
    mol = load_molecule(PROTEIN)
    pred = Predictor.from_reference("/root/reference/models", "decay_model")
    pred = Predictor(params=pred.params,
                     cfg=pred.cfg.replace(matmul_precision="default"),
                     force_mode="blocked")
    table = table_for_n_elems(pred.cfg.n_elems)
    batch = pad_molecules([mol], table)
    print(f"protein: {mol.natoms} atoms, padded {batch.padded_atoms}",
          flush=True)

    for fc in (0, 32):
        tag = f"fc{fc}"
        p = Predictor(params=pred.params, cfg=pred.cfg,
                      force_mode="blocked", far_cluster=fc)
        out = f"/tmp/artifact_protein_{tag}"
        t0 = time.time()
        manifest = export_predictor(p, batch, out)
        print(f"[{tag}] exported (pallas={manifest['use_pallas']}, "
              f"k={manifest['neighbor_k']}) in {time.time()-t0:.1f}s, "
              f"{os.path.getsize(os.path.join(out, 'serving.stablehlo'))/1e6:.1f} MB",
              flush=True)
        art = load_serving(out)
        t0 = time.time()
        q_art = art(batch.x, batch.q0, batch.xyz, batch.node_mask)
        print(f"[{tag}] first artifact call {time.time()-t0:.1f}s "
              "(compile)", flush=True)
        q_live = p.predict_batch(batch)
        dq = np.abs(q_art - q_live).max()
        print(f"[{tag}] max|dq| artifact vs live = {dq:.2e} e; "
              f"sum(q) = {(q_art * batch.node_mask).sum():+.6f} "
              f"(Q = {mol.total_charge:+.1f})", flush=True)
        assert dq < 5e-5, dq

        # latency: serialized chain through the artifact's jitted call
        x, q0, xyz, m = (jax.device_put(np.asarray(a)) for a in (
            batch.x, batch.q0, batch.xyz, batch.node_mask))
        stats = benchmark_chained(
            lambda q0_in: art._call(x, q0_in, xyz, m), q0, iters=30,
            warmup_loops=2)
        live = p.benchmark_batch(batch, iters=30)
        print(f"[{tag}] artifact serving {stats['mean_s']*1e3:.2f} ms vs "
              f"live {live['mean_s']*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
