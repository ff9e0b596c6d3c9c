"""Headline benchmark: whole-protein (Galectin-3C, 2,220 atoms) inference
latency on one TPU chip.

The reference never recorded a number for this (SURVEY §6) — its infer.py
only prints timings and crashes as shipped.  BASELINE.md's north-star target
is <10 ms/graph on one v5e chip, so ``vs_baseline`` is reported as
10 ms / measured ms (>1 means beating the target).

Prints ONE JSON line. Falls back to a synthetic 2,220-atom system when the
reference data mount is absent (same shapes, same work).
"""

from __future__ import annotations

import json
import os
import sys
import tarfile
import time

import numpy as np

REFERENCE_DIR = os.environ.get("EPNN_REFERENCE_DIR", "/root/reference")
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "refdata")
BASELINE_MS = 10.0
N_PROTEIN = 2220


def _protein_molecule():
    from epnn_tpu.data.xyz import Molecule, load_molecule

    tar = os.path.join(REFERENCE_DIR, "data", "protein.tar.gz")
    xyz_path = os.path.join(CACHE, "protein", "6qlp_capped.xyz")
    if not os.path.exists(xyz_path) and os.path.exists(tar):
        os.makedirs(CACHE, exist_ok=True)
        with tarfile.open(tar) as tf:
            tf.extractall(CACHE)
    if os.path.exists(xyz_path):
        return load_molecule(xyz_path), True
    rng = np.random.default_rng(0)
    symbols = list(rng.choice(["H", "C", "N", "O", "S"], size=N_PROTEIN,
                              p=[0.5, 0.3, 0.1, 0.09, 0.01]))
    # ~protein density: 2220 atoms in a ~28 A box
    xyz = rng.uniform(0, 28.0, size=(N_PROTEIN, 3)).astype(np.float32)
    return Molecule(name="synthetic2220", symbols=symbols, xyz=xyz,
                    total_charge=2.0), False


def main():
    import jax

    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.models import PRESETS, init_params
    from epnn_tpu.ops import forward_blocked, fuse_params

    mol, real_data = _protein_molecule()

    models_dir = os.path.join(REFERENCE_DIR, "models")
    golden = None
    if real_data and os.path.exists(os.path.join(models_dir, "decay_model_weights.index")):
        from epnn_tpu.io.tf_import import import_reference_model

        params, cfg = import_reference_model(models_dir, "decay_model")
        gp = os.path.join(CACHE, "protein", "preds.npy")
        if os.path.exists(gp):
            golden = np.load(gp).reshape(-1)
    else:
        cfg = PRESETS["decay_model"]
        params = init_params(cfg, jax.random.key(0))

    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules([mol], table, pad_to=N_PROTEIN)
    fused = jax.device_put(fuse_params(params, cfg))
    block = int(os.environ.get("EPNN_BENCH_BLOCK", "256"))
    args = [jax.device_put(a) for a in
            (batch.x, batch.q0, batch.xyz, batch.node_mask)]

    x_d, q0_d, xyz_d, mask_d = args

    def fn(q0_in):
        return forward_blocked(fused, x_d, q0_in, xyz_d, mask_d, cfg, block=block)

    q = np.asarray(fn(q0_d))[0]  # compile + warmup (readback = true sync)
    np.asarray(fn(q0_d))

    # Measurement methodology: on the tunneled TPU backend
    # jax.block_until_ready can return before execution finishes, so latency
    # is measured over a serialized chain — each iteration's q0 carries a
    # zero-weighted dependency on the previous output (numerics unchanged) —
    # terminated by a host readback, which is a hard sync.
    iters = int(os.environ.get("EPNN_BENCH_ITERS", "20"))
    q0_in = q0_d
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q0_in)
        q0_in = q0_d + 0.0 * out[:, :1]
    np.asarray(out)
    ms = float((time.perf_counter() - t0) / iters * 1e3)

    extra = {
        "device": str(jax.devices()[0]),
        "iters": iters,
        "conservation_error": float(abs(q.sum() - mol.total_charge)),
        "real_protein": real_data,
    }
    if golden is not None:
        extra["parity_max_abs_diff"] = float(np.abs(q - golden).max())

    print(json.dumps({
        "metric": "protein_2220atom_inference_ms",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 4),
        **extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
