"""Round-4e: protein-scale train-step timing after the r4 kernel changes.

The r3 record is 25.8 ms/step for the fused (packed-kernel, remat'd)
protein fine-tune step.  Training configs default to mask_messages=True
(clean mode), so the r4 entry padding + in-tile lane spread apply on this
path — re-measure.  Run: python scripts/tpu_profile_r4e.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import optax  # noqa: E402

from scripts.profile_util import setup_cache, synth_molecule  # noqa: E402

setup_cache()


def main():
    print("device:", jax.devices()[0])
    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.models import EPNNConfig, init_params
    from epnn_tpu.ops.fused import max_neighbor_count
    from epnn_tpu.train.loop import TrainState, train_step_fused

    cfg = EPNNConfig(n_elems=10, T=5, mask_messages=True)  # clean default
    params = init_params(cfg, jax.random.key(0))
    table = table_for_n_elems(cfg.n_elems)
    mol = synth_molecule(2220, np.random.default_rng(0))
    b = pad_molecules([mol], table, pad_to=2220)
    k = int(round_up(max_neighbor_count(b.xyz[0], b.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    y = np.random.default_rng(1).normal(
        size=b.q0.shape).astype(np.float32) * 0.1
    w = np.ones((1,), np.float32)
    opt = optax.adam(1e-4)
    state = TrainState(params=params, opt_state=opt.init(params), step=0)
    args = tuple(jax.device_put(a) for a in
                 (b.x, b.q0, b.xyz, b.node_mask, y, w))

    for use_pallas in (True, False):
        st = state
        st, loss, _, _ = train_step_fused(st, cfg, "masked_mse", opt, 256,
                                          k, *args, use_pallas=use_pallas)
        float(loss)  # compile + sync
        for _ in range(15):  # discard loop (per-executable inflation)
            st, loss, _, _ = train_step_fused(st, cfg, "masked_mse", opt,
                                              256, k, *args,
                                              use_pallas=use_pallas)
        float(loss)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            st, loss, _, _ = train_step_fused(st, cfg, "masked_mse", opt,
                                              256, k, *args,
                                              use_pallas=use_pallas)
        lf = float(loss)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"  train_step_fused use_pallas={use_pallas}: {ms:.1f} ms/step"
              f" (loss {lf:.4f})")


if __name__ == "__main__":
    main()
