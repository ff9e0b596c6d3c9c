"""Round-7f battery (one TPU process): clustered far-field TRAINING tier.

  python scripts/tpu_profile_r7f.py

Measures the fused (remat) train step exact vs far_cluster=32 at protein
scale (2,220 atoms) and at 17,760 atoms — the claim behind
TrainConfig.far_cluster ("big-graph fine-tuning accelerator") needs a
hardware number.  uniform_q0=True everywhere (the pad_molecules training
contract), so only the h≠0 rounds differ between the variants.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import load_decay, scan_time, setup_cache, \
    synth_molecule  # noqa: E402

setup_cache()

from epnn_tpu.data.dataset import pad_molecules, round_up  # noqa: E402
from epnn_tpu.ops.fused import forward_blocked, max_neighbor_count  # noqa: E402


def stage_train(n=2220):
    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(0)
    bb = pad_molecules([synth_molecule(n, rng)], table, pad_to=n)
    y = rng.normal(size=bb.q0.shape).astype(np.float32) * 0.1
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: a731
    x, q0, z, m, y = map(put, (bb.x, bb.q0, bb.xyz, bb.node_mask, y))

    for fc in (0, 32):
        def loss(f, fc=fc):
            q = forward_blocked(f, x, q0, z, m, c, block=256, neighbor_k=k,
                                use_pallas=True, remat=True, uniform_q0=True,
                                far_cluster=fc)
            return jnp.sum((q - y) ** 2 * m)

        def step(f, fc=fc):
            g = jax.grad(lambda ff: loss(ff, fc))(f)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, f, g)

        scan_time(f"train-step {n} far_cluster={fc}", step, fused, iters=6)


if __name__ == "__main__":
    for n in (2220, 17760):
        stage_train(n)
