"""Round-3 battery G: protein fine-tune step with the B=1 vmap bypass
(RESULTS.md documented 21.1 ms/step vmapped, packed-kernel VJP)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.data.xyz import load_molecule
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.train.loop import TrainState, train_step_fused

params, cfg = import_reference_model("/root/reference/models", "decay_model")
cfg = cfg.replace(matmul_precision="default")
table = table_for_n_elems(cfg.n_elems)

mol = load_molecule(os.path.join(REPO, ".cache/refdata/protein/6qlp_capped.xyz"))
pb = pad_molecules([mol], table, pad_to=2220)
gold = np.load(os.path.join(REPO, ".cache/refdata/protein/preds.npy")).reshape(1, -1)
y = jnp.asarray(np.pad(gold, ((0, 0), (0, 2220 - gold.shape[1]))))
x, q0, xyz, mask = [jax.device_put(a) for a in (pb.x, pb.q0, pb.xyz, pb.node_mask)]
weight = jnp.ones((1,), jnp.float32)

opt = optax.adam(1e-4, eps=1e-7)
state0 = TrainState(params=params, opt_state=opt.init(params), step=0)

for use_pallas in (True, False):
    def step(state):
        new_state, loss, _, _ = train_step_fused(
            state, cfg, "masked_mse", opt, 256, 32, x, q0, xyz, mask, y, weight,
            use_pallas=use_pallas)
        return new_state, loss

    t0 = time.perf_counter()
    s, l0 = step(state0)
    jax.block_until_ready(l0)
    compile_s = time.perf_counter() - t0
    losses = []
    for loop in range(2):
        s = state0
        t0 = time.perf_counter()
        for _ in range(15):
            s, l = step(s)
        lv = float(l)
        ms = 1e3 * (time.perf_counter() - t0) / 15
    print(f"train step use_pallas={use_pallas}: {ms:7.2f} ms/step  "
          f"loss0 {float(l0):.5f} loss15 {lv:.5f}  (compile {compile_s:.0f}s)",
          flush=True)
print("done", flush=True)
