import sys
sys.path.insert(0, "/root/repo/scripts")
from profile_util import setup_cache, synth_molecule, load_decay
setup_cache()
import jax, functools, time
import jax.numpy as jnp, numpy as np
from epnn_tpu.data.dataset import pad_molecules
import epnn_tpu.ops.fused as F

params, cfg, table, fused = load_decay()
rng = np.random.default_rng(0)
N, K = 2220, 24
b = pad_molecules([synth_molecule(N, rng)], table, pad_to=N)
x, q0, xyz, mask = [jax.device_put(a[0]) for a in (b.x, b.q0, b.xyz, b.node_mask)]
nbrs = jax.block_until_ready(F.build_neighbors_batch(xyz[None], mask[None], cfg.cutoff, K))
nb1 = tuple(a[0] for a in nbrs)
single = functools.partial(F._forward_single_nbr, cfg=cfg, block=256, k=K, use_pallas=True)
fwd = jax.jit(lambda qi: single(fused, x, qi, xyz, mask, neighbors=nb1))
q = np.asarray(fwd(q0))
for _ in range(20):
    q2 = fwd(q0)
np.asarray(q2)
with jax.profiler.trace("/tmp/trace_r3m"):
    o = q0
    for _ in range(10):
        o = q0 + 0.0 * fwd(o)
    np.asarray(o)
print("trace captured, sum q:", q.sum(), flush=True)
