"""Round-3 battery D: scan-timed round bodies at N=17,760 — account for the
full forward's 506 ms part by part, all with dispatch-free in-jit repetition.

Also quantifies the tunnel's per-call inflation: un-scanned timings include
~(output bytes / 0.4 GB/s) of eager output download (battery B vs C), so
only small-output / scan-timed numbers are real.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from epnn_tpu.data.dataset import pad_molecules, round_up
from epnn_tpu.data.xyz import Molecule
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.io.tf_import import import_reference_model
from epnn_tpu.ops import forward_blocked, fuse_params
from epnn_tpu.ops.fused import (
    build_neighbors, max_neighbor_count, _rbf_gathered, _packed_mids,
    _apply_mlp, _resolve_precision,
)
from epnn_tpu.ops.pallas_kernels import dense_message_rowsum, dense_message_pad

params, cfg = import_reference_model("/root/reference/models", "decay_model")
cfg = cfg.replace(matmul_precision="default")
table = table_for_n_elems(cfg.n_elems)
fused = jax.device_put(fuse_params(params, cfg))
rng = np.random.default_rng(0)


def scan_time(tag, step, x0, iters=10):
    @jax.jit
    def run(x):
        c, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None,
                            length=iters)
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32)), c)

    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(run(x0))[0])
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(x0))[0])
        ms = 1e3 * (time.perf_counter() - t0) / iters
        best = ms if best is None else min(best, ms)
    print(f"{tag:<52s} {best:9.3f} ms  (compile {compile_s:5.1f}s)",
          flush=True)
    return best


def synth(n):
    side = (n / 0.1) ** (1 / 3)
    symbols = list(rng.choice(["H", "C", "N", "O", "S"], size=n,
                              p=[0.5, 0.3, 0.1, 0.09, 0.01]))
    xyz = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
    return Molecule(name=f"synth{n}", symbols=symbols, xyz=xyz,
                    total_charge=0.0)


N, K = 17760, 32
b = pad_molecules([synth(N)], table, pad_to=N)
x = jax.device_put(b.x[0])
q0 = jax.device_put(b.q0[0])
xyz = jax.device_put(b.xyz[0])
mask = jax.device_put(b.node_mask[0])
h1 = int(fused.messages.b1.shape[-1])
prec = _resolve_precision(cfg)

print(f"== scan-timed, N={N}, k={K} ==", flush=True)

# full forward (the number to explain)
fwd = lambda qi: forward_blocked(fused, x[None], qi[None], xyz[None],
                                 mask[None], cfg, block=256, neighbor_k=K,
                                 use_pallas=True)[0]
scan_time("full forward (use_pallas)", lambda qi: q0 + 0.0 * fwd(qi), q0,
          iters=4)

# neighbor construction
scan_time("build_neighbors",
          lambda xi: xi + 0.0 * build_neighbors(xi, mask, cfg.cutoff,
                                                K)[1][:, :1], xyz)

idx, nbr_mask = jax.block_until_ready(jax.jit(
    lambda: build_neighbors(xyz, mask, cfg.cutoff, K))())
idx = jax.device_put(np.asarray(idx))
nbr_mask = jax.device_put(np.asarray(nbr_mask))

# one full message round (far-field kernel + gathered near correction + W_out
# + update MLP), mirroring _forward_single_nbr.message_round
lcm = dense_message_pad(128, 64, h1)
n_pad = int(-(-N // lcm) * lcm)
col_vec = jnp.pad(jnp.ones((N,), jnp.float32), (0, n_pad - N))
w0 = jax.tree_util.tree_map(lambda a: a[0], fused.messages)
(w2, b2), = w0.mids
rbf_nbr, gate_nbr = jax.block_until_ready(jax.jit(
    lambda: _rbf_gathered(xyz, xyz[idx], nbr_mask, cfg))())
msg_count = jnp.full((N,), float(N), jnp.float32)


def message_round(hq):
    h, q = hq
    a = jnp.concatenate([x, h, q[:, None]], axis=-1)
    pi = jnp.dot(a, w0.w1_i, precision=prec) + w0.b1
    pj = jnp.dot(a, w0.w1_j, precision=prec)
    dense_sum = dense_message_rowsum(
        jnp.pad(pi, ((0, n_pad - N), (0, 0))),
        jnp.pad(pj, ((0, n_pad - N), (0, 0))),
        col_vec, w2, b2, block_i=128, block_jp=64, precision="default")[:N]
    pj_nbr = pj[idx]
    epart = jnp.dot(rbf_nbr, w0.w1_e, precision=prec)
    base = pi[:, None, :] + pj_nbr
    hf = jax.nn.relu(base + epart)
    hn = jax.nn.relu(base)
    hf = jax.nn.relu(jnp.dot(hf, w2, precision=prec) + b2)
    hn = jax.nn.relu(jnp.dot(hn, w2, precision=prec) + b2)
    near = jnp.sum((hf - hn) * nbr_mask[:, :, None], axis=1)
    messages = (jnp.dot(dense_sum + near, w0.w_out, precision=prec)
                + msg_count[:, None] * w0.b_out)
    upd = jnp.concatenate([h, messages], axis=-1) * mask[:, None]
    h2 = _apply_mlp(fused.update, upd, prec) * mask[:, None]
    return (h2, q)


h0 = jnp.zeros((N, cfg.h_dim), jnp.float32)
scan_time("message round (kernel + near + update)", message_round, (h0, q0))

# far-field kernel alone
pi0 = jnp.asarray(rng.standard_normal((n_pad, h1)), jnp.float32)
pj0 = jnp.asarray(rng.standard_normal((n_pad, h1)), jnp.float32)
scan_time("far-field packed kernel alone (n_pad)",
          lambda p: p + 0.0 * dense_message_rowsum(
              p, pj0, col_vec, w2, b2, block_i=128, block_jp=64,
              precision="default"), pi0)

# far-field via XLA scan fallback (what use_pallas=False does)
def xla_dense(p):
    blocks = p.reshape(-1, 256, h1)

    def dscan(c, pi_i):
        hid = jax.nn.relu(pi_i[:, None, :] + pj0[None, :, :])
        hid = jax.nn.relu(jnp.dot(hid, w2) + b2)
        return c, jnp.einsum("n,bnh->bh", col_vec, hid)
    _, out = jax.lax.scan(dscan, None, blocks)
    return p + 0.0 * out.reshape(-1, h1)
scan_time("far-field XLA blocked scan alone", xla_dense, pi0, iters=4)

# one electron-passing round
wp = jax.tree_util.tree_map(lambda a: a[0], fused.passes)
(pw2, pb2), = wp.mids


def pass_round(q):
    a = jnp.concatenate([x, h0, q[:, None]], axis=-1)
    pi = jnp.dot(a, wp.w1_i, precision=prec) + wp.b1
    pj = jnp.dot(a, wp.w1_j, precision=prec)
    pi_nbr = pi[idx]
    pj_nbr = pj[idx]
    epart = jnp.dot(rbf_nbr, wp.w1_e, precision=prec)
    hid_n = jax.nn.relu((pi[:, None, :] + pj_nbr) + epart)
    hid_t = jax.nn.relu((pi_nbr + pj[:, None, :]) + epart)
    hid_n = jax.nn.relu(jnp.dot(hid_n, pw2, precision=prec) + pb2)
    hid_t = jax.nn.relu(jnp.dot(hid_t, pw2, precision=prec) + pb2)
    diff = jnp.sum(0.5 * gate_nbr[:, :, None] * (hid_n - hid_t), axis=1)
    dq = jnp.dot(diff, wp.w_out, precision=prec)[:, 0]
    return q + dq


scan_time("pass round (gathered)", pass_round, q0)
print("done", flush=True)
