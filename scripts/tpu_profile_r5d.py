"""Round-5d TPU battery: the near-path gather/copy cost IN CONTEXT.

r5b's trace shows ~1.8 ms/round of gather + k-minor layout copies around
the message/pass near paths at N=17,760, yet r5c measured the same math
isolated at ~0.4 ms/round.  The difference appears only when the round
also contains the Pallas far-field kernel (whose operands pin {1,0}
layouts) and a loop carry.  This battery runs a faithful message-round
scan (kernel + near correction + update matmul) and tries near-path
variants to shake the layout copies out.

Run:  python scripts/tpu_profile_r5d.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_util import scan_time, setup_cache  # noqa: E402

setup_cache()

N, K, H, E = 17760, 40, 32, 16
NPAD = 17920


def main():
    print("device:", jax.devices()[0])
    from epnn_tpu.ops.pallas_kernels import dense_message_rowsum

    rng = np.random.default_rng(0)
    idx = jax.device_put(rng.integers(0, N, (N, K)).astype(np.int32))
    idxT = jnp.asarray(np.ascontiguousarray(np.asarray(idx).T))
    mask = jax.device_put((rng.random((N, K)) > 0.2).astype(np.float32))
    maskT = jnp.asarray(np.ascontiguousarray(np.asarray(mask).T))
    rbf = jax.device_put(rng.normal(size=(N, K, E)).astype(np.float32) *
                         np.asarray(mask)[:, :, None])
    rbfT = jnp.transpose(rbf, (1, 0, 2))
    w1e = jax.device_put(rng.normal(size=(E, H)).astype(np.float32))
    wpi = jax.device_put(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
    wpj = jax.device_put(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
    b1 = jax.device_put(rng.normal(size=(H,)).astype(np.float32))
    w2 = jax.device_put(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
    b2 = jax.device_put(rng.normal(size=(H,)).astype(np.float32))
    wu = jax.device_put(rng.normal(size=(H, H)).astype(np.float32) * 0.1)
    colvec = jnp.ones((NPAD,), jnp.float32)

    def mids(x):
        return jax.nn.relu(jnp.dot(x, w2) + b2)

    def dense(pi, pj):
        out = dense_message_rowsum(
            jnp.pad(pi, ((0, NPAD - N), (0, 0))),
            jnp.pad(pj, ((0, NPAD - N), (0, 0))),
            colvec, w2, b2, block_i=128, block_jp=64,
            precision="default")
        return out[:N]

    def make_round(near):
        def rnd(h, _):
            pi = jnp.dot(h, wpi) + b1
            pj = jnp.dot(h, wpj)
            total = dense(pi, pj) + near(pi, pj)
            h2 = jnp.tanh(jnp.dot(total, wu))
            return h2, None
        return rnd

    def near_v0(pi, pj):
        pj_nbr = pj[idx]
        epart = jnp.dot(rbf, w1e)
        base = pi[:, None, :] + pj_nbr
        return jnp.sum((mids(jax.nn.relu(base + epart))
                        - mids(jax.nn.relu(base))) * mask[:, :, None],
                       axis=1)

    def near_v1(pi, pj):
        pj_nbr = pj[idx]
        epart = jnp.dot(rbf, w1e)
        base = pi[:, None, :] + pj_nbr
        return jnp.sum(mids(jax.nn.relu(base + epart))
                       - mids(jax.nn.relu(base)), axis=1)

    def near_v2(pi, pj):
        pj_nbr = pj[idx]
        epart = jnp.dot(rbf, w1e)
        base = pi[:, None, :] + pj_nbr
        diff = mids(jax.nn.relu(base + epart)) - mids(jax.nn.relu(base))
        return jax.lax.dot_general(
            diff, mask, (((1,), (1,)), ((0,), (0,))))

    def near_v3(pi, pj):
        pj_nbr = pj[idxT]                     # (K, N, H)
        epart = jnp.dot(rbfT, w1e)
        base = pi[None, :, :] + pj_nbr
        return jnp.sum((mids(jax.nn.relu(base + epart))
                        - mids(jax.nn.relu(base))) * maskT[:, :, None],
                       axis=0)

    def no_near(pi, pj):
        return 0.0

    h0 = jax.device_put(rng.normal(size=(N, H)).astype(np.float32))

    def scanner(near):
        def step(h):
            h2, _ = jax.lax.scan(make_round(near), h, None, length=5)
            return h2
        return step

    for tag, near in (("kernel only (no near)", no_near),
                      ("ctx v0 (current 3-D)", near_v0),
                      ("ctx v1 (no mask mul)", near_v1),
                      ("ctx v2 (reduce as dot)", near_v2),
                      ("ctx v3 (K,N,H)", near_v3)):
        scan_time(f"  {tag}", scanner(near), h0, iters=4)


if __name__ == "__main__":
    main()
