"""Round-5c TPU battery: near-path formulations vs the gather-layout
copies.

The r5b trace showed XLA materializing the (N, k, H)/(N, k, 2H) gather
outputs of the message/pass near paths through transposed-layout copies
(copy.235 f32[17920,32,32]{0,2,1}, copy.238 f32[17920,32,64]{0,2,1} —
~5.7 ms/iter at N=17,760).  This battery measures one message-round near
correction and one pass round in four formulations:

  v0  current 3-D (N, K, H), mask/gate broadcast multiplies
  v1  v0 with the near-correction mask multiply dropped (redundant:
      rbf_and_gate zeroes rbf on masked slots, so hid_full == hid_nofeat
      there already)
  v2  (K, N, H) axis order (reduce over the major axis)
  v3  flat (N·K, H) 2-D chain, 3-D only at the final masked reduce

Run:  python scripts/tpu_profile_r5c.py
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


def relu(x):
    return jax.nn.relu(x)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    idx = jax.device_put(rng.integers(0, N, (N, K)).astype(np.int32))
    idxT = jnp.asarray(np.ascontiguousarray(np.asarray(idx).T))
    mask = jax.device_put((rng.random((N, K)) > 0.2).astype(np.float32))
    maskT = jnp.asarray(np.ascontiguousarray(np.asarray(mask).T))
    rbf = jax.device_put(rng.normal(size=(N, K, E)).astype(np.float32) *
                         np.asarray(mask)[:, :, None])
    rbfT = jnp.transpose(rbf, (1, 0, 2))
    rbf_f = rbf.reshape(N * K, E)
    w1e = jax.device_put(rng.normal(size=(E, H)).astype(np.float32))
    w2 = jax.device_put(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
    b2 = jax.device_put(rng.normal(size=(H,)).astype(np.float32))
    wo = jax.device_put(rng.normal(size=(H, 1)).astype(np.float32))

    def mids(x):
        return relu(jnp.dot(x, w2) + b2)

    # ---- message-round near correction ----
    def msg_v0(pj):
        pi = pj * 0.5 + 1.0
        pj_nbr = pj[idx]
        epart = jnp.dot(rbf, w1e)
        base = pi[:, None, :] + pj_nbr
        corr = jnp.sum((mids(relu(base + epart)) - mids(relu(base)))
                       * mask[:, :, None], axis=1)
        return pj + 0.0 * corr

    def msg_v1(pj):
        pi = pj * 0.5 + 1.0
        pj_nbr = pj[idx]
        epart = jnp.dot(rbf, w1e)
        base = pi[:, None, :] + pj_nbr
        corr = jnp.sum(mids(relu(base + epart)) - mids(relu(base)), axis=1)
        return pj + 0.0 * corr

    def msg_v2(pj):
        pi = pj * 0.5 + 1.0
        pj_nbr = pj[idxT]                     # (K, N, H)
        epart = jnp.dot(rbfT, w1e)
        base = pi[None, :, :] + pj_nbr
        corr = jnp.sum((mids(relu(base + epart)) - mids(relu(base)))
                       * maskT[:, :, None], axis=0)
        return pj + 0.0 * corr

    def msg_v3(pj):
        pi = pj * 0.5 + 1.0
        pj_f = pj[idx.reshape(-1)]            # (N·K, H)
        pi_f = jnp.broadcast_to(pi[:, None, :], (N, K, H)).reshape(N * K, H)
        epart = jnp.dot(rbf_f, w1e)
        base = pi_f + pj_f
        corr = jnp.sum(
            (mids(relu(base + epart)) - mids(relu(base))).reshape(N, K, H)
            * mask[:, :, None], axis=1)
        return pj + 0.0 * corr

    # ---- pass round ----
    def pass_v0(pj):
        pi = pj * 0.5 + 1.0
        pp = jnp.concatenate([pi, pj], axis=-1)[idx]
        pi_nbr, pj_nbr = pp[..., :H], pp[..., H:]
        epart = jnp.dot(rbf, w1e)
        hid_n = mids(relu((pi[:, None, :] + pj_nbr) + epart))
        hid_t = mids(relu((pi_nbr + pj[None, :, :].transpose(1, 0, 2))
                          + epart))
        diff = hid_n - hid_t
        dsum = jnp.sum(0.5 * mask[:, :, None] * diff, axis=1)
        return pj + 0.0 * jnp.dot(dsum, wo)

    def pass_v2(pj):
        pi = pj * 0.5 + 1.0
        pp = jnp.concatenate([pi, pj], axis=-1)[idxT]   # (K, N, 2H)
        pi_nbr, pj_nbr = pp[..., :H], pp[..., H:]
        epart = jnp.dot(rbfT, w1e)
        hid_n = mids(relu((pi[None, :, :] + pj_nbr) + epart))
        hid_t = mids(relu((pi_nbr + pj[None, :, :]) + epart))
        diff = hid_n - hid_t
        dsum = jnp.sum(0.5 * maskT[:, :, None] * diff, axis=0)
        return pj + 0.0 * jnp.dot(dsum, wo)

    def pass_v3(pj):
        pi = pj * 0.5 + 1.0
        pp_f = jnp.concatenate([pi, pj], axis=-1)[idx.reshape(-1)]
        pi_f = jnp.broadcast_to(pi[:, None, :], (N, K, H)).reshape(N * K, H)
        pj_bf = jnp.broadcast_to(pj[:, None, :], (N, K, H)).reshape(N * K, H)
        epart = jnp.dot(rbf_f, w1e)
        hid_n = mids(relu((pi_f + pp_f[:, H:]) + epart))
        hid_t = mids(relu((pp_f[:, :H] + pj_bf) + epart))
        diff = (hid_n - hid_t).reshape(N, K, H)
        dsum = jnp.sum(0.5 * mask[:, :, None] * diff, axis=1)
        return pj + 0.0 * jnp.dot(dsum, wo)

    pj0 = jax.device_put(rng.normal(size=(N, H)).astype(np.float32))
    for tag, fn in (("msg v0 (current 3-D)", msg_v0),
                    ("msg v1 (no mask mul)", msg_v1),
                    ("msg v2 (K,N,H)", msg_v2),
                    ("msg v3 (flat 2-D)", msg_v3),
                    ("pass v0 (current 3-D)", pass_v0),
                    ("pass v2 (K,N,H)", pass_v2),
                    ("pass v3 (flat 2-D)", pass_v3)):
        scan_time(f"  {tag}", fn, pj0, iters=10)

    # numerical agreement spot-check (same math up to fp order)
    a, b, c, d = msg_v0(pj0), msg_v1(pj0), msg_v2(pj0), msg_v3(pj0)
    print("  msg agree v1/v2/v3 vs v0:",
          float(jnp.max(jnp.abs(b - a))), float(jnp.max(jnp.abs(c - a))),
          float(jnp.max(jnp.abs(d - a))))
    p0, p2, p3 = pass_v0(pj0), pass_v2(pj0), pass_v3(pj0)
    print("  pass agree v2/v3 vs v0:",
          float(jnp.max(jnp.abs(p2 - p0))), float(jnp.max(jnp.abs(p3 - p0))))


if __name__ == "__main__":
    main()
