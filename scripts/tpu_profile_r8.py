"""Round-8 battery (one TPU process): anatomize the 5.7 ms of gathered-
tensor layout copies at the 25 ms clustered-serving floor.

  python scripts/tpu_profile_r8.py hlo        # compile + dump optimized HLO,
                                              # report copy/transpose ops with
                                              # their producers and consumers
  python scripts/tpu_profile_r8.py variants   # scan-timed A/B of near-path
                                              # reformulations (added after the
                                              # hlo stage says what to try)

The r7d trace shows ~70% of device time at the floor is near-path
gather + relayout: two per-round row gathers (9.3 ms) and
{2,1,0}->{0,2,1} layout copies (5.7 ms) on the gathered (N, K, H)
tensors.  r7g proved spatial ordering is latency-neutral (gather cost
is per-row dispatch), but the COPIES were never attributed to a
producer/consumer pair — this stage reads the optimized HLO to find
which op forces the relayout, so a reformulation can target it.
"""

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from scripts.profile_util import load_decay, scan_time, setup_cache, \
    synth_molecule  # noqa: E402

setup_cache()

from epnn_tpu.data.dataset import pad_molecules, round_up, \
    uniform_q0_contract  # noqa: E402
from epnn_tpu.ops.fused import build_neighbors_batch, cell_grid_params, \
    forward_blocked, max_neighbor_count  # noqa: E402


def _big_system(n=17760):
    params, cfg, table, fused = load_decay()
    mol = synth_molecule(n, np.random.default_rng(0))
    bb = pad_molecules([mol], table, pad_to=n)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    c = cfg.replace(matmul_precision="default")
    xb, qb, zb, mb = (jax.device_put(np.asarray(a)) for a in
                      (bb.x, bb.q0, bb.xyz, bb.node_mask))
    nbrs = jax.block_until_ready(
        build_neighbors_batch(zb, mb, c.cutoff, k))
    nc, cap = cell_grid_params(bb.xyz[0], bb.node_mask[0], cfg.cutoff)
    grid = (round_up(nc, 512), round_up(cap, 4))
    uq0 = uniform_q0_contract(bb.x, bb.q0, bb.node_mask)
    return fused, c, (xb, qb, zb, mb), nbrs, grid, uq0, k


def stage_hlo():
    fused, c, (xb, qb, zb, mb), nbrs, grid, uq0, k = _big_system()

    def fn(q0_in):
        return forward_blocked(fused, xb, q0_in, zb, mb, c,
                               block=256, neighbor_k=k, use_pallas=True,
                               neighbors=nbrs, neighbor_grid=grid,
                               uniform_q0=uq0, far_cluster=32)

    print("lower+compile...", flush=True)
    compiled = jax.jit(fn).lower(qb).compile()
    txt = compiled.as_text()
    path = "/tmp/r8_serving_cluster32.hlo"
    with open(path, "w") as f:
        f.write(txt)
    print(f"optimized HLO: {len(txt)/1e6:.1f} MB -> {path}", flush=True)

    # find every copy/transpose (fused or standalone) over big tensors and
    # report its operand producers and (by scanning uses) consumers
    lines = txt.splitlines()
    defs = {}       # name -> (lineno, text)
    name_re = re.compile(r"^\s*(%?[\w.-]+) = ")
    for i, ln in enumerate(lines):
        m = name_re.match(ln)
        if m:
            defs[m.group(1).lstrip("%")] = (i, ln.strip())

    big = re.compile(r"17920|573440|143360")
    interesting = []
    for name, (i, ln) in defs.items():
        if ("copy(" in ln or "transpose(" in ln) and big.search(ln):
            interesting.append((name, i, ln))
    print(f"\n{len(interesting)} big copy/transpose defs:")
    for name, i, ln in interesting:
        print("-" * 72)
        print(f"[{i}] {ln[:240]}")
        # operands
        for op in re.findall(r"%?([\w.-]+)(?=[,)])", ln.split("(", 1)[-1]):
            if op in defs and op != name:
                print(f"   operand {op}: {defs[op][1][:200]}")
        # consumers: scan for uses
        uses = [l.strip()[:200] for l in lines
                if (f"%{name}" in l or f" {name}" in l)
                and not l.strip().startswith(f"%{name} =")
                and name_re.match(l) and name_re.match(l).group(1).lstrip("%") != name]
        for u in uses[:4]:
            print(f"   user: {u}")

    # also: total copy-fusion count with big shapes inside fusions (the
    # trace attributes copies to named fusion ops; match those bodies)
    fus = re.findall(r"(fusion[\w.]*) = [^\n]*kind=kLoop[^\n]*", txt)
    print(f"\n(kLoop fusions total: {len(fus)})")


def stage_variants():
    """A/B the near-chain layout lever the hlo stage surfaced.

    The optimized HLO shows the 5.7 ms of copies are LAYOUT-UNIVERSE
    boundary copies: H1=32 < 128 lanes, so XLA transposes the whole
    atomwise chain to atom-on-lanes ({0,1}/{0,2,1}) for lane utilization,
    but gathers are row-major-only — every round pays pj→{1,0} then
    gathered (N,K,H)→{0,2,1} (73 MB msg / 147 MB pass per round ≈ 1.1 GB
    per inference).  ``_packed_mids(pack_to=128)`` reshapes the gathered
    chain to (N, K/4, 128) — minor dim 128 — which both feeds the MXU at
    full tile width AND gives XLA a row-major-friendly chain, so the
    boundary copies should collapse to small (N, 32) ones.  (The round-1
    "kron measured slower" note in RESULTS.md predates the neighbor-split
    forward entirely — it was measured on the dense blocked scan.)
    """
    from scripts.profile_util import scan_time

    for n in (17760, 2220):
        fused, c, (xb, qb, zb, mb), nbrs, grid, uq0, k = _big_system(n)
        # serving reuse mode: selection amortized, d2 carried
        from epnn_tpu.ops.fused import build_neighbors
        nbrs_d2 = build_neighbors(zb[0], mb[0], c.cutoff, k, with_d2=True)
        nbrs_d2 = tuple(jax.block_until_ready(a)[None] for a in nbrs_d2)

        def fwd(q0_in, fc, pack):
            return forward_blocked(fused, xb, q0_in, zb, mb, c,
                                   block=256, neighbor_k=k, use_pallas=True,
                                   neighbors=nbrs_d2, pack_to=pack,
                                   uniform_q0=uq0, far_cluster=fc)

        # bitwise identity gate: kron block-diagonal mids sum extra exact
        # zeros only
        fcs = (32, 0) if n == 17760 else (32,)
        for fc in fcs:
            q1 = np.asarray(jax.block_until_ready(fwd(qb, fc, 1)))
            q128 = np.asarray(jax.block_until_ready(fwd(qb, fc, 128)))
            same = "bitwise" if np.array_equal(q1, q128) else \
                f"MAXDIFF {np.abs(q1 - q128).max():.2e}"
            print(f"N={n} fc={fc}: pack128 vs pack1 -> {same}", flush=True)
            for pack in (1, 128):
                scan_time(f"N={n} reuse fc={fc} pack_to={pack}",
                          lambda qi: fwd(qi, fc, pack), qb, iters=8)


def stage_traingrad():
    """Step-time cost of the exact-VJP clustered-training gradient
    (far_cluster_grad=True, round 8) vs the r7f stop-gradient tier and vs
    exact training — same shapes/method as scripts/tpu_profile_r7f.py.
    The extra backward work is one onehot-matmul scatter per message
    round (O(N·C·H)); if it costs more than a few ms/step the TrainConfig
    default (exact) needs revisiting."""
    import jax.numpy as jnp

    from scripts.profile_util import scan_time

    for n in (2220, 17760):
        params, cfg, table, fused = load_decay()
        rng = np.random.default_rng(0)
        bb = pad_molecules([synth_molecule(n, rng)], table, pad_to=n)
        y = rng.normal(size=bb.q0.shape).astype(np.float32) * 0.1
        k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                            cfg.cutoff) + 4, 8))
        c = cfg.replace(matmul_precision="default")
        put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
        x, q0, z, m, yv = map(put, (bb.x, bb.q0, bb.xyz, bb.node_mask, y))

        for label, fc, grad in (("exact", 0, False),
                                ("fc32 stop-grad", 32, False),
                                ("fc32 exact-vjp", 32, True)):
            def loss(f, fc=fc, grad=grad):
                q = forward_blocked(f, x, q0, z, m, c, block=256,
                                    neighbor_k=k, use_pallas=True,
                                    remat=True, uniform_q0=True,
                                    far_cluster=fc, far_cluster_grad=grad)
                return jnp.sum((q - yv) ** 2 * m)

            def step(f, fc=fc, grad=grad):
                g = jax.grad(lambda ff: loss(ff, fc, grad))(f)
                return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b,
                                              f, g)

            scan_time(f"train N={n} {label}", step, fused, iters=6)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "hlo"
    if stage == "hlo":
        stage_hlo()
    elif stage == "variants":
        stage_variants()
    elif stage == "traingrad":
        stage_traingrad()
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
