"""Round-9 battery (one TPU process): anatomize the 160 ms clustered
train step at 17,760 atoms (forward serving floor is ~25 ms — where do
the other ~135 ms go?).

  python scripts/tpu_profile_r9.py trace    # jax.profiler trace of the
                                            # fc32 exact-VJP train step,
                                            # device-op breakdown
  python scripts/tpu_profile_r9.py remat    # A/B remat on/off (fc=32 has
                                            # no O(N^2) residuals; the
                                            # blanket big-graph remat may
                                            # be paying ~a forward of
                                            # recompute for memory we
                                            # don't need)
  python scripts/tpu_profile_r9.py scatter  # isolate the near-gather
                                            # backward: XLA scatter-add
                                            # vs a precomputed
                                            # reverse-table gather adjoint

Methodology: profile_util.scan_time (jitted lax.scan chain, scalar
readback, discard-first-loop).  Reference hot loop being trained:
/root/reference/charge_gn.py:62-70 at 8x its largest system.
"""

import collections
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
from epnn_tpu.ops.fused import build_neighbors_batch, forward_blocked, \
    max_neighbor_count  # noqa: E402


def _system(n=17760):
    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(0)
    bb = pad_molecules([synth_molecule(n, rng)], table, pad_to=n)
    y = rng.normal(size=bb.q0.shape).astype(np.float32) * 0.1
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    c = cfg.replace(matmul_precision="default")
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    x, q0, z, m, yv = map(put, (bb.x, bb.q0, bb.xyz, bb.node_mask, y))
    return fused, c, (x, q0, z, m, yv), k


def _make_step(fused, c, data, k, fc, grad, remat, neighbors=None):
    x, q0, z, m, yv = data

    def loss(f):
        q = forward_blocked(f, x, q0, z, m, c, block=256, neighbor_k=k,
                            use_pallas=True, remat=remat, uniform_q0=True,
                            neighbors=neighbors,
                            far_cluster=fc, far_cluster_grad=grad)
        return jnp.sum((q - yv) ** 2 * m)

    def step(f):
        g = jax.grad(loss)(f)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, f, g)

    return step


def stage_trace(n=17760, iters=4):
    fused, c, data, k = _system(n)
    step = _make_step(fused, c, data, k, fc=32, grad=True,
                      remat=os.environ.get("R9_REMAT", "0") == "1")

    @jax.jit
    def run(f):
        out, _ = jax.lax.scan(lambda cf, _: (step(cf), None), f, None,
                              length=iters)
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32)), out)

    # compile + discard the inflation window, then trace one loop
    np.asarray(jax.tree_util.tree_leaves(run(fused))[0])
    np.asarray(jax.tree_util.tree_leaves(run(fused))[0])
    trace_dir = "/tmp/r9_train_trace"
    with jax.profiler.trace(trace_dir):
        np.asarray(jax.tree_util.tree_leaves(run(fused))[0])
    print(f"trace -> {trace_dir}", flush=True)

    from scripts.trace_parse import load_events
    ev = load_events(trace_dir)
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pids.items()
                if "TPU" in nm or "/device" in nm.lower()}
    groups = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3
        groups[e.get("name", "?")] += dur
        total += dur
    print(f"device busy {total:.1f} ms / {iters} iters = "
          f"{total / iters:.2f} ms/step", flush=True)
    for name, ms in groups.most_common(40):
        print(f"  {ms / iters:8.3f} ms/step  {name[:110]}", flush=True)


def stage_remat(n=17760):
    fused, c, data, k = _system(n)
    for label, fc, grad, remat in (
        ("fc32 exact-vjp remat=True ", 32, True, True),
        ("fc32 exact-vjp remat=False", 32, True, False),
        ("exact          remat=True ", 0, False, True),
        ("exact          remat=False", 0, False, False),
    ):
        step = _make_step(fused, c, data, k, fc, grad, remat)
        scan_time(f"train N={n} {label}", step, fused, iters=6)


def stage_nbr(n=17760):
    """A/B the r9b lever: precomputed per-bucket neighbor tables
    (TrainConfig.precompute_neighbors, static training geometry) vs
    per-step in-forward selection, both no-remat."""
    fused, c, data, k = _system(n)
    x, q0, z, m, yv = data
    nbrs = jax.block_until_ready(build_neighbors_batch(z, m, c.cutoff, k))
    for label, fc, grad in (
        ("fc32 exact-vjp", 32, True),
        ("exact         ", 0, False),
    ):
        step_in = _make_step(fused, c, data, k, fc, grad, remat=False)
        step_pre = _make_step(fused, c, data, k, fc, grad, remat=False,
                              neighbors=nbrs)
        scan_time(f"train N={n} {label} in-forward sel", step_in, fused,
                  iters=6)
        scan_time(f"train N={n} {label} precomp tables", step_pre, fused,
                  iters=6)


def stage_scatter(n=17760, h1=32):
    """The adjoint of the per-round pj[idx] row gather is an XLA
    scatter-add with duplicate indices.  A/B against the precomputed
    reverse-table formulation: host-side, invert the (N, K) neighbor
    table into (N, Krev) "who lists me" slots; the adjoint becomes a
    gather + masked sum (no scatter at all)."""
    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(0)
    bb = pad_molecules([synth_molecule(n, rng)], table, pad_to=n)
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    z = jax.device_put(np.asarray(bb.xyz))
    m = jax.device_put(np.asarray(bb.node_mask))
    idx, nmask, _ = jax.block_until_ready(
        build_neighbors_batch(z, m, cfg.cutoff, k))
    idx = np.asarray(idx[0])          # (N, K)
    nmask = np.asarray(nmask[0])      # (N, K)

    # host-side reverse table: rev_src[j, s] = i such that idx[i, :] hits j
    flat_j = idx.reshape(-1)
    flat_i = np.repeat(np.arange(n, dtype=np.int32), k)
    valid = nmask.reshape(-1) > 0
    order = np.argsort(flat_j[valid], kind="stable")
    js = flat_j[valid][order]
    is_ = flat_i[valid][order]
    counts = np.bincount(js, minlength=n)
    krev = int(round_up(int(counts.max()), 8))
    rev_src = np.zeros((n, krev), np.int32)
    rev_mask = np.zeros((n, krev), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(js)) - starts[js]
    rev_src[js, slot] = is_
    rev_mask[js, slot] = 1.0
    print(f"N={n} K={k} -> reverse table Krev={krev} "
          f"(max in-degree {counts.max()})", flush=True)

    idx_d = jax.device_put(idx)
    nmask_d = jax.device_put(nmask.astype(np.float32))
    rev_d = jax.device_put(rev_src)
    rmask_d = jax.device_put(rev_mask)
    rng2 = np.random.default_rng(1)
    ct = jax.device_put(rng2.normal(size=(n, k, h1)).astype(np.float32))

    # adjoint via XLA scatter-add (what jax.grad of pj[idx] emits)
    def adj_scatter(c_in):
        out = jnp.zeros((n, h1), jnp.float32)
        return out.at[idx_d.reshape(-1)].add(
            (c_in * nmask_d[:, :, None]).reshape(-1, h1))

    # adjoint via the reverse-table gather: row j sums the cotangent
    # entries of the (i, slot) positions that gathered it.  Needs the
    # slot index too: precompute flat positions i*K + slot.
    pos = np.zeros((n, krev), np.int64)
    pos[js, slot] = (is_.astype(np.int64) * k
                     + (np.argmax(idx[is_] == js[:, None], axis=1)))
    # NOTE: np.argmax over (len(js), K) — exact slot of j in idx[i]
    pos_d = jax.device_put(pos.astype(np.int32))

    def adj_rev(c_in):
        flat = (c_in * nmask_d[:, :, None]).reshape(-1, h1)
        return jnp.sum(flat[pos_d] * rmask_d[:, :, None], axis=1)

    a = np.asarray(jax.jit(adj_scatter)(ct))
    b = np.asarray(jax.jit(adj_rev)(ct))
    print(f"agreement max|diff| = {np.abs(a - b).max():.3e} "
          f"(fp sum-order only)", flush=True)

    scan_time("adjoint scatter-add (N,K,H)->(N,H)",
              lambda v: adj_scatter(ct * v[0, 0]) + v, ct[:, 0, :] * 0 +
              jnp.zeros((n, h1)), iters=10)
    scan_time("adjoint reverse-gather (N,Krev,H)",
              lambda v: adj_rev(ct * v[0, 0]) + v,
              jnp.zeros((n, h1)), iters=10)


def stage_e2e(n=17760, epochs=6):
    """End-to-end PUBLIC train() fine-tune at scale: how much in-loop
    overhead (host uploads, per-step metric readback, dispatch) rides on
    top of the scan-measured 93 ms/step?  5 copies of the synthetic
    system -> 4 train steps + 1 eval step per epoch."""
    import time

    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.io.tf_import import import_reference_model
    from epnn_tpu.train import TrainConfig, train

    from epnn_tpu.io import save_params

    params, cfg = import_reference_model("/root/reference/models",
                                         "decay_model")
    # fine-tune at FAST precision (the imported cfg carries the parity
    # policy highest_precision=True, which would train ~2x slower with
    # the far-field kernel off — the r9 "loop overhead" red herring)
    cfg = cfg.replace(matmul_precision="default")
    ck = "/tmp/r9_e2e_init"
    save_params(ck, params, cfg)
    rng = np.random.default_rng(0)
    base = synth_molecule(n, rng)
    mols = []
    for i in range(5):
        labels = rng.normal(0, 0.05, size=n).astype(np.float32)
        labels -= labels.mean()
        mols.append(Molecule(name=f"e{i}", symbols=list(base.symbols),
                             xyz=base.xyz, total_charge=0.0, labels=labels))
    t0 = time.time()
    tc = TrainConfig(epochs=epochs, batch_size=1, far_cluster=32,
                     loss="masked_mse", init_from=ck)
    res = train(mols, cfg, tc, progress=False)
    for h in res.history:
        print(f"epoch {h['epoch']}: train {h['train_loss']:.4e} "
              f"({h.get('seconds', float('nan')):.2f}s)", flush=True)
    total = time.time() - t0
    per_epoch = [h.get("seconds") for h in res.history[2:]
                 if h.get("seconds")]
    if per_epoch:
        # 4 train steps + 1 eval (exact) per epoch
        print(f"steady epoch {min(per_epoch):.2f}s -> incl-eval per-step "
              f"~{min(per_epoch) / 5 * 1e3:.0f} ms (scan-measured step: "
              f"93 ms fc32 / eval exact fwd ~87 ms)", flush=True)
    print(f"total {total:.1f}s (incl table build + compiles)", flush=True)


def stage_loopovh(n=17760, iters=12):
    """Isolate the ~94 ms/step of public-train() loop overhead seen by
    stage_e2e: per-call dispatch of ONE fc32 train step with (a) numpy
    host args re-uploaded every call (what train() does via put()),
    (b) device-resident args.  Timed per call with a loss readback (the
    scan-chain number for the same program is ~93 ms)."""
    import time

    fused, c, data, k = _system(n)
    x, q0, z, m, yv = data
    nbrs = jax.block_until_ready(build_neighbors_batch(z, m, c.cutoff, k))

    def loss(f, x_, q0_, z_, m_, yv_):
        q = forward_blocked(f, x_, q0_, z_, m_, c, block=256, neighbor_k=k,
                            use_pallas=True, remat=False, uniform_q0=True,
                            neighbors=nbrs, far_cluster=32,
                            far_cluster_grad=True)
        return jnp.sum((q - yv_) ** 2 * m_)

    @jax.jit
    def step(f, *args):
        l, g = jax.value_and_grad(loss)(f, *args)
        return l, jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, f, g)

    np_args = tuple(np.asarray(a) for a in (x, q0, z, m, yv))
    dev_args = (x, q0, z, m, yv)

    for label, args in (("device-resident args", dev_args),
                        ("numpy args (re-upload)", np_args)):
        f = fused
        # compile + inflation discard
        for _ in range(4):
            l, f = step(f, *args)
            float(l)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            l, f = step(f, *args)
            float(l)  # force completion via scalar readback
            times.append(time.perf_counter() - t0)
        times = sorted(times)
        print(f"per-call {label}: median {1e3 * times[len(times)//2]:.1f} "
              f"min {1e3 * times[0]:.1f} ms", flush=True)


def stage_pipelined(n=17760, iters=12):
    """The train() loop never blocks per step (MetricAccumulator is lazy)
    — successive dispatches should PIPELINE and hide the per-call RPC
    latency stage_loopovh measured (+21.5 ms blocked / +12 ms upload).
    Time `iters` back-to-back dispatches with one readback at the end,
    device-resident vs numpy args, to get the true amortized per-step
    cost of the public-train() dispatch pattern."""
    import time

    fused, c, data, k = _system(n)
    x, q0, z, m, yv = data
    nbrs = jax.block_until_ready(build_neighbors_batch(z, m, c.cutoff, k))

    def loss(f, x_, q0_, z_, m_, yv_):
        q = forward_blocked(f, x_, q0_, z_, m_, c, block=256, neighbor_k=k,
                            use_pallas=True, remat=False, uniform_q0=True,
                            neighbors=nbrs, far_cluster=32,
                            far_cluster_grad=True)
        return jnp.sum((q - yv_) ** 2 * m_)

    @jax.jit
    def step(f, *args):
        l, g = jax.value_and_grad(loss)(f, *args)
        return l, jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, f, g)

    np_args = tuple(np.asarray(a) for a in (x, q0, z, m, yv))
    dev_args = (x, q0, z, m, yv)

    for label, args in (("device-resident args", dev_args),
                        ("numpy args (re-upload)", np_args)):
        f = fused
        for _ in range(4):          # compile + inflation discard
            l, f = step(f, *args)
            float(l)
        for rep in range(2):
            t0 = time.perf_counter()
            f2, losses = f, []
            for _ in range(iters):
                l, f2 = step(f2, *args)
                losses.append(l)
            float(losses[-1])       # one readback at the end
            dt = time.perf_counter() - t0
            print(f"pipelined {label} rep{rep}: "
                  f"{dt / iters * 1e3:.1f} ms/step", flush=True)


def stage_realstep(n=17760, iters=12):
    """Time the ACTUAL train_step_fused / eval_step_fused programs exactly
    as train() dispatches them (Adam update + metric sums + per-minibatch
    nbr_rows in-graph row gather, bucket tables), pipelined — the toy
    battery step reads 91-93 ms/step but public train() steady epochs
    imply ~180; find which program carries the difference."""
    import time

    from epnn_tpu.data.dataset import bucket_molecules, minibatches
    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.train.loop import (TrainConfig, _batch_args, create_state,
                                     eval_step_fused, make_optimizer,
                                     train_step_fused)

    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(0)
    base = synth_molecule(n, rng)
    mols = []
    for i in range(4):
        labels = rng.normal(0, 0.05, size=n).astype(np.float32)
        labels -= labels.mean()
        mols.append(Molecule(name=f"e{i}", symbols=list(base.symbols),
                             xyz=base.xyz, total_charge=0.0, labels=labels))
    buckets = bucket_molecules(mols, table_for_n_elems(cfg.n_elems), 8)
    (pad, bucket), = buckets.items()
    tc = TrainConfig(batch_size=1, far_cluster=32, loss="masked_mse")
    opt = make_optimizer(tc)
    state = create_state(cfg, tc, jax.random.key(0))
    state = state.replace(params=params)  # train_step_fused fuses in-graph
    c = cfg.replace(matmul_precision="default")
    k = int(round_up(max_neighbor_count(bucket.xyz[0], bucket.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    tabs = tuple(build_neighbors_batch(
        jnp.asarray(bucket.xyz), jnp.asarray(bucket.node_mask),
        float(cfg.cutoff), k))
    jax.block_until_ready(tabs)

    mbs = [(mb, n_real, rows) for mb, n_real, rows in
           minibatches(bucket, 1, rng=np.random.default_rng(1),
                       with_indices=True)]

    def call(st, i):
        mb, n_real, rows = mbs[i % len(mbs)]
        return train_step_fused(
            st, c, tc.loss, opt, 256, k, *_batch_args(mb, n_real),
            use_pallas=True, uniform_q0=True, far_cluster=32,
            far_cluster_grad=True, remat=False, nbr_tables=tabs,
            nbr_rows=jnp.asarray(rows, jnp.int32))

    # compile + inflation discard
    for i in range(6):
        state, loss, _, mets = call(state, i)
    float(loss)
    for rep in range(2):
        t0 = time.perf_counter()
        st = state
        for i in range(iters):
            st, loss, _, mets = call(st, i)
        float(loss)
        print(f"real train_step_fused pipelined rep{rep}: "
              f"{(time.perf_counter() - t0) / iters * 1e3:.1f} ms/step",
              flush=True)

    def ecall(i):
        mb, n_real, rows = mbs[i % len(mbs)]
        return eval_step_fused(
            state.params, c, tc.loss, 256, k, *_batch_args(mb, n_real),
            use_pallas=True, uniform_q0=True, nbr_tables=tabs,
            nbr_rows=jnp.asarray(rows, jnp.int32))

    for i in range(6):
        loss, _, mets = ecall(i)
    float(loss)
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            loss, _, mets = ecall(i)
        float(loss)
        print(f"real eval_step_fused pipelined rep{rep}: "
              f"{(time.perf_counter() - t0) / iters * 1e3:.1f} ms/step",
              flush=True)


def stage_ema(n=17760, iters=12):
    """A/B the per-step EMA update (one jitted tree multiply-add over the
    74K params) against the bare train_step_fused pipeline — TRAINING.md
    claims the extra dispatch pipelines away; measure it."""
    import time

    from epnn_tpu.data.dataset import bucket_molecules, minibatches
    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.train.loop import (TrainConfig, _batch_args, create_state,
                                     make_optimizer, train_step_fused)

    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(0)
    base = synth_molecule(n, rng)
    mols = []
    for i in range(4):
        labels = rng.normal(0, 0.05, size=n).astype(np.float32)
        labels -= labels.mean()
        mols.append(Molecule(name=f"e{i}", symbols=list(base.symbols),
                             xyz=base.xyz, total_charge=0.0, labels=labels))
    buckets = bucket_molecules(mols, table_for_n_elems(cfg.n_elems), 8)
    (pad, bucket), = buckets.items()
    tc = TrainConfig(batch_size=1, far_cluster=32, loss="masked_mse")
    opt = make_optimizer(tc)
    state = create_state(cfg, tc, jax.random.key(0))
    state = state.replace(params=params)
    c = cfg.replace(matmul_precision="default")
    k = int(round_up(max_neighbor_count(bucket.xyz[0], bucket.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    tabs = tuple(build_neighbors_batch(
        jnp.asarray(bucket.xyz), jnp.asarray(bucket.node_mask),
        float(cfg.cutoff), k))
    jax.block_until_ready(tabs)
    mbs = [(mb, n_real, rows) for mb, n_real, rows in
           minibatches(bucket, 1, rng=np.random.default_rng(1),
                       with_indices=True)]

    def call(st, i):
        mb, n_real, rows = mbs[i % len(mbs)]
        return train_step_fused(
            st, c, tc.loss, opt, 256, k, *_batch_args(mb, n_real),
            use_pallas=True, uniform_q0=True, far_cluster=32,
            far_cluster_grad=True, remat=False, nbr_tables=tabs,
            nbr_rows=jnp.asarray(rows, jnp.int32))

    _d = 0.999
    ema_step = jax.jit(lambda e, p: jax.tree_util.tree_map(
        lambda a, b: _d * a + (1.0 - _d) * b, e, p))

    for use_ema in (False, True):
        st, ema = state, state.params
        for i in range(6):
            st, loss, _, mets = call(st, i)
            if use_ema:
                ema = ema_step(ema, st.params)
        float(loss)
        for rep in range(2):
            t0 = time.perf_counter()
            s2, e2 = st, ema
            for i in range(iters):
                s2, loss, _, mets = call(s2, i)
                if use_ema:
                    e2 = ema_step(e2, s2.params)
            float(loss)
            print(f"train step {'WITH' if use_ema else 'no  '} EMA rep{rep}: "
                  f"{(time.perf_counter() - t0) / iters * 1e3:.1f} ms/step",
                  flush=True)


def stage_accum(n=17760, iters=12):
    """A/B grad_accum=4 (optax.MultiSteps: per-step lax.cond + mean
    accumulation over the 74K-param tree) against grad_accum=1 on the
    fc32 step — confirm the wrapper costs nothing at scale."""
    import time

    from epnn_tpu.data.dataset import bucket_molecules, minibatches
    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.train.loop import (TrainConfig, _batch_args, create_state,
                                     make_optimizer, train_step_fused)

    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(0)
    base = synth_molecule(n, rng)
    mols = []
    for i in range(4):
        labels = rng.normal(0, 0.05, size=n).astype(np.float32)
        labels -= labels.mean()
        mols.append(Molecule(name=f"a{i}", symbols=list(base.symbols),
                             xyz=base.xyz, total_charge=0.0, labels=labels))
    buckets = bucket_molecules(mols, table_for_n_elems(cfg.n_elems), 8)
    (pad, bucket), = buckets.items()
    c = cfg.replace(matmul_precision="default")
    k = int(round_up(max_neighbor_count(bucket.xyz[0], bucket.node_mask[0],
                                        cfg.cutoff) + 4, 8))
    tabs = tuple(build_neighbors_batch(
        jnp.asarray(bucket.xyz), jnp.asarray(bucket.node_mask),
        float(cfg.cutoff), k))
    jax.block_until_ready(tabs)
    mbs = [(mb, n_real, rows) for mb, n_real, rows in
           minibatches(bucket, 1, rng=np.random.default_rng(1),
                       with_indices=True)]

    for accum in (1, 4):
        tc = TrainConfig(batch_size=1, far_cluster=32, loss="masked_mse",
                         grad_accum=accum)
        opt = make_optimizer(tc)
        state = create_state(cfg, tc, jax.random.key(0))
        state = state.replace(params=params)

        def call(st, i):
            mb, n_real, rows = mbs[i % len(mbs)]
            return train_step_fused(
                st, c, tc.loss, opt, 256, k, *_batch_args(mb, n_real),
                use_pallas=True, uniform_q0=True, far_cluster=32,
                far_cluster_grad=True, remat=False, nbr_tables=tabs,
                nbr_rows=jnp.asarray(rows, jnp.int32))

        for i in range(6):
            state, loss, _, mets = call(state, i)
        float(loss)
        for rep in range(2):
            t0 = time.perf_counter()
            st = state
            for i in range(iters):
                st, loss, _, mets = call(st, i)
            float(loss)
            print(f"train step grad_accum={accum} rep{rep}: "
                  f"{(time.perf_counter() - t0) / iters * 1e3:.1f} ms/step",
                  flush=True)


def stage_hugetrain(n=142080, iters=6):
    """Scale frontier for TRAINING: one fc32 train step at 142,080 atoms
    (64x the reference's protein) on one chip.  No-remat residuals are
    O(N*k*h) per round (~35 GB here) so this is the --remat use case the
    r9 remat A/B predicted; precomputed cell-built neighbor tables keep
    selection out of the step."""
    import time

    from epnn_tpu.data.dataset import pad_molecules, round_up
    from epnn_tpu.ops.fused import (build_neighbors_cell, cell_grid_params,
                                    max_neighbor_count)
    from epnn_tpu.train.loop import (TrainConfig, create_state,
                                     make_optimizer, train_step_fused)

    params, cfg, table, fused = load_decay()
    rng = np.random.default_rng(0)
    t0 = time.time()
    mol = synth_molecule(n, rng)
    bb = pad_molecules([mol], table, pad_to=n)
    labels = rng.normal(0, 0.05, size=n).astype(np.float32)
    labels -= labels.mean()
    print(f"host featurize+pad: {time.time()-t0:.1f}s", flush=True)
    c = cfg.replace(matmul_precision="default")

    t0 = time.time()
    k = int(round_up(max_neighbor_count(bb.xyz[0], bb.node_mask[0],
                                        c.cutoff) + 4, 8))
    print(f"host cell-binned safe k = {k} ({time.time()-t0:.1f}s)",
          flush=True)
    ncb, capb = cell_grid_params(bb.xyz[0], bb.node_mask[0], c.cutoff)
    grid = (int(round_up(ncb, 512)), int(round_up(capb, 4)))
    put = lambda a: jax.device_put(np.asarray(a))  # noqa: E731
    z, m = put(bb.xyz[0]), put(bb.node_mask[0])
    t0 = time.time()
    nbrs = jax.block_until_ready(build_neighbors_cell(
        z, m, c.cutoff, k, grid[0], grid[1], with_d2=True))
    print(f"neighbor build: {time.time()-t0:.1f}s (incl compile)",
          flush=True)
    tabs = tuple(a[None] for a in nbrs)

    x, q0 = put(bb.x), put(bb.q0)
    xyzb, maskb = z[None], m[None]
    y, w = put(labels[None]), put(np.ones(1, np.float32))
    rows = put(np.zeros(1, np.int32))

    tc = TrainConfig(batch_size=1, far_cluster=32, loss="masked_mse",
                     remat=True)
    opt = make_optimizer(tc)
    state = create_state(cfg, tc, jax.random.key(0))
    state = state.replace(params=params)

    def call(st):
        return train_step_fused(
            st, c, tc.loss, opt, 256, k, x, q0, xyzb, maskb, y, w,
            use_pallas=True, uniform_q0=True, far_cluster=32,
            far_cluster_grad=True, remat=True, nbr_tables=tabs,
            nbr_rows=rows)

    t0 = time.time()
    state, loss, _, mets = call(state)
    print(f"first step (incl compile): {time.time()-t0:.1f}s, "
          f"loss {float(loss):.4f}", flush=True)
    losses = [float(loss)]
    for _ in range(3):  # inflation discard
        state, loss, _, mets = call(state)
    losses.append(float(loss))
    for rep in range(2):
        t0 = time.perf_counter()
        st = state
        for _ in range(iters):
            st, loss, _, mets = call(st)
        float(loss)
        print(f"142,080-atom train step fc32+remat rep{rep}: "
              f"{(time.perf_counter() - t0) / iters * 1e3:.1f} ms/step",
              flush=True)
    assert losses[-1] < losses[0], losses
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f} over 4 steps",
          flush=True)


def stage_hlo(n=17760):
    """Dump the optimized HLO of ONE fc32 exact-VJP no-remat train step
    (not the scan) with metadata, to attribute the trace's hot fusions
    (fusion.1000 = 59.5 ms/step, while.345 = 61.6) to source ops."""
    fused, c, data, k = _system(n)
    step = _make_step(fused, c, data, k, fc=32, grad=True, remat=False)
    iters = 4

    @jax.jit
    def run(f):
        out, _ = jax.lax.scan(lambda cf, _: (step(cf), None), f, None,
                              length=iters)
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32)), out)

    compiled = run.lower(fused).compile()
    txt = compiled.as_text()
    out = "/tmp/r9_train_step.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print(f"optimized HLO -> {out} ({len(txt) / 1e6:.1f} MB)", flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "trace"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 17760
    if stage == "trace":
        stage_trace(n)
    elif stage == "remat":
        stage_remat(n)
    elif stage == "scatter":
        stage_scatter(n)
    elif stage == "nbr":
        stage_nbr(n)
    elif stage == "hlo":
        stage_hlo(n)
    elif stage == "e2e":
        stage_e2e(n)
    elif stage == "loopovh":
        stage_loopovh(n)
    elif stage == "pipelined":
        stage_pipelined(n)
    elif stage == "realstep":
        stage_realstep(n)
    elif stage == "ema":
        stage_ema(n)
    elif stage == "accum":
        stage_accum(n)
    elif stage == "hugetrain":
        stage_hugetrain(n if n != 17760 else 142080)
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
