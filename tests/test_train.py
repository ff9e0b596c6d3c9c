"""Training-loop tests: loss decreases, metrics are masked, resume works."""

import numpy as np
import pytest

from epnn_tpu.models import EPNNConfig
from epnn_tpu.train import TrainConfig, train


@pytest.fixture(autouse=True)
def _clear_jit_caches():
    """Drop compiled executables between tests: by the time this module
    runs, the full suite has stacked hundreds of distinct XLA:CPU
    executables in one process, and fresh train() loops here crossed a
    process-level crash threshold twice (SIGABRT at
    test_precomputed_neighbor_training_matches_in_forward, then SIGSEGV
    at test_early_stopping — both pass solo; the round-8 signature).
    Each train() retraces anyway (fresh model/bucket shapes), so the
    caches hold nothing these tests want to reuse."""
    import jax

    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def toy_train_mols():
    from epnn_tpu.data.xyz import Molecule

    g = np.random.default_rng(3)
    mols = []
    for i in range(24):
        n = int(g.integers(3, 12))
        symbols = list(g.choice(["H", "C", "N", "O"], size=n))
        xyz = g.uniform(-3, 3, size=(n, 3)).astype(np.float32)
        q_total = float(g.integers(-1, 2))
        labels = g.normal(0, 0.2, size=n).astype(np.float32)
        labels += (q_total - labels.sum()) / n
        mols.append(Molecule(name=f"m{i}", symbols=symbols, xyz=xyz,
                             total_charge=q_total, labels=labels))
    return mols


SMALL = EPNNConfig(h_dim=16, e_dim=16, msg_dim=8, mlp_hidden=(8, 8), T=2)


def test_loss_decreases(toy_train_mols):
    tc = TrainConfig(epochs=8, batch_size=8, seed=1)
    res = train(toy_train_mols, SMALL, tc, progress=False)
    first = res.history[0]["train_loss"]
    last = res.history[-1]["train_loss"]
    assert last < first * 0.9, (first, last)
    assert np.isfinite(res.best_val_masked_mae)


def test_checkpoint_and_resume(toy_train_mols, tmp_path):
    ckpt = str(tmp_path / "run")
    tc = TrainConfig(epochs=3, batch_size=8, seed=1, checkpoint_dir=ckpt)
    res1 = train(toy_train_mols, SMALL, tc, progress=False)

    tc2 = TrainConfig(epochs=6, batch_size=8, seed=1, checkpoint_dir=ckpt,
                      resume=True)
    res2 = train(toy_train_mols, SMALL, tc2, progress=False)
    # resumed run continues from epoch 3
    assert res2.history[0]["epoch"] == 3
    assert len(res2.history) == 3
    assert res2.best_val_masked_mae <= res1.best_val_masked_mae + 1e-9


def test_best_params_saved(toy_train_mols, tmp_path):
    from epnn_tpu.infer import Predictor

    ckpt = str(tmp_path / "run")
    tc = TrainConfig(epochs=2, batch_size=8, seed=1, checkpoint_dir=ckpt)
    train(toy_train_mols, SMALL, tc, progress=False)
    pred = Predictor.from_checkpoint(ckpt + "/best")
    charges = pred.predict_molecules(toy_train_mols[:3])
    assert len(charges) == 3
    for m, q in zip(toy_train_mols[:3], charges):
        assert q.shape == (m.natoms,)
        # conservation survives training
        np.testing.assert_allclose(q.sum(), m.total_charge, atol=1e-4)


def test_big_graph_routes_through_fused_path(toy_train_mols):
    """Buckets padded wider than dense_max_atoms must train through the
    blockwise fused path (no dense pair tensors) via the PUBLIC train() API,
    with decreasing loss — the reference trains dense-only and cannot do
    protein-scale training at all (charge_gn.py:393-402)."""
    from epnn_tpu.data.xyz import Molecule
    import epnn_tpu.train.loop as L

    g = np.random.default_rng(8)
    mols = []
    for i in range(6):
        n = int(g.integers(20, 28))  # pads to 24/32 — above dense_max=16
        symbols = list(g.choice(["H", "C", "N", "O"], size=n))
        xyz = g.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        labels = g.normal(0, 0.2, size=n).astype(np.float32)
        labels -= labels.sum() / n
        mols.append(Molecule(name=f"big{i}", symbols=symbols, xyz=xyz,
                             total_charge=0.0, labels=labels))

    calls = {"dense": 0, "fused": 0}
    orig_dense, orig_fused = L.train_step, L.train_step_fused

    def spy_dense(*a, **kw):
        calls["dense"] += 1
        return orig_dense(*a, **kw)

    def spy_fused(*a, **kw):
        calls["fused"] += 1
        return orig_fused(*a, **kw)

    L.train_step, L.train_step_fused = spy_dense, spy_fused
    try:
        tc = TrainConfig(epochs=6, batch_size=4, seed=1, dense_max_atoms=16)
        res = train(mols, SMALL, tc, progress=False)
    finally:
        L.train_step, L.train_step_fused = orig_dense, orig_fused

    assert calls["fused"] > 0 and calls["dense"] == 0, calls
    first = res.history[0]["train_loss"]
    last = res.history[-1]["train_loss"]
    assert last < first * 0.9, (first, last)
    assert np.isfinite(res.best_val_masked_mae)


def test_fused_training_through_pallas_kernel(toy_train_mols):
    """train_step_fused(use_pallas=True): the packed far-field kernel runs
    forward AND backward (custom VJP) inside the training step, and the
    losses track the XLA path step for step."""
    import jax

    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.train import create_state, make_optimizer, train_step_fused

    cfg = SMALL
    tc = TrainConfig(learning_rate=3e-3)
    opt = make_optimizer(tc)
    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules(toy_train_mols[:6], table, pad_to=16)
    w = np.ones((6,), np.float32)
    args = (batch.x, batch.q0, batch.xyz, batch.node_mask, batch.y, w)

    losses = {}
    for use_pallas in (False, True):
        state = create_state(cfg, tc, jax.random.key(0))
        ls = []
        for _ in range(4):
            state, loss, _, _ = train_step_fused(
                state, cfg, tc.loss, opt, 8, 12, *args,
                use_pallas=use_pallas)
            ls.append(float(loss))
        losses[use_pallas] = ls
    assert losses[True][-1] < losses[True][0]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


def test_init_from_finetunes(toy_train_mols, tmp_path):
    """init_from starts from an existing params checkpoint (fresh optimizer):
    the fine-tune entry point for imported reference models."""
    ckpt = str(tmp_path / "pre")
    tc = TrainConfig(epochs=2, batch_size=8, seed=1, checkpoint_dir=ckpt)
    res1 = train(toy_train_mols, SMALL, tc, progress=False)

    tc2 = TrainConfig(epochs=1, batch_size=8, seed=2,
                      init_from=ckpt + "/best")
    res2 = train(toy_train_mols, SMALL, tc2, progress=False)
    # starting from trained params, the very first epoch must already be
    # far below a from-scratch first epoch
    assert res2.history[0]["train_loss"] < res1.history[0]["train_loss"] * 0.5


def test_tensorboard_logging(toy_train_mols, tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    import os

    tb_dir = str(tmp_path / "tb")
    tc = TrainConfig(epochs=2, batch_size=8, seed=1, tensorboard_dir=tb_dir)
    train(toy_train_mols, SMALL, tc, progress=False)
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, os.listdir(tb_dir)


def test_tensorboard_missing_backend_fails_loudly(monkeypatch):
    """--tensorboard with no writer backend must raise, not print-and-drop
    (round-3 verdict: a silently-dead observability flag is worse than
    none)."""
    import sys

    from epnn_tpu.train.loop import _make_tb_writer

    monkeypatch.setitem(sys.modules, "torch.utils.tensorboard", None)
    monkeypatch.setitem(sys.modules, "tensorboardX", None)
    with pytest.raises(RuntimeError, match="SummaryWriter"):
        _make_tb_writer("/tmp/nonexistent_tb")


def test_checkpoint_save_is_atomic(tmp_path, monkeypatch):
    """A crash mid-save must leave the PREVIOUS checkpoint loadable: saves
    go through temp-file + os.replace, so the real file is never open for
    writing."""
    import os

    import jax

    from epnn_tpu.io import checkpoint as ckpt_io
    from epnn_tpu.models import init_params

    d = str(tmp_path / "ck")
    params0 = init_params(SMALL, jax.random.key(0))
    ckpt_io.save_params(d, params0, SMALL)
    before = open(os.path.join(d, ckpt_io.PARAMS_FILE), "rb").read()

    params1 = jax.tree_util.tree_map(lambda a: a + 1.0, params0)

    # crash injected at the rename point — the worst possible moment:
    # the temp file is fully written, the real file must stay untouched
    real_replace = os.replace

    def boom(src, dst):
        raise OSError("simulated crash during checkpoint rename")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError, match="simulated crash"):
        ckpt_io.save_params(d, params1, SMALL)
    monkeypatch.setattr(os, "replace", real_replace)

    after = open(os.path.join(d, ckpt_io.PARAMS_FILE), "rb").read()
    assert after == before  # old checkpoint intact, byte for byte
    assert not [f for f in os.listdir(d) if ".tmp." in f]  # no litter
    loaded = ckpt_io.load_params(d, params0)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(loaded)[0]),
        np.asarray(jax.tree_util.tree_leaves(params0)[0]))


def test_resume_preserves_data_order(toy_train_mols, tmp_path):
    """Crash/resume must not change the minibatch sequence: the data-order
    RNG is derived per epoch from (seed, epoch), so a run resumed at epoch
    E trains on exactly the batches an uninterrupted run would have —
    final params agree bitwise (same executables, same data order)."""
    import jax

    ckpt_a = str(tmp_path / "a")
    tc = TrainConfig(epochs=4, batch_size=8, seed=1, checkpoint_dir=ckpt_a)
    res_full = train(toy_train_mols, SMALL, tc, progress=False)

    ckpt_b = str(tmp_path / "b")
    tc1 = TrainConfig(epochs=2, batch_size=8, seed=1, checkpoint_dir=ckpt_b)
    train(toy_train_mols, SMALL, tc1, progress=False)
    tc2 = TrainConfig(epochs=4, batch_size=8, seed=1, checkpoint_dir=ckpt_b,
                      resume=True)
    res_resumed = train(toy_train_mols, SMALL, tc2, progress=False)

    for a, b in zip(jax.tree_util.tree_leaves(res_full.state.params),
                    jax.tree_util.tree_leaves(res_resumed.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padded_loss_option(toy_train_mols):
    tc = TrainConfig(epochs=2, batch_size=8, loss="padded_mse", seed=1)
    res = train(toy_train_mols, SMALL, tc, progress=False)
    assert np.isfinite(res.history[-1]["train_loss"])


def test_prediction_artifact_dumps(toy_train_mols, tmp_path):
    import os

    ckpt = str(tmp_path / "run")
    tc = TrainConfig(epochs=1, batch_size=8, seed=1, checkpoint_dir=ckpt,
                     dump_predictions=True)
    train(toy_train_mols, SMALL, tc, progress=False)
    art = os.path.join(ckpt, "artifacts")
    preds = np.load(os.path.join(art, "val_pred_charges.npy"))
    labs = np.load(os.path.join(art, "val_lab_charges.npy"))
    names = np.load(os.path.join(art, "val_names.npy"), allow_pickle=True)
    assert preds.shape == labs.shape
    assert len(names) == preds.shape[0]
    # each row's predictions sum to the molecule's net charge
    name_to_mol = {m.name: m for m in toy_train_mols}
    for i, nm in enumerate(names):
        np.testing.assert_allclose(
            preds[i].sum(), name_to_mol[str(nm)].total_charge, atol=1e-3
        )


def test_protein_scale_training(protein_dir):
    """Fine-tune the imported decay model on the 2,220-atom protein through
    the PUBLIC trainer: the bucket (pad 2224) routes through the fused/remat
    path, so no (N, N, 48) edge tensor or O(N² · 164) activation ever
    materializes — the memory wall that makes this impossible in the
    reference (charge_gn.py:393-402).  Labels: the reference's own shipped
    predictions (protein/preds.npy), a self-distillation smoke."""
    import os

    if os.environ.get("EPNN_SLOW_TESTS") != "1":
        pytest.skip("slow: set EPNN_SLOW_TESTS=1 (protein backward on CPU)")

    from conftest import REFERENCE_DIR
    from epnn_tpu.data.xyz import load_molecule
    from epnn_tpu.io.tf_import import import_reference_model
    from epnn_tpu.io import checkpoint as ckpt_io

    params, cfg = import_reference_model(
        os.path.join(REFERENCE_DIR, "models"), "decay_model")
    mol = load_molecule(os.path.join(protein_dir, "6qlp_capped.xyz"))
    preds = np.load(
        os.path.join(protein_dir, "preds.npy")).reshape(-1).astype(np.float32)
    # perturb so there is something to learn (the imported weights reproduce
    # their own predictions to ~1e-13 MSE — nothing to descend otherwise)
    g = np.random.default_rng(0)
    noise = g.normal(0, 0.02, size=preds.shape).astype(np.float32)
    mol.labels = preds + noise - noise.mean()

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ckpt_io.save_params(d, params, cfg)
        tc = TrainConfig(epochs=3, batch_size=1, learning_rate=1e-4,
                         init_from=d, dense_max_atoms=256)
        res = train([mol], cfg, tc, val_mols=[mol], progress=False)
    losses = [r["train_loss"] for r in res.history]
    assert losses[-1] < losses[0], losses
    # imported weights start near their own (perturbed) predictions
    assert losses[0] < 1e-3, losses


def test_shipped_trained_checkpoint_quality(mixed_dir):
    """The trained model shipped in trained/mixed_b16 must beat the
    reference's val MAE (0.01513 e masked, BASELINE.md) on the same split."""
    import os

    from epnn_tpu.data import load_directory, train_val_split
    from epnn_tpu.infer import Predictor

    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "trained", "mixed_b16")
    if not os.path.isdir(ckpt):
        pytest.skip("trained checkpoint not present")
    pred = Predictor.from_checkpoint(ckpt)
    mols = [m for m in load_directory(mixed_dir) if m.labels is not None]
    tr, va = train_val_split(len(mols), 0.2, 42)
    val = [mols[i] for i in va][:200]  # subset for CI speed
    charges = pred.predict_molecules(val)
    errs = np.concatenate([np.abs(q - m.labels) for m, q in zip(val, charges)])
    cons = max(abs(q.sum() - m.total_charge) for m, q in zip(val, charges))
    assert errs.mean() < 0.0145  # comfortably beats 0.01513
    assert cons < 1e-4


def test_repaired_trained_checkpoint_quality(mixed_dir):
    """Flagship model (label-stem repair + grad clipping): held-out val MAE
    must beat the reference artifacts' 0.01513 e by a wide margin."""
    import os

    from epnn_tpu.data import load_directory, train_val_split
    from epnn_tpu.infer import Predictor

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(root, "trained", "mixed_repaired_b16")
    if not os.path.isdir(ckpt):
        pytest.skip("repaired checkpoint not present")
    pred = Predictor.from_checkpoint(ckpt)
    # reproduce the run's own split: all labeled incl. the 28 repaired
    mols = load_directory(mixed_dir)
    for m in mols:
        if m.labels is None and m.name.endswith("dz"):
            cand = os.path.join(mixed_dir, m.name[:-2] + "_mbis-mtp.npy")
            if os.path.exists(cand):
                lab = np.asarray(np.load(cand), np.float32)
                if len(lab) == m.natoms:
                    m.labels = lab
    mols = [m for m in mols if m.labels is not None]
    assert len(mols) == 4379
    tr, va = train_val_split(len(mols), 0.2, 42)
    val = [mols[i] for i in va][:200]
    charges = pred.predict_molecules(val)
    errs = np.concatenate([np.abs(q - m.labels) for m, q in zip(val, charges)])
    assert errs.mean() < 0.013


def test_train_step_fused_uniform_q0(toy_train_mols):
    """train_step_fused(uniform_q0=True) — the round-1 far-field collapse
    (ops/fused.py) — tracks the uncollapsed step's losses step for step on
    pad_molecules batches (which satisfy the contract by construction)."""
    import jax

    from epnn_tpu.data.dataset import pad_molecules, uniform_q0_contract
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.train import create_state, make_optimizer, train_step_fused

    cfg = SMALL
    tc = TrainConfig(learning_rate=3e-3)
    opt = make_optimizer(tc)
    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules(toy_train_mols[:6], table, pad_to=16)
    assert uniform_q0_contract(batch.x, batch.q0, batch.node_mask)
    w = np.ones((6,), np.float32)
    args = (batch.x, batch.q0, batch.xyz, batch.node_mask, batch.y, w)

    losses = {}
    for uq0 in (False, True):
        state = create_state(cfg, tc, jax.random.key(0))
        ls = []
        for _ in range(4):
            state, loss, _, _ = train_step_fused(
                state, cfg, tc.loss, opt, 8, 12, *args, uniform_q0=uq0)
            ls.append(float(loss))
        losses[uq0] = ls
    assert losses[True][-1] < losses[True][0]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


def test_train_step_fused_far_cluster(toy_train_mols):
    """train_step_fused(far_cluster=C) — the opt-in APPROXIMATE clustered
    far-field training tier: loss must decrease (the gradient drops only
    the far-field dL/dpj path), gradients stay finite under remat, and at
    C = padded-atoms the per-step losses track the exact step coarsely
    (each distinct pj row gets ~its own centroid; the dropped dL/dpj
    path makes the trajectories diverge step by step — measured ~6% by
    step 3 on this system, so the bound is deliberately loose)."""
    import jax

    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.train import create_state, make_optimizer, train_step_fused

    cfg = SMALL
    tc = TrainConfig(learning_rate=3e-3)
    opt = make_optimizer(tc)
    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules(toy_train_mols[:6], table, pad_to=16)
    w = np.ones((6,), np.float32)
    args = (batch.x, batch.q0, batch.xyz, batch.node_mask, batch.y, w)

    losses = {}
    for fc in (0, 4, 16):
        state = create_state(cfg, tc, jax.random.key(0))
        ls = []
        for _ in range(5):
            state, loss, pred, _ = train_step_fused(
                state, cfg, tc.loss, opt, 8, 12, *args, far_cluster=fc)
            ls.append(float(loss))
        assert np.isfinite(ls).all(), fc
        # predictions stay conserving at any C (pass rounds are exact)
        cons = np.asarray(pred).sum(1) - np.asarray(
            batch.q0 * batch.node_mask).sum(1)
        assert np.abs(cons).max() < 1e-4, fc
        losses[fc] = ls
    assert losses[4][-1] < losses[4][0]
    assert losses[16][-1] < losses[16][0]
    np.testing.assert_allclose(losses[16], losses[0], rtol=0.15)


def test_public_train_far_cluster(toy_train_mols):
    """train() with TrainConfig.far_cluster: big buckets train through the
    clustered fused step via the PUBLIC API with decreasing loss, and the
    recorded val metrics come from the EXACT eval step (the tier never
    touches evaluation or checkpoint selection)."""
    from epnn_tpu.data.xyz import Molecule
    import epnn_tpu.train.loop as L

    g = np.random.default_rng(8)
    mols = []
    for i in range(6):
        n = int(g.integers(20, 28))  # pads above dense_max=16
        symbols = list(g.choice(["H", "C", "N", "O"], size=n))
        xyz = g.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        labels = g.normal(0, 0.2, size=n).astype(np.float32)
        labels -= labels.sum() / n
        mols.append(Molecule(name=f"big{i}", symbols=symbols, xyz=xyz,
                             total_charge=0.0, labels=labels))

    seen_fc = []
    orig_fused = L.train_step_fused

    def spy_fused(*a, **kw):
        seen_fc.append(kw.get("far_cluster", 0))
        return orig_fused(*a, **kw)

    L.train_step_fused = spy_fused
    try:
        tc = TrainConfig(epochs=6, batch_size=4, seed=1, dense_max_atoms=16,
                         far_cluster=4)
        res = train(mols, SMALL, tc, progress=False)
    finally:
        L.train_step_fused = orig_fused

    assert seen_fc and all(fc == 4 for fc in seen_fc), seen_fc
    first = res.history[0]["train_loss"]
    last = res.history[-1]["train_loss"]
    assert last < first * 0.9, (first, last)
    assert np.isfinite(res.best_val_masked_mae)


@pytest.mark.isolate  # two full train() loops stack many distinct
# executables — crossed the XLA:CPU virtual-device abort threshold late
# in the full suite while passing solo (CLAUDE.md rounds 8/12); the
# conftest isolate mechanism runs it in a fresh pytest child
def test_precomputed_neighbor_training_matches_in_forward():
    """TrainConfig.precompute_neighbors (default): per-bucket neighbor
    tables make the fused training run step-for-step identical to
    in-forward selection (same idx/mask/d² planes, the selection merely
    hoisted out of the step) — the r9 trace showed per-step top_k was
    40% of the big-graph step's device time."""
    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.models import EPNNConfig
    from epnn_tpu.train import TrainConfig, train

    small = EPNNConfig(h_dim=16, e_dim=16, msg_dim=8, mlp_hidden=(8, 8),
                       T=2)
    g = np.random.default_rng(11)
    mols = []
    for i in range(6):
        n = int(g.integers(20, 28))  # pads above dense_max_atoms=16
        symbols = list(g.choice(["H", "C", "N", "O"], size=n))
        xyz = g.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        labels = g.normal(0, 0.2, size=n).astype(np.float32)
        labels -= labels.sum() / n
        mols.append(Molecule(name=f"pb{i}", symbols=symbols, xyz=xyz,
                             total_charge=0.0, labels=labels))

    losses = {}
    for pre in (True, False):
        tc = TrainConfig(epochs=4, batch_size=4, seed=1,
                         dense_max_atoms=16, precompute_neighbors=pre)
        res = train(mols, small, tc, progress=False)
        losses[pre] = [(h["train_loss"], h["val_loss"])
                       for h in res.history]
    # same shuffles (same seed), same math -> the histories must agree to
    # fp re-association noise at most
    for (t1, v1), (t0, v0) in zip(losses[True], losses[False]):
        np.testing.assert_allclose(t1, t0, rtol=1e-6)
        np.testing.assert_allclose(v1, v0, rtol=1e-6)


def test_huge_bucket_auto_chunk_and_warning(toy_molecules, monkeypatch):
    """TrainConfig.near_row_chunk=-1 (default) AUTO-chunks buckets at/
    above the huge-N threshold (forcing remat for them) so huge-N
    training works out of the box — the full-width near activations OOM
    one chip at 568k and plain gathers measured 5.8x slower (r12
    battery).  Explicitly chunk=0 at a huge bucket warns instead; the
    auto-chunked history matches the unchunked default to fp noise."""
    import warnings

    from epnn_tpu import infer as infer_mod

    base = dict(epochs=2, batch_size=2, dense_max_atoms=4, seed=3)
    ref = train(toy_molecules, SMALL, TrainConfig(**base), progress=False)

    # shrink the huge-N policy into test range: every fused bucket
    # (padded >= 16) now auto-chunks at 8 rows
    monkeypatch.setattr(infer_mod, "HUGE_GRAPH_MIN_ATOMS", 16)
    monkeypatch.setattr(infer_mod, "HUGE_GRAPH_ROW_CHUNK", 8)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        auto = train(toy_molecules, SMALL, TrainConfig(**base),
                     progress=False)
    assert not any("near_row_chunk" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]
    for ha, hr in zip(auto.history, ref.history):
        np.testing.assert_allclose(ha["train_loss"], hr["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(ha["val_loss"], hr["val_loss"],
                                   rtol=1e-4)

    # explicit off at a huge bucket: loud warning, still runs
    tc0 = TrainConfig(**base, near_row_chunk=0)
    with warnings.catch_warnings(record=True) as rec0:
        warnings.simplefilter("always")
        train(toy_molecules, SMALL, tc0, progress=False)
    assert any("near_row_chunk" in str(w.message) for w in rec0), \
        [str(w.message) for w in rec0]

    # explicit chunk without remat is rejected (auto forces it instead)
    with pytest.raises(ValueError, match="remat"):
        train(toy_molecules, SMALL,
              TrainConfig(**base, near_row_chunk=8), progress=False)


def test_precompute_neighbors_cell_branch():
    """Buckets >= CELL_GRID_MIN_ATOMS precompute their tables through the
    cell-list builder (with_d2=True — the r9 e2e battery caught this
    branch untested); one epoch through the public trainer must run and
    keep conservation-grade finite losses."""
    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.infer import CELL_GRID_MIN_ATOMS

    n = CELL_GRID_MIN_ATOMS + 16
    g = np.random.default_rng(13)
    side = (n / 0.1) ** (1 / 3)
    labels = g.normal(0, 0.1, size=n).astype(np.float32)
    labels -= labels.sum() / n
    mols = [Molecule(name="cell0",
                     symbols=list(g.choice(["H", "C", "N", "O"], size=n)),
                     xyz=g.uniform(0, side, (n, 3)).astype(np.float32),
                     total_charge=0.0, labels=labels)]
    tc = TrainConfig(epochs=1, batch_size=1, seed=1, val_fraction=0.0)
    res = train(mols, SMALL, tc, val_mols=mols, progress=False)
    assert np.isfinite(res.history[0]["train_loss"])
    assert np.isfinite(res.best_val_masked_mae)


def test_metric_accumulator_batched_readback():
    """loss/masked/padded reduce in ONE batched device_get (tunnel hosts
    pay ~25 ms per transfer) and the cache invalidates on update."""
    import jax.numpy as jnp

    from epnn_tpu.train.loop import MetricAccumulator

    acc = MetricAccumulator()
    assert acc.loss == 0.0 and acc.masked_mae == 0.0 and acc.padded_mae == 0.0
    acc.update(jnp.asarray(2.0), jnp.asarray([4.0, 2.0, 6.0, 3.0]))
    assert acc.loss == 2.0
    acc.update(jnp.asarray(4.0), jnp.asarray([2.0, 1.0, 3.0, 1.0]))
    assert acc.loss == 3.0
    assert acc.masked_mae == pytest.approx(2.0)      # (4+2)/(2+1)
    assert acc.padded_mae == pytest.approx(9.0 / 4)  # (6+3)/(3+1)


def test_eval_every_skips_and_forces_final(toy_train_mols, tmp_path):
    """eval_every=2 over 3 epochs: epoch 0 skips eval (val metrics None,
    best untouched), epoch 1 evaluates, the FINAL epoch always evaluates."""
    tc = TrainConfig(epochs=3, batch_size=8, seed=0, eval_every=2,
                     checkpoint_dir=str(tmp_path / "run"))
    res = train(toy_train_mols, SMALL, tc, progress=False)
    evals = [r["val_masked_mae"] is not None for r in res.history]
    assert evals == [False, True, True]
    assert res.history[0]["val_loss"] is None
    # best comes only from evaluated epochs
    assert res.best_val_masked_mae == pytest.approx(
        min(r["val_masked_mae"] for r in res.history if r["val_masked_mae"]
            is not None))
    assert (tmp_path / "run" / "best").exists()


def test_early_stopping(toy_train_mols):
    """lr=0 never improves after the first eval; patience=2 stops the run
    well before the epoch budget, and best reflects the first eval."""
    tc = TrainConfig(epochs=50, batch_size=8, seed=0, learning_rate=0.0,
                     early_stop_patience=2)
    res = train(toy_train_mols, SMALL, tc, progress=False)
    assert len(res.history) == 3  # eval0 improves, evals 1-2 stale -> stop
    assert res.best_val_masked_mae == pytest.approx(
        res.history[0]["val_masked_mae"])


def test_early_stop_patience_survives_resume(toy_train_mols, tmp_path):
    """stale_evals persists in checkpoint meta: a run interrupted one
    stale eval short of the patience stops after ONE more stale eval on
    resume (not a full fresh patience window)."""
    out = str(tmp_path / "run")
    tc = TrainConfig(epochs=2, batch_size=8, seed=0, learning_rate=0.0,
                     early_stop_patience=3, checkpoint_dir=out)
    train(toy_train_mols, SMALL, tc, progress=False)  # eval0 best, eval1 stale
    tc2 = TrainConfig(epochs=50, batch_size=8, seed=0, learning_rate=0.0,
                      early_stop_patience=3, checkpoint_dir=out, resume=True)
    res = train(toy_train_mols, SMALL, tc2, progress=False)
    # resumes at epoch 2 with stale_evals=1; epochs 2,3 go stale -> stop
    assert [r["epoch"] for r in res.history] == [2, 3]


def test_empty_validation_set_warns_and_skips_eval(toy_train_mols, tmp_path):
    """val_fraction=0 with no explicit val set: loud warning, val metrics
    null, no bogus 0.0 'best', no best/ checkpoint dir."""
    tc = TrainConfig(epochs=2, batch_size=8, seed=0, val_fraction=0.0,
                     checkpoint_dir=str(tmp_path / "run"))
    with pytest.warns(UserWarning, match="empty validation set"):
        res = train(toy_train_mols, SMALL, tc, progress=False)
    assert all(r["val_masked_mae"] is None for r in res.history)
    assert res.best_val_masked_mae == float("inf")
    assert not (tmp_path / "run" / "best").exists()


def _find_injected_lr(opt_state):
    hp = getattr(opt_state, "hyperparams", None)
    if isinstance(hp, dict) and "learning_rate" in hp:
        return float(hp["learning_rate"])
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        for s in opt_state:
            lr = _find_injected_lr(s)
            if lr is not None:
                return lr
    return None


def test_lr_reduce_on_plateau(toy_train_mols):
    """A vanishing LR never improves val after the first eval; patience=1
    then halves the LR every evaluated epoch.  The scaled value must land
    in BOTH the history mirror and the live opt_state leaf (the runtime
    operand the compiled step reads — no recompile)."""
    tc = TrainConfig(epochs=4, batch_size=8, seed=0, learning_rate=1e-30,
                     lr_plateau_factor=0.5, lr_plateau_patience=1,
                     grad_clip_norm=1.0)  # chain() exercises the traversal
    res = train(toy_train_mols, SMALL, tc, progress=False)
    assert [r["lr"] for r in res.history] == pytest.approx(
        [1e-30, 1e-30, 0.5e-30, 0.25e-30])
    assert _find_injected_lr(res.state.opt_state) == pytest.approx(
        0.125e-30)  # scaled once more after the final epoch's row


def test_lr_plateau_rejects_cosine():
    from epnn_tpu.train.loop import make_optimizer

    with pytest.raises(ValueError, match="constant"):
        make_optimizer(TrainConfig(lr_schedule="cosine",
                                   lr_plateau_factor=0.5))


def test_ema_decay_zero_matches_live_params(toy_train_mols):
    """decay=0 makes the EMA track the live params exactly — val metrics
    must equal a run without EMA at the same seed."""
    tc0 = TrainConfig(epochs=2, batch_size=8, seed=0)
    tc1 = TrainConfig(epochs=2, batch_size=8, seed=0, ema_decay=0.0)
    r0 = train(toy_train_mols, SMALL, tc0, progress=False)
    r1 = train(toy_train_mols, SMALL, tc1, progress=False)
    for a, b in zip(r0.history, r1.history):
        assert a["val_masked_mae"] == pytest.approx(b["val_masked_mae"],
                                                    rel=1e-6)


def test_ema_decay_one_freezes_eval(toy_train_mols, tmp_path):
    """decay=1 freezes the EMA at init: val MAE is constant across epochs
    while the train loss decreases, and best/ holds the EMA (init) params,
    not the trained live params."""
    import os

    import jax

    from epnn_tpu.io import load_params
    from epnn_tpu.models import init_params
    from epnn_tpu.train.loop import create_state

    out = str(tmp_path / "run")
    tc = TrainConfig(epochs=3, batch_size=8, seed=0, ema_decay=1.0,
                     checkpoint_dir=out)
    res = train(toy_train_mols, SMALL, tc, progress=False)
    maes = [r["val_masked_mae"] for r in res.history]
    assert maes[0] == pytest.approx(maes[-1], rel=1e-6)
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]
    init = create_state(SMALL, tc, jax.random.key(tc.seed)).params
    saved = load_params(os.path.join(out, "best"), init)
    flat_saved = jax.tree_util.tree_leaves(saved)
    flat_init = jax.tree_util.tree_leaves(init)
    for a, b in zip(flat_saved, flat_init):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_grad_accum_window_semantics(toy_train_mols):
    """grad_accum=k (optax.MultiSteps): params are FROZEN inside an
    accumulation window, and a window of k copies of the SAME minibatch
    equals one plain-optimizer step on that minibatch (the running mean
    of identical grads is exactly the grad)."""
    import jax

    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.train import create_state, make_optimizer, train_step_fused

    cfg = SMALL
    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules(toy_train_mols[:6], table, pad_to=16)
    w = np.ones((6,), np.float32)
    args = (batch.x, batch.q0, batch.xyz, batch.node_mask, batch.y, w)
    k = 3

    tc_acc = TrainConfig(learning_rate=3e-3, grad_accum=k)
    opt_acc = make_optimizer(tc_acc)
    st = create_state(cfg, tc_acc, jax.random.key(0))
    p0 = st.params
    for i in range(k):
        if i:  # params must not move before the window boundary
            for a, b in zip(jax.tree_util.tree_leaves(st.params),
                            jax.tree_util.tree_leaves(p0)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        st, loss, _, _ = train_step_fused(st, cfg, tc_acc.loss, opt_acc,
                                          8, 12, *args)

    tc1 = TrainConfig(learning_rate=3e-3)
    opt1 = make_optimizer(tc1)
    st1 = create_state(cfg, tc1, jax.random.key(0))
    st1, _, _, _ = train_step_fused(st1, cfg, tc1.loss, opt1, 8, 12, *args)
    for a, b in zip(jax.tree_util.tree_leaves(st.params),
                    jax.tree_util.tree_leaves(st1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_grad_accum_composes_with_plateau_lr():
    """_scale_plateau_lr must reach the injected LR leaf INSIDE the
    MultiStepsState wrapper (namedtuple recursion) without disturbing the
    pytree structure the compiled step was traced with."""
    import jax

    from epnn_tpu.train.loop import (_scale_plateau_lr, create_state,
                                     make_optimizer)

    tc = TrainConfig(learning_rate=1e-3, lr_plateau_factor=0.5,
                     grad_accum=2, grad_clip_norm=1.0)
    st = create_state(SMALL, tc, jax.random.key(0))
    scaled = _scale_plateau_lr(st.opt_state, 0.5)

    def find(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            return float(hp["learning_rate"])
        if isinstance(s, tuple):
            subs = ((getattr(s, f) for f in s._fields)
                    if hasattr(s, "_fields") else s)
            for sub in subs:
                r = find(sub)
                if r is not None:
                    return r
        return None

    assert find(st.opt_state) == pytest.approx(1e-3)
    assert find(scaled) == pytest.approx(0.5e-3)
    assert (jax.tree_util.tree_structure(scaled)
            == jax.tree_util.tree_structure(st.opt_state))


def test_grad_accum_train_loss_decreases(toy_train_mols):
    """End-to-end: the public train() loop with grad_accum=2 still learns
    (half as many optimizer updates per epoch, same minibatch stream)."""
    tc = TrainConfig(epochs=8, batch_size=4, seed=1, grad_accum=2)
    res = train(toy_train_mols, SMALL, tc, progress=False)
    assert (res.history[-1]["train_loss"]
            < res.history[0]["train_loss"] * 0.9)


def test_grad_accum_resume_mismatch_fails_loudly(toy_train_mols, tmp_path):
    """The MultiSteps accumulator lives in opt_state: resuming with a
    different grad_accum must raise a clear ValueError (not a flax
    structure error), and resuming with the SAME value works."""
    ckpt = str(tmp_path / "run")
    tc = TrainConfig(epochs=2, batch_size=8, seed=1, grad_accum=2,
                     checkpoint_dir=ckpt)
    train(toy_train_mols, SMALL, tc, progress=False)

    bad = TrainConfig(epochs=3, batch_size=8, seed=1, grad_accum=1,
                      checkpoint_dir=ckpt, resume=True)
    with pytest.raises(ValueError, match="grad_accum=1.*grad_accum=2"):
        train(toy_train_mols, SMALL, bad, progress=False)

    ok = TrainConfig(epochs=3, batch_size=8, seed=1, grad_accum=2,
                     checkpoint_dir=ckpt, resume=True)
    res = train(toy_train_mols, SMALL, ok, progress=False)
    assert res.history[0]["epoch"] == 2


def test_train_step_fused_near_row_chunk(toy_train_mols):
    """Huge-N training memory mode (TrainConfig.near_row_chunk /
    near_window): the chunked training step — lax.map near chunks with the
    chunk BODY checkpointed under remat — must track the full-width remat
    step's loss trajectory to fp order, with and without windowed gathers,
    and predictions must stay conserving.  (The forward chunking is
    bitwise — tests/test_fused.py — so any drift here would be an adjoint
    bug.)"""
    import jax

    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.ops.fused import (build_neighbors_batch,
                                    neighbor_window_width)
    from epnn_tpu.train import create_state, make_optimizer, train_step_fused

    cfg = SMALL
    tc = TrainConfig(learning_rate=3e-3)
    opt = make_optimizer(tc)
    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules(toy_train_mols[:6], table, pad_to=16)
    w = np.ones((6,), np.float32)
    args = (batch.x, batch.q0, batch.xyz, batch.node_mask, batch.y, w)

    idx, nmask, _ = build_neighbors_batch(
        np.asarray(batch.xyz), np.asarray(batch.node_mask), cfg.cutoff, 12)
    win = neighbor_window_width(np.asarray(idx), np.asarray(nmask), 8,
                                align=2)
    assert 0 < win < 16  # per-molecule padding keeps indices local

    losses = {}
    for label, kw in (
        ("full", {}),
        ("chunk", dict(near_row_chunk=8)),
        ("chunk+win", dict(near_row_chunk=8, near_window=win)),
    ):
        state = create_state(cfg, tc, jax.random.key(0))
        ls = []
        for _ in range(4):
            state, loss, pred, _ = train_step_fused(
                state, cfg, tc.loss, opt, 8, 12, *args, remat=True, **kw)
            ls.append(float(loss))
        cons = np.asarray(pred).sum(1) - np.asarray(
            batch.q0 * batch.node_mask).sum(1)
        assert np.abs(cons).max() < 1e-4, label
        losses[label] = ls
    assert losses["full"][-1] < losses["full"][0]
    np.testing.assert_allclose(losses["chunk"], losses["full"], rtol=2e-4)
    np.testing.assert_allclose(losses["chunk+win"], losses["full"],
                               rtol=2e-4)


def test_train_near_chunk_config_validation(toy_train_mols):
    """near_window with chunking explicitly OFF, and near_row_chunk
    without remat, both fail loudly (the latter silently saves no
    memory).  near_window with the -1 auto-chunk default is legal: the
    window applies to whichever buckets auto-chunk."""
    with pytest.raises(ValueError, match="near_window requires"):
        train(toy_train_mols, SMALL,
              TrainConfig(epochs=1, near_window=8, near_row_chunk=0),
              progress=False)
    # near_window under the -1 auto default with no bucket reaching the
    # huge-N threshold: loud warning instead of a silent no-op
    import warnings

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        train(toy_train_mols, SMALL,
              TrainConfig(epochs=1, near_window=8), progress=False)
    assert any("no training bucket will chunk" in str(w.message)
               for w in rec), [str(w.message) for w in rec]
    with pytest.raises(ValueError, match="requires remat"):
        train(toy_train_mols, SMALL,
              TrainConfig(epochs=1, near_row_chunk=8), progress=False)
