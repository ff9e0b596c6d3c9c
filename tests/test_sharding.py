"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4)."""

import jax
import numpy as np
import pytest

from epnn_tpu.models import EPNNConfig, init_params
from epnn_tpu.ops import forward_blocked, fuse_params
from epnn_tpu.parallel import make_mesh, shard_batch_args, shard_state
from epnn_tpu.parallel.atom_shard import forward_atom_sharded

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SMALL = EPNNConfig(h_dim=16, e_dim=16, msg_dim=8, mlp_hidden=(8, 8), T=2)


@needs_devices
class TestAtomSharding:
    def test_matches_blocked_forward(self, rng):
        cfg = SMALL
        params = init_params(cfg, jax.random.key(0))
        fused = fuse_params(params, cfg)
        n = 32  # divisible by 8
        x = rng.normal(size=(1, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(-4, 4, size=(1, n, 3)).astype(np.float32)
        mask = np.ones((1, n), np.float32)
        q0 = np.full((1, n), 1.0 / n, np.float32)

        mesh = make_mesh(n_data=1, n_atoms=8)
        q_sharded = np.asarray(
            forward_atom_sharded(fused, x[0], q0[0], xyz[0], mask[0], cfg, mesh)
        )
        q_blocked = np.asarray(
            forward_blocked(fused, x, q0, xyz, mask, cfg, block=4)
        )[0]
        np.testing.assert_allclose(q_sharded, q_blocked, atol=2e-5)

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_nbr_sharded_matches_single_device(self, rng, use_pallas):
        """The neighbor-split atom-sharded forward (O(N·k/D) featurized +
        O(N²/D) far-field per device) must match the single-device
        neighbor path to fp noise and conserve charge."""
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

        cfg = SMALL
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        fused = fuse_params(params, cfg)
        b, n = 2, 48
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 8, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        mask[:, -5:] = 0.0
        q0 = np.full((b, n), 1.0 / n, np.float32)

        mesh = make_mesh(n_data=2, n_atoms=4)
        out = np.asarray(forward_atom_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k=16,
            use_pallas=use_pallas))
        ref = np.asarray(forward_blocked(fused, x, q0, xyz, mask, cfg,
                                         block=8, neighbor_k=16))
        scale = np.abs(ref).max() + 1.0
        assert np.abs(out - ref).max() < 1e-5 * scale
        # conservation: Σ out == Σ (q0 · mask) per graph
        want = (q0 * mask).sum(1)
        np.testing.assert_allclose(out.sum(1), want, atol=2e-5)

    @pytest.mark.parametrize("tier", ["bfloat16", "bf16x3"])
    def test_nbr_sharded_dtype_tiers(self, rng, tier):
        """compute_dtype='bfloat16' and the bf16x3 far-field tier run on the
        sharded nbr forward (they used to raise): each must match the
        single-chip forward_blocked under the SAME config to fp noise and
        keep conservation at f32 grade (the f32-pass-rounds rule carries
        over — pass weights stay f32, antisymmetry is bitwise per shard)."""
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

        cfg = SMALL
        if tier == "bfloat16":
            cfg = cfg.replace(compute_dtype="bfloat16")
        else:
            cfg = cfg.replace(dense_matmul_precision="bf16x3")
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        fused = fuse_params(params, cfg)
        b, n = 2, 48
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 8, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        mask[:, -5:] = 0.0
        q0 = np.full((b, n), 1.0 / n, np.float32)

        mesh = make_mesh(n_data=2, n_atoms=4)
        out = np.asarray(forward_atom_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k=16))
        ref = np.asarray(forward_blocked(fused, x, q0, xyz, mask, cfg,
                                         block=8, neighbor_k=16))
        scale = np.abs(ref).max() + 1.0
        tol = 2e-2 if tier == "bfloat16" else 1e-5
        assert np.abs(out - ref).max() < tol * scale
        # conservation stays f32-grade even under bf16 compute
        want = (q0 * mask).sum(1)
        np.testing.assert_allclose(out.sum(1), want, atol=5e-5)

    def test_nbr_sharded_chunked_windowed(self, rng):
        """Huge-N chunked + windowed near path on the atom-sharded forward
        (the multi-chip twin of forward_blocked's near_row_chunk /
        near_window): chunking must be BITWISE identical to the full-width
        sharded forward, and a window >= the per-device safe width must be
        bitwise identical too.  Line geometry so the window is genuinely
        smaller than N (sharded row gathers read the GLOBAL tables — the
        r11 gather cliff applies at any device count)."""
        from epnn_tpu.ops.fused import (build_neighbors,
                                        max_neighbor_count,
                                        neighbor_window_width)
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

        cfg = SMALL
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        fused = fuse_params(params, cfg)
        b, n = 2, 64
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = np.zeros((b, n, 3), np.float32)
        xyz[:, :, 0] = np.arange(n) * 1.1
        xyz[:, :, 1] = rng.uniform(0, 0.5, size=(b, n))
        mask = np.ones((b, n), np.float32)
        mask[:, -5:] = 0.0
        xyz *= mask[..., None]
        q0 = np.full((b, n), 1.0 / n, np.float32)
        k = int(max(max_neighbor_count(xyz[i], mask[i], cfg.cutoff)
                    for i in range(b))) + 2
        tabs = [np.stack(a) for a in zip(*(
            build_neighbors(xyz[i], mask[i], cfg.cutoff, k, with_d2=True)
            for i in range(b)))]
        nbrs = tuple(np.asarray(a) for a in tabs)

        mesh = make_mesh(n_data=2, n_atoms=4)
        r = n // 4
        args = (fused, x, q0, xyz, mask, cfg, mesh)
        base = np.asarray(forward_atom_sharded_nbr_batch(
            *args, k=k, neighbors=nbrs))
        for chunk in (8, 6):  # 8 divides R=16; 6 exercises chunk padding
            out_c = np.asarray(forward_atom_sharded_nbr_batch(
                *args, k=k, neighbors=nbrs, near_row_chunk=chunk))
            np.testing.assert_array_equal(out_c, base)
        # safe window: max over per-device row slices (the Predictor's
        # _near_window_sharded computation)
        chunk = 8
        win = max(int(neighbor_window_width(
            nbrs[0][:, d0:d0 + r], nbrs[1][:, d0:d0 + r], chunk, align=8))
            for d0 in range(0, n, r))
        assert 0 < win < n
        out_w = np.asarray(forward_atom_sharded_nbr_batch(
            *args, k=k, neighbors=nbrs, near_row_chunk=chunk,
            near_window=win))
        np.testing.assert_array_equal(out_w, base)
        # conservation through the chunked+windowed sharded program
        want = (q0 * mask).sum(1)
        np.testing.assert_allclose(out_w.sum(1), want, atol=2e-5)
        with pytest.raises(ValueError, match="near_window requires"):
            forward_atom_sharded_nbr_batch(*args, k=k, neighbors=nbrs,
                                           near_window=16)

    def test_conservation_sharded(self, rng):
        cfg = SMALL
        fused = fuse_params(init_params(cfg, jax.random.key(1)), cfg)
        n = 64
        x = rng.normal(size=(n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        mask = np.ones((n,), np.float32)
        q0 = np.full((n,), -2.0 / n, np.float32)
        mesh = make_mesh(n_data=1, n_atoms=8)
        q = np.asarray(forward_atom_sharded(fused, x, q0, xyz, mask, cfg, mesh))
        scale = np.abs(q).sum() + 1.0
        assert abs(q.sum() + 2.0) < 2e-6 * scale


@needs_devices
class Test2DMesh:
    """Batch over 'data' × pair-grid rows over 'atoms' simultaneously."""

    def test_batched_forward_matches_blocked(self, rng):
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_batch

        cfg = SMALL
        fused = fuse_params(init_params(cfg, jax.random.key(0)), cfg)
        b, n = 4, 16
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(-4, 4, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        mask[0, 13:] = 0  # one padded graph in the batch
        x[0, 13:] = 0
        xyz[0, 13:] = 0
        q0 = mask * (np.array([1.0, -1.0, 0.0, 2.0], np.float32)[:, None]
                     / mask.sum(1)[:, None])

        mesh = make_mesh(n_data=2, n_atoms=4)
        q2d = np.asarray(forward_atom_sharded_batch(
            fused, x, q0, xyz, mask, cfg, mesh))
        q_blk = np.asarray(forward_blocked(fused, x, q0, xyz, mask, cfg, block=4))
        scale = np.abs(q_blk).max() + 1.0
        assert np.abs(q2d - q_blk).max() < 1e-5 * scale
        # conservation per graph under the 2-D sharding
        np.testing.assert_allclose(
            q2d.sum(1), [1.0, -1.0, 0.0, 2.0],
            atol=2e-6 * (np.abs(q2d).sum() + 1))

    def test_sharded_training_step(self, rng):
        """Training on a graph whose pair grid is spread over the atoms axis:
        grads flow through shard_map (psum transpose), loss decreases."""
        import optax

        from epnn_tpu.parallel.atom_shard import make_sharded_train_step
        from epnn_tpu.train import TrainConfig, create_state

        cfg = SMALL
        tc = TrainConfig(learning_rate=3e-3)
        state = create_state(cfg, tc, jax.random.key(0))
        mesh = make_mesh(n_data=1, n_atoms=8)
        opt = __import__("optax").adam(3e-3)
        state = state.replace(opt_state=opt.init(state.params))
        step = make_sharded_train_step(cfg, opt, mesh)

        b, n = 1, 64
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(-6, 6, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        q0 = np.zeros((b, n), np.float32)
        y = rng.normal(0, 0.3, size=(b, n)).astype(np.float32)
        w = np.ones((b,), np.float32)

        losses = []
        for _ in range(5):
            state, loss, _, mets = step(state, x, q0, xyz, mask, y, w)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_sharded_training_step_neighbor_split(self, rng):
        """The neighbor-split sharded training step (remat'd rounds,
        O(N·k/D) featurized per device) must train — loss decreasing — and
        agree with the single-device fused trainer's first-step loss."""
        import optax

        from epnn_tpu.ops.fused import max_neighbor_count
        from epnn_tpu.parallel.atom_shard import make_sharded_train_step
        from epnn_tpu.train import TrainConfig, create_state
        from epnn_tpu.train.loop import train_step_fused

        cfg = SMALL
        tc = TrainConfig(learning_rate=3e-3)
        state = create_state(cfg, tc, jax.random.key(0))
        mesh = make_mesh(n_data=1, n_atoms=8)
        opt = optax.adam(3e-3)
        state = state.replace(opt_state=opt.init(state.params))

        b, n = 1, 64
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 10, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        q0 = np.zeros((b, n), np.float32)
        y = rng.normal(0, 0.3, size=(b, n)).astype(np.float32)
        w = np.ones((b,), np.float32)
        k = int(max_neighbor_count(xyz[0], mask[0], cfg.cutoff)) + 2

        step = make_sharded_train_step(cfg, opt, mesh, neighbor_k=k)
        st = state
        losses = []
        for _ in range(5):
            st, loss, _, _ = step(st, x, q0, xyz, mask, y, w)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

        # forward parity with the single-device fused trainer
        _, loss1, _, _ = train_step_fused(
            state, cfg, tc.loss, opt, 8, k, x, q0, xyz, mask, y, w)
        np.testing.assert_allclose(losses[0], float(loss1), rtol=1e-4)

    def test_sharded_training_chunked_windowed(self, rng):
        """Huge-N TRAINING on the mesh (make_sharded_train_step
        near_row_chunk/near_window): the chunk-body-checkpointed backward
        must train — loss decreasing — and the first-step loss must match
        the full-width sharded step to fp association noise (the values
        are the same math chunk-sliced; XLA may re-block the GEMMs)."""
        import optax

        from epnn_tpu.ops.fused import (build_neighbors,
                                        max_neighbor_count,
                                        neighbor_window_width)
        from epnn_tpu.parallel.atom_shard import make_sharded_train_step
        from epnn_tpu.train import TrainConfig, create_state

        cfg = SMALL
        tc = TrainConfig(learning_rate=3e-3)
        state = create_state(cfg, tc, jax.random.key(0))
        mesh = make_mesh(n_data=1, n_atoms=8)
        opt = optax.adam(3e-3)
        state = state.replace(opt_state=opt.init(state.params))

        b, n = 1, 64
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = np.zeros((b, n, 3), np.float32)  # line: windows << n
        xyz[:, :, 0] = np.arange(n) * 1.1
        xyz[:, :, 1] = rng.uniform(0, 0.5, size=(b, n))
        mask = np.ones((b, n), np.float32)
        q0 = np.zeros((b, n), np.float32)
        y = rng.normal(0, 0.3, size=(b, n)).astype(np.float32)
        w = np.ones((b,), np.float32)
        k = int(max_neighbor_count(xyz[0], mask[0], cfg.cutoff)) + 2
        nbrs = tuple(a[None] for a in build_neighbors(
            xyz[0], mask[0], cfg.cutoff, k, with_d2=True))
        nbrs = tuple(np.asarray(a) for a in nbrs)
        r, chunk = n // 8, 4
        win = max(int(neighbor_window_width(
            nbrs[0][:, d0:d0 + r], nbrs[1][:, d0:d0 + r], chunk, align=8))
            for d0 in range(0, n, r))
        assert 0 < win < n

        step_full = make_sharded_train_step(cfg, opt, mesh, neighbor_k=k)
        _, loss_full, _, _ = step_full(state, x, q0, xyz, mask, y, w,
                                       neighbors=nbrs)
        step_ck = make_sharded_train_step(
            cfg, opt, mesh, neighbor_k=k, near_row_chunk=chunk,
            near_window=win)
        st, losses = state, []
        for _ in range(5):
            st, loss, _, _ = step_ck(st, x, q0, xyz, mask, y, w,
                                     neighbors=nbrs)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        np.testing.assert_allclose(losses[0], float(loss_full), rtol=1e-5)

        # validation: chunking needs remat (chunk-body checkpoint) and k
        with pytest.raises(ValueError, match="remat"):
            make_sharded_train_step(cfg, opt, mesh, neighbor_k=k,
                                    near_row_chunk=chunk, remat=False)
        with pytest.raises(ValueError, match="near_row_chunk"):
            make_sharded_train_step(cfg, opt, mesh, near_row_chunk=chunk)

    def test_sharded_training_far_cluster(self, rng):
        """make_sharded_train_step(far_cluster=C): the approximate clustered
        far-field TRAINING tier on the atom-sharded mesh — loss decreases,
        finite, and the first-step loss tracks the single-device fused
        trainer at the same C (the sharded k-means fit is replicated on the
        gathered pj, so forwards agree to fp noise)."""
        import optax

        from epnn_tpu.ops.fused import max_neighbor_count
        from epnn_tpu.parallel.atom_shard import make_sharded_train_step
        from epnn_tpu.train import TrainConfig, create_state
        from epnn_tpu.train.loop import train_step_fused

        cfg = SMALL
        tc = TrainConfig(learning_rate=3e-3)
        state = create_state(cfg, tc, jax.random.key(0))
        mesh = make_mesh(n_data=1, n_atoms=8)
        opt = optax.adam(3e-3)
        state = state.replace(opt_state=opt.init(state.params))

        b, n = 1, 64
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 10, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        q0 = np.zeros((b, n), np.float32)
        y = rng.normal(0, 0.3, size=(b, n)).astype(np.float32)
        w = np.ones((b,), np.float32)
        k = int(max_neighbor_count(xyz[0], mask[0], cfg.cutoff)) + 2

        step = make_sharded_train_step(cfg, opt, mesh, neighbor_k=k,
                                       far_cluster=4)
        st = state
        losses = []
        for _ in range(4):
            st, loss, _, _ = step(st, x, q0, xyz, mask, y, w)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

        _, loss1, _, _ = train_step_fused(
            state, cfg, tc.loss, opt, 8, k, x, q0, xyz, mask, y, w,
            far_cluster=4)
        np.testing.assert_allclose(losses[0], float(loss1), rtol=1e-4)

        with pytest.raises(ValueError, match="far_cluster requires"):
            make_sharded_train_step(cfg, opt, mesh, far_cluster=4)

    def test_public_trainer_atom_sharded_dispatch(self, rng):
        """train(mesh with atoms axis > 1) routes big buckets through the
        atom-sharded step — training a graph whose pair grid is spread over
        the mesh, via the public API."""
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.train import TrainConfig, train
        import epnn_tpu.parallel.atom_shard as AS

        g = np.random.default_rng(12)
        mols = []
        for i in range(3):
            n = int(g.integers(17, 24))  # pads to 24 — above dense_max=16
            labels = g.normal(0, 0.2, size=n).astype(np.float32)
            labels -= labels.sum() / n
            mols.append(Molecule(
                name=f"s{i}", symbols=list(g.choice(["C", "H", "O"], size=n)),
                xyz=g.uniform(-5, 5, (n, 3)).astype(np.float32),
                total_charge=0.0, labels=labels))

        calls = {"sharded": 0}
        orig = AS.make_sharded_train_step

        def spy(*a, **kw):
            step = orig(*a, **kw)

            def wrapped(*sa, **skw):
                calls["sharded"] += 1
                return step(*sa, **skw)

            return wrapped

        AS.make_sharded_train_step = spy
        try:
            mesh = make_mesh(n_data=1, n_atoms=8)
            tc = TrainConfig(epochs=4, batch_size=1, dense_max_atoms=16,
                             seed=1)
            res = train(mols, SMALL, tc, mesh=mesh, progress=False)
        finally:
            AS.make_sharded_train_step = orig
        assert calls["sharded"] > 0
        losses = [r["train_loss"] for r in res.history]
        assert losses[-1] < losses[0], losses


@needs_devices
class TestDataParallel:
    def test_dp_step_matches_single_device(self, rng):
        from epnn_tpu.models import EPNN
        from epnn_tpu.train import TrainConfig, create_state, make_optimizer, train_step

        cfg = SMALL
        tc = TrainConfig()
        model = EPNN(cfg)
        opt = make_optimizer(tc)
        b, n = 16, 8
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(-3, 3, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        q0 = np.zeros((b, n), np.float32)
        y = rng.normal(size=(b, n)).astype(np.float32)
        w = np.ones((b,), np.float32)

        state0 = create_state(cfg, tc, jax.random.key(0))
        _, loss_single, _, _ = train_step(
            state0, model, tc.loss, opt, x, q0, xyz, mask, y, w
        )

        mesh = make_mesh(n_data=8, n_atoms=1)
        state_dp = shard_state(create_state(cfg, tc, jax.random.key(0)), mesh)
        args = shard_batch_args((x, q0, xyz, mask, y, w), mesh)
        state_dp, loss_dp, _, _ = train_step(
            state_dp, model, tc.loss, opt, *args
        )
        np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)

    def test_indivisible_batch_rejected(self, rng):
        mesh = make_mesh(n_data=8, n_atoms=1)
        with pytest.raises(ValueError, match="not divisible"):
            shard_batch_args((np.zeros((13, 4)),), mesh)


@needs_devices
class TestPredictorMesh:
    """User-facing multi-chip inference: Predictor(mesh=...) and the CLI."""

    @pytest.mark.isolate  # 2 distinct sharded programs + a plain one: sat
    # past the XLA:CPU collective-program count threshold in the full
    # suite (CLAUDE.md round-8); the conftest isolate mechanism runs it
    # in a fresh pytest child
    def test_predictor_matches_unsharded(self):
        """Predictor(mesh=...) atom AND ring modes match the unsharded
        forward on a batch whose width is NOT divisible by the mesh."""
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems
        from epnn_tpu.infer import Predictor
        from epnn_tpu.models import EPNNConfig

        cfg = EPNNConfig(n_elems=10, h_dim=16, e_dim=16, msg_dim=8,
                         mlp_hidden=(8, 8), T=2)
        params = init_params(cfg, jax.random.key(0))
        g = np.random.default_rng(4)
        n = 21  # deliberately NOT divisible by the mesh - Predictor pads
        mol = Molecule(name="m", symbols=["C"] * n,
                       xyz=g.uniform(-4, 4, (n, 3)).astype(np.float32),
                       total_charge=1.0)
        batch = pad_molecules([mol], table_for_n_elems(cfg.n_elems))
        q_plain = Predictor(params=params, cfg=cfg).predict_batch(batch)
        scale = np.abs(q_plain).max() + 1.0
        mesh = make_mesh(n_data=1, n_atoms=8)
        for shard_mode in ("atom", "ring"):
            sharded = Predictor(params=params, cfg=cfg, mesh=mesh,
                                shard_mode=shard_mode)
            q_shard = sharded.predict_batch(batch)
            assert np.abs(q_shard - q_plain).max() < 1e-5 * scale, shard_mode

    def test_predictor_big_graph_nbr_sharded_dispatch(self, rng, monkeypatch):
        """Graphs padded wider than DENSE_MAX_ATOMS dispatch to the
        neighbor-split sharded forward on an atoms mesh (lowering the
        threshold triggers the branch at test size)."""
        import epnn_tpu.infer as I
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems
        from epnn_tpu.infer import Predictor

        cfg = SMALL
        params = init_params(cfg, jax.random.key(0))
        g = np.random.default_rng(5)
        n = 40
        mol = Molecule(name="m", symbols=["C"] * n,
                       xyz=(g.uniform(0, 8, (n, 3))).astype(np.float32),
                       total_charge=1.0)
        table = table_for_n_elems(cfg.n_elems)
        batch = pad_molecules([mol], table)

        plain = Predictor(params=params, cfg=cfg)
        q_plain = plain.predict_batch(batch)

        monkeypatch.setattr(I, "DENSE_MAX_ATOMS", 16)
        mesh = make_mesh(n_data=1, n_atoms=8)
        sharded = Predictor(params=params, cfg=cfg, mesh=mesh)
        q_shard = sharded.predict_batch(batch)
        # dense-vs-neighbor-split summation orders differ (fp association)
        scale = np.abs(q_plain).max() + 1.0
        assert np.abs(q_shard - q_plain).max() < 1e-4 * scale

    def test_cli_atom_shard_flag(self, tmp_path, toy_molecules):
        from epnn_tpu.cli import main
        from epnn_tpu.io import checkpoint as ckpt_io

        cfg = SMALL
        params = init_params(cfg, jax.random.key(0))
        ckpt_io.save_params(str(tmp_path / "ck"), params, cfg)
        m = toy_molecules[0]
        lines = [str(m.natoms), f"{m.total_charge:g} 1"]
        for s, xyz in zip(m.symbols, m.xyz):
            lines.append(f"{s} {xyz[0]} {xyz[1]} {xyz[2]}")
        (tmp_path / "m.xyz").write_text("\n".join(lines) + "\n")
        main(["infer", "--checkpoint", str(tmp_path / "ck"),
              str(tmp_path / "m.xyz"), "--out", str(tmp_path / "o"),
              "--atom-shard", "8"])
        q = np.load(tmp_path / "o" / "m_pred.npy")
        np.testing.assert_allclose(q.sum(), m.total_charge, atol=1e-4)


@pytest.mark.heavy  # 85 s; byte-identical to the driver's own per-round
# dryrun_multichip run (MULTICHIP_r0N.json) — zero unique coverage here
@needs_devices
def test_graft_dryrun():
    # Run in a SUBPROCESS (exactly how the driver invokes it): executing a
    # second ring-training program after the dryrun's in ONE process hits
    # an XLA:CPU virtual-device collectives abort (SIGABRT, no message;
    # jax.clear_caches() does not dodge it) — isolating the dryrun's
    # backend state fixes the suite without losing any coverage.
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        cwd=root, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    q = np.asarray(jax.jit(fn)(*args))
    assert q.shape == (2, 128)
    assert np.isfinite(q).all()
    # random-init magnitudes are huge at N=128; conservation is exact up to
    # fp32 summation noise relative to |q|
    err = np.abs(q.sum(1) - 1.0)
    assert np.all(err < 1e-6 * (np.abs(q).sum(1) + 1.0))


@needs_devices
class TestRingSharding:
    """Ring-circulated pair grid (ppermute over the atoms axis) — the
    nothing-replicated variant for graphs beyond one chip's memory."""

    def test_matches_blocked_forward(self, rng):
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded

        cfg = SMALL
        fused = fuse_params(init_params(cfg, jax.random.key(0)), cfg)
        n = 32
        x = rng.normal(size=(1, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(-4, 4, size=(1, n, 3)).astype(np.float32)
        mask = np.ones((1, n), np.float32)
        q0 = np.full((1, n), -2.0 / n, np.float32)
        mesh = make_mesh(n_data=1, n_atoms=8)
        q_ring = np.asarray(
            forward_ring_sharded(fused, x[0], q0[0], xyz[0], mask[0], cfg, mesh)
        )
        q_blocked = np.asarray(
            forward_blocked(fused, x, q0, xyz, mask, cfg, block=4)
        )[0]
        scale = np.abs(q_blocked).max() + 1.0
        assert np.abs(q_ring - q_blocked).max() < 1e-5 * scale
        assert abs(q_ring.sum() + 2.0) < 2e-6 * (np.abs(q_ring).sum() + 1)

    def test_with_padding_and_compat(self, rng):
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded

        cfg = SMALL.replace(mask_messages=False)
        fused = fuse_params(init_params(cfg, jax.random.key(2)), cfg)
        n, nr = 40, 33
        x = rng.normal(size=(1, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(-4, 4, size=(1, n, 3)).astype(np.float32)
        mask = np.zeros((1, n), np.float32)
        mask[:, :nr] = 1
        x[:, nr:] = 0
        xyz[:, nr:] = 0
        q0 = mask / nr
        mesh = make_mesh(n_data=1, n_atoms=8)
        q_ring = np.asarray(
            forward_ring_sharded(fused, x[0], q0[0], xyz[0], mask[0], cfg, mesh)
        )
        q_blocked = np.asarray(
            forward_blocked(fused, x, q0, xyz, mask, cfg, block=8)
        )[0]
        scale = np.abs(q_blocked).max() + 1.0
        assert np.abs(q_ring - q_blocked).max() < 1e-5 * scale
        assert np.all(q_ring[nr:] == 0.0)


@needs_devices
class TestRingNbrSharding:
    """Neighbor-split ring (SURVEY §7 stage 6): per-step far-field kernel +
    gathered near pairs from a geometry-only selection pre-pass."""

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_matches_blocked_forward(self, rng, use_pallas):
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded_nbr_batch

        cfg = SMALL
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        fused = fuse_params(params, cfg)
        b, n = 2, 48
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 8, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        mask[:, -5:] = 0.0
        q0 = np.full((b, n), 1.0 / n, np.float32)

        mesh = make_mesh(n_data=2, n_atoms=4)  # nd = 12
        out = np.asarray(forward_ring_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k_blk=12,
            use_pallas=use_pallas))
        ref = np.asarray(forward_blocked(fused, x, q0, xyz, mask, cfg,
                                         block=8, neighbor_k=16))
        scale = np.abs(ref).max() + 1.0
        assert np.abs(out - ref).max() < 1e-4 * scale
        want = (q0 * mask).sum(1)
        np.testing.assert_allclose(out.sum(1), want, atol=2e-5)

    def test_matches_atom_sharded(self, rng):
        """VERDICT done-criterion: ring nbr ≈ atom-sharded nbr ≤ 1e-4."""
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded_nbr_batch

        cfg = SMALL
        fused = fuse_params(init_params(cfg, jax.random.key(1)), cfg)
        b, n = 1, 64
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 9, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        q0 = np.full((b, n), -1.0 / n, np.float32)
        mesh = make_mesh(n_data=1, n_atoms=8)  # nd = 8
        ring = np.asarray(forward_ring_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k_blk=8))
        atom = np.asarray(forward_atom_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k=24))
        scale = np.abs(atom).max() + 1.0
        assert np.abs(ring - atom).max() < 1e-4 * scale

    @pytest.mark.isolate  # XLA:CPU aborts (SIGABRT, no message) when a
    # ring-training executable runs after other sharded-training programs
    # in one process (reproducible with the preceding 2DMesh/DP tests;
    # jax.clear_caches() does not dodge it) — backend artifact, not ring
    # code, which passes in any fresh process (conftest isolate child)
    def test_ring_training_loss_decreases(self):
        """Ring-sharded training works (loss decreases through the
        ppermute scans)."""
        import optax

        from epnn_tpu.parallel.atom_shard import make_sharded_train_step
        from epnn_tpu.train.loop import TrainState

        cfg = SMALL
        params = init_params(cfg, jax.random.key(3))
        rng = np.random.default_rng(0)
        b, n = 1, 48
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 8, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        q0 = np.zeros((b, n), np.float32)
        y = rng.normal(size=(b, n)).astype(np.float32) * 0.1
        w = np.ones((b,), np.float32)
        mesh = make_mesh(n_data=1, n_atoms=8)
        opt = optax.adam(1e-2)
        state = TrainState(params=params, opt_state=opt.init(params),
                           step=0)
        step = make_sharded_train_step(cfg, opt, mesh, neighbor_k=6,
                                       shard_mode="ring")
        losses = []
        for _ in range(5):
            state, loss, _, _ = step(state, x, q0, xyz, mask, y, w)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_predictor_ring_mode_batched(self, rng):
        """Predictor(shard_mode='ring') runs the whole batch in one sharded
        program and matches the single-chip predictor."""
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems
        from epnn_tpu.infer import Predictor

        cfg = SMALL
        params = init_params(cfg, jax.random.key(4))
        g = np.random.default_rng(11)
        mols = [Molecule(name=f"m{i}", symbols=["C"] * 30,
                         xyz=g.uniform(0, 7, (30, 3)).astype(np.float32),
                         total_charge=float(i - 1))
                for i in range(2)]
        table = table_for_n_elems(cfg.n_elems)
        batch = pad_molecules(mols, table, pad_to=32)

        mesh = make_mesh(n_data=2, n_atoms=4)
        plain = Predictor(params=params, cfg=cfg,
                          force_mode="blocked").predict_batch(batch)
        ring = Predictor(params=params, cfg=cfg, mesh=mesh,
                         shard_mode="ring").predict_batch(batch)
        scale = np.abs(plain).max() + 1.0
        assert np.abs(ring - plain).max() < 1e-4 * scale


@needs_devices
def test_scaling_work_divides(rng):
    """Work-division proxy (no real multi-chip here): the per-device SPMD
    module's flop count for the sharded nbr forward must fall ~1/D —
    catches structural non-scaling (e.g. accidentally replicated pair
    work).  Full sweep: scripts/mesh_scaling_sweep.py."""
    from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

    cfg = SMALL
    fused = fuse_params(init_params(cfg, jax.random.key(0)), cfg)
    n, k = 256, 16
    x = rng.normal(size=(1, n, cfg.n_elems)).astype(np.float32)
    xyz = rng.uniform(0, 14, size=(1, n, 3)).astype(np.float32)
    mask = np.ones((1, n), np.float32)
    q0 = np.zeros((1, n), np.float32)

    def flops(d):
        mesh = make_mesh(n_data=1, n_atoms=d)

        def f(fused, x, q0, xyz, mask):
            return forward_atom_sharded_nbr_batch(
                fused, x, q0, xyz, mask, cfg, mesh, k=k)

        ca = jax.jit(f).lower(fused, x, q0, xyz, mask).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"])

    f2, f8 = flops(2), flops(8)
    assert f8 < f2 / 2.5, (f2, f8)  # ideal 4.0x, slack for O(N·k) residue


@needs_devices
class TestShardedUniformQ0Collapse:
    """Round-1 far-field collapse on the multi-chip forwards: with the
    pad_molecules contract, uniform_q0=True must match the uncollapsed
    sharded forward to association-level fp noise and keep conservation
    (ops/fused.py::_forward_single_nbr documents the identity; the atom
    form rebuilds the grid from replicated x, the ring form from O(E)
    collectives)."""

    @staticmethod
    def _contract_batch(seed=0, n_mols=2, natoms=40, pad_to=48):
        from epnn_tpu.data.dataset import pad_molecules, uniform_q0_contract
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems

        g = np.random.default_rng(seed)
        mols = [
            Molecule(
                name=f"m{i}",
                symbols=list(g.choice(["H", "C", "N", "O", "S"], natoms)),
                xyz=g.uniform(0, 8, (natoms, 3)).astype(np.float32),
                total_charge=float(i - 1),
            )
            for i in range(n_mols)
        ]
        b = pad_molecules(mols, table_for_n_elems(10), pad_to=pad_to)
        assert uniform_q0_contract(b.x, b.q0, b.node_mask)
        return b

    @staticmethod
    def _cfg_fused(mask_messages=True):
        cfg = EPNNConfig(n_elems=10, h_dim=16, e_dim=16, msg_dim=8,
                         mlp_hidden=(8, 8), T=2,
                         mask_messages=mask_messages)
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.3 if a.ndim == 1 else a, params)
        return cfg, fuse_params(params, cfg)

    @pytest.mark.parametrize("mask_messages", [True, False])
    def test_atom_nbr_collapse_matches(self, rng, mask_messages):
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

        cfg, fused = self._cfg_fused(mask_messages)
        b = self._contract_batch()
        mesh = make_mesh(n_data=2, n_atoms=4)
        args = (fused, b.x, b.q0, b.xyz, b.node_mask, cfg, mesh)
        base = np.asarray(forward_atom_sharded_nbr_batch(*args, k=16))
        col = np.asarray(forward_atom_sharded_nbr_batch(
            *args, k=16, uniform_q0=True))
        scale = np.abs(base).max() + 1.0
        assert np.abs(col - base).max() < 1e-5 * scale
        want = (b.q0 * b.node_mask).sum(1)
        np.testing.assert_allclose(col.sum(1), want, atol=2e-5)

    def test_ring_nbr_collapse_matches(self, rng):
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded_nbr_batch

        cfg, fused = self._cfg_fused()
        b = self._contract_batch()
        mesh = make_mesh(n_data=2, n_atoms=4)
        args = (fused, b.x, b.q0, b.xyz, b.node_mask, cfg, mesh)
        base = np.asarray(forward_ring_sharded_nbr_batch(*args, k_blk=12))
        col = np.asarray(forward_ring_sharded_nbr_batch(
            *args, k_blk=12, uniform_q0=True))
        scale = np.abs(base).max() + 1.0
        assert np.abs(col - base).max() < 1e-5 * scale
        want = (b.q0 * b.node_mask).sum(1)
        np.testing.assert_allclose(col.sum(1), want, atol=2e-5)

    def test_sharded_train_step_collapse_tracks(self, rng):
        """make_sharded_train_step(uniform_q0=True) losses track the
        uncollapsed step step-for-step (atom mode; the remat'd backward
        runs through the collapsed round)."""
        import optax

        from epnn_tpu.parallel.atom_shard import make_sharded_train_step
        from epnn_tpu.train.loop import TrainState

        cfg, _ = self._cfg_fused()
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.3 if a.ndim == 1 else a, params)
        b = self._contract_batch()
        y = np.asarray(
            np.random.default_rng(1).normal(size=b.q0.shape), np.float32)
        w = np.ones((b.x.shape[0],), np.float32)
        mesh = make_mesh(n_data=2, n_atoms=4)
        opt = optax.adam(3e-3)

        losses = {}
        for uq0 in (False, True):
            step = make_sharded_train_step(cfg, opt, mesh, neighbor_k=16,
                                           uniform_q0=uq0)
            state = TrainState(params=params, opt_state=opt.init(params),
                               step=0)
            ls = []
            for _ in range(3):
                state, loss, _, _ = step(state, b.x, b.q0, b.xyz,
                                         b.node_mask, y, w)
                ls.append(float(loss))
            losses[uq0] = ls
        assert losses[True][-1] < losses[True][0]
        np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


@needs_devices
class TestShardedFarCluster:
    """Clustered far-field tier on the atom-sharded forward: the k-means
    fits REPLICATED on the gathered pj rows (deterministic — identical
    centroids on every device) and each device evaluates only its grid
    rows.  Contract: (a) matches the single-chip clustered forward to
    fp noise (the k-means sees fp-noise-different pj between the paths,
    so assignment flips near Voronoi boundaries are possible — bound is
    looser than the exact-path 1e-5), (b) conservation stays EXACT at any
    C (pass rounds untouched), (c) C = N recovers the exact sharded
    forward, (d) the Predictor mesh path uses it for big graphs and
    warns-and-degrades for dense small graphs.  The ring path runs the
    tier with a DISTRIBUTED k-means (weighted_kmeans_sharded: identical
    seed choice, psum-ed Lloyd sums) — same contract, same bounds."""

    @staticmethod
    def _system(rng):
        cfg = SMALL
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        fused = fuse_params(params, cfg)
        b, n, k = 2, 48, 16
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 8, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        mask[:, -5:] = 0.0
        q0 = np.full((b, n), 1.0 / n, np.float32)
        return cfg, params, fused, x, q0, xyz, mask, k

    def test_matches_single_chip_cluster(self, rng):
        from epnn_tpu.ops.fused import forward_blocked
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

        cfg, _, fused, x, q0, xyz, mask, k = self._system(rng)
        mesh = make_mesh(n_data=2, n_atoms=4)
        for c in (6, 20):
            q_1c = np.asarray(forward_blocked(
                fused, x, q0, xyz, mask, cfg, block=16, neighbor_k=k,
                far_cluster=c))
            q_sh = np.asarray(forward_atom_sharded_nbr_batch(
                fused, x, q0, xyz, mask, cfg, mesh, k=k, far_cluster=c))
            scale = np.abs(q_1c).max() + 1.0
            assert np.abs(q_sh - q_1c).max() < 1e-4 * scale, c
            # conservation exact per graph at ANY C
            want = (q0 * mask).sum(1)
            np.testing.assert_allclose((q_sh * mask).sum(1), want,
                                       atol=2e-5)

    def test_c_equals_n_matches_exact_sharded(self, rng):
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

        cfg, _, fused, x, q0, xyz, mask, k = self._system(rng)
        mesh = make_mesh(n_data=2, n_atoms=4)
        base = np.asarray(forward_atom_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k=k))
        q_c = np.asarray(forward_atom_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k=k,
            far_cluster=x.shape[1]))
        scale = np.abs(base).max() + 1.0
        assert np.abs(q_c - base).max() < 2e-5 * scale

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_ring_matches_single_chip_cluster(self, rng, use_pallas):
        """Ring tier (distributed k-means) vs the single-chip clustered
        forward: same 1e-4 bound as the atom tier (the psum-ed Lloyd sums
        add reduction-order noise on top of the pj fp noise), exact
        conservation at any C."""
        from epnn_tpu.ops.fused import forward_blocked
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded_nbr_batch

        cfg, _, fused, x, q0, xyz, mask, k = self._system(rng)
        mesh = make_mesh(n_data=2, n_atoms=4)  # nd = 12
        for c in (6, 20):
            q_1c = np.asarray(forward_blocked(
                fused, x, q0, xyz, mask, cfg, block=16, neighbor_k=k,
                far_cluster=c))
            q_rg = np.asarray(forward_ring_sharded_nbr_batch(
                fused, x, q0, xyz, mask, cfg, mesh, k_blk=12,
                use_pallas=use_pallas, far_cluster=c))
            scale = np.abs(q_1c).max() + 1.0
            assert np.abs(q_rg - q_1c).max() < 1e-4 * scale, c
            want = (q0 * mask).sum(1)
            np.testing.assert_allclose((q_rg * mask).sum(1), want,
                                       atol=2e-5)

    def test_ring_c_equals_n_matches_exact_ring(self, rng):
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded_nbr_batch

        cfg, _, fused, x, q0, xyz, mask, k = self._system(rng)
        mesh = make_mesh(n_data=2, n_atoms=4)
        base = np.asarray(forward_ring_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k_blk=12))
        q_c = np.asarray(forward_ring_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k_blk=12,
            far_cluster=x.shape[1]))
        scale = np.abs(base).max() + 1.0
        assert np.abs(q_c - base).max() < 2e-5 * scale

    def test_ring_composes_with_collapse_and_reuse(self, rng):
        """far_cluster + uniform_q0 (round 1 stays the exact grid) +
        precomputed neighbors on the RING path — full serving stack."""
        from epnn_tpu.ops.fused import build_neighbors_batch, forward_blocked
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded_nbr_batch

        b = TestShardedUniformQ0Collapse._contract_batch()
        cfg, fused = TestShardedUniformQ0Collapse._cfg_fused()
        mesh = make_mesh(n_data=2, n_atoms=4)
        k = 16
        nbrs = tuple(np.asarray(a) for a in build_neighbors_batch(
            jax.numpy.asarray(b.xyz), jax.numpy.asarray(b.node_mask),
            cfg.cutoff, k))
        q_1c = np.asarray(forward_blocked(
            fused, b.x, b.q0, b.xyz, b.node_mask, cfg, block=16,
            neighbor_k=k, neighbors=nbrs, uniform_q0=True, far_cluster=8))
        q_rg = np.asarray(forward_ring_sharded_nbr_batch(
            fused, b.x, b.q0, b.xyz, b.node_mask, cfg, mesh,
            k_blk=min(k, b.x.shape[1] // 4), neighbors=nbrs,
            uniform_q0=True, far_cluster=8))
        scale = np.abs(q_1c).max() + 1.0
        assert np.abs(q_rg - q_1c).max() < 1e-4 * scale
        want = (b.q0 * b.node_mask).sum(1)
        np.testing.assert_allclose((q_rg * b.node_mask).sum(1), want,
                                   atol=2e-5)

    def test_composes_with_collapse_and_reuse(self, rng):
        """far_cluster + uniform_q0 (round 1 stays the exact grid) +
        precomputed neighbors — the full serving stack on the mesh."""
        from epnn_tpu.ops.fused import build_neighbors_batch, forward_blocked
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

        b = TestShardedUniformQ0Collapse._contract_batch()
        cfg, fused = TestShardedUniformQ0Collapse._cfg_fused()
        mesh = make_mesh(n_data=2, n_atoms=4)
        k = 16
        nbrs = tuple(np.asarray(a) for a in build_neighbors_batch(
            jax.numpy.asarray(b.xyz), jax.numpy.asarray(b.node_mask),
            cfg.cutoff, k))
        q_1c = np.asarray(forward_blocked(
            fused, b.x, b.q0, b.xyz, b.node_mask, cfg, block=16,
            neighbor_k=k, neighbors=nbrs, uniform_q0=True, far_cluster=8))
        q_sh = np.asarray(forward_atom_sharded_nbr_batch(
            fused, b.x, b.q0, b.xyz, b.node_mask, cfg, mesh, k=k,
            neighbors=nbrs, uniform_q0=True, far_cluster=8))
        scale = np.abs(q_1c).max() + 1.0
        assert np.abs(q_sh - q_1c).max() < 1e-4 * scale
        want = (b.q0 * b.node_mask).sum(1)
        np.testing.assert_allclose((q_sh * b.node_mask).sum(1), want,
                                   atol=2e-5)

    @pytest.mark.isolate  # THREE distinct sharded predictor programs in
    # one test (atom clustered, ring clustered, atom exact) — crossed the
    # XLA:CPU collectives SIGABRT count threshold on top of prior sharded
    # tests (reproduced 2026-08-19; neither jax.clear_caches nor
    # clear_backends dodges it); conftest isolate child
    def test_predictor_dispatch_and_warnings(self, monkeypatch):
        """Big graphs on an atom mesh AND the ring path run the clustered
        tier silently; dense small graphs warn and run exact."""
        import warnings

        import epnn_tpu.infer as I
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems
        from epnn_tpu.infer import Predictor
        from epnn_tpu.models import EPNNConfig

        cfg = EPNNConfig(h_dim=16, e_dim=16, msg_dim=8, mlp_hidden=(8, 8),
                         T=2)
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        g = np.random.default_rng(7)
        n = 40
        mol = Molecule(name="m", symbols=["C"] * n,
                       xyz=g.uniform(0, 8, (n, 3)).astype(np.float32),
                       total_charge=1.0)
        batch = pad_molecules([mol], table_for_n_elems(cfg.n_elems))
        mesh = make_mesh(n_data=1, n_atoms=8)

        monkeypatch.setattr(I, "DENSE_MAX_ATOMS", 16)
        big = Predictor(params=params, cfg=cfg, mesh=mesh, far_cluster=8)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            q = big.predict_batch(batch)
        np.testing.assert_allclose(q.sum(), 1.0, atol=1e-4)

        ring = Predictor(params=params, cfg=cfg, mesh=mesh, far_cluster=8,
                         shard_mode="ring")
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            q_ring = ring.predict_batch(batch)
        np.testing.assert_allclose(q_ring.sum(), 1.0, atol=1e-4)

        monkeypatch.setattr(I, "DENSE_MAX_ATOMS", 4096)
        dense = Predictor(params=params, cfg=cfg, mesh=mesh, far_cluster=8)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            dense.predict_batch(batch)
        assert any("exact far field" in str(w.message) for w in rec), \
            [str(w.message) for w in rec]


@needs_devices
class TestShardedNeighborReuse:
    """Precomputed-neighbor serving on the atom-sharded forward: the
    (B, N, k) tables shard over (data, atoms), each device consumes its
    row slices — outputs must be identical to in-forward selection (top_k
    is per row), and the Predictor mesh path must use them when
    reuse_neighbors / neighbor_skin are set."""

    def test_forward_matches_inforward_selection(self, rng):
        from epnn_tpu.ops.fused import build_neighbors_batch
        from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch

        cfg = SMALL
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        fused = fuse_params(params, cfg)
        b, n, k = 2, 48, 16
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 8, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        mask[:, -5:] = 0.0
        q0 = np.full((b, n), 1.0 / n, np.float32)

        mesh = make_mesh(n_data=2, n_atoms=4)
        nbrs = tuple(np.asarray(a) for a in build_neighbors_batch(
            jax.numpy.asarray(xyz), jax.numpy.asarray(mask), cfg.cutoff, k))
        base = np.asarray(forward_atom_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k=k))
        reuse = np.asarray(forward_atom_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k=k, neighbors=nbrs))
        # the precomputed d2 comes from build_neighbors' (N, N) scoring,
        # the in-forward one from the shard's (R, N) slice — last-ulp d2
        # differences are possible across the two shapes, so fp-noise
        # tolerance, not bitwise
        scale = np.abs(base).max() + 1.0
        assert np.abs(reuse - base).max() < 1e-5 * scale

    def test_ring_forward_reuse_matches(self, rng):
        """Ring forward with a precomputed global table (3-tuple and the
        skin 2-tuple) matches the cold ring forward to the same pinned
        fp-noise bound as the atom path (1e-5 relative: the conversion
        pre-pass changes per-row summation order, and 2-tuple d² is
        regathered from circulating blocks)."""
        from epnn_tpu.ops.fused import build_neighbors_batch
        from epnn_tpu.parallel.ring_shard import forward_ring_sharded_nbr_batch

        cfg = SMALL
        params = init_params(cfg, jax.random.key(1))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        fused = fuse_params(params, cfg)
        b, n, k = 2, 48, 16
        x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
        xyz = rng.uniform(0, 8, size=(b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), np.float32)
        mask[:, -5:] = 0.0
        q0 = np.full((b, n), 1.0 / n, np.float32)

        mesh = make_mesh(n_data=2, n_atoms=4)
        nd = n // 4
        k_blk = min(k, nd)
        nbrs = tuple(np.asarray(a) for a in build_neighbors_batch(
            jax.numpy.asarray(xyz), jax.numpy.asarray(mask), cfg.cutoff, k))
        base = np.asarray(forward_ring_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k_blk=k_blk))
        scale = np.abs(base).max() + 1.0
        reuse3 = np.asarray(forward_ring_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k_blk=k_blk,
            neighbors=nbrs))
        assert np.abs(reuse3 - base).max() < 1e-5 * scale
        reuse2 = np.asarray(forward_ring_sharded_nbr_batch(
            fused, x, q0, xyz, mask, cfg, mesh, k_blk=k_blk,
            neighbors=nbrs[:2]))
        assert np.abs(reuse2 - base).max() < 1e-5 * scale
        # conservation survives the conversion pre-pass (symmetric table)
        np.testing.assert_allclose(
            (reuse3 * mask).sum(axis=1), (q0 * mask).sum(axis=1), atol=1e-4)
        # an undersized k_blk that could drop pairs is rejected loudly
        with pytest.raises(ValueError, match="k_blk"):
            forward_ring_sharded_nbr_batch(
                fused, x, q0, xyz, mask, cfg, mesh, k_blk=k_blk - 2,
                neighbors=nbrs)

    def test_predictor_ring_reuse_and_skin(self, rng):
        """Predictor ring mode honors reuse_neighbors / neighbor_skin (the
        round-3 verdict's silent-degrade gap): reuse matches cold ring to
        the pinned 1e-5 bound, skin survives sub-skin/2 drift."""
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems
        from epnn_tpu.infer import Predictor

        cfg = SMALL
        params = init_params(cfg, jax.random.key(2))
        g = np.random.default_rng(7)
        natoms = 40
        mol = Molecule(name="m",
                       symbols=list(g.choice(["H", "C", "N", "O"], natoms)),
                       xyz=g.uniform(0, 7, (natoms, 3)).astype(np.float32),
                       total_charge=1.0)
        b = pad_molecules([mol], table_for_n_elems(cfg.n_elems), pad_to=40)
        mesh = make_mesh(n_data=1, n_atoms=4)

        base = Predictor(params=params, cfg=cfg, mesh=mesh,
                         shard_mode="ring").predict_batch(b)
        reuse = Predictor(params=params, cfg=cfg, mesh=mesh,
                          shard_mode="ring",
                          reuse_neighbors=True).predict_batch(b)
        scale = np.abs(base).max() + 1.0
        assert np.abs(reuse - base).max() < 1e-5 * scale

        skin_pred = Predictor(params=params, cfg=cfg, mesh=mesh,
                              shard_mode="ring", reuse_neighbors=True,
                              neighbor_skin=0.5)
        q0_ = skin_pred.predict_batch(b)
        assert np.abs(q0_ - base).max() < 1e-5 * scale
        b.xyz += (g.uniform(-1, 1, b.xyz.shape) * 0.05).astype(
            np.float32) * b.node_mask[..., None]
        q1 = skin_pred.predict_batch(b)
        assert skin_pred.skin_rebuilds == 1
        q1_ref = Predictor(params=params, cfg=cfg, mesh=mesh,
                           shard_mode="ring").predict_batch(b)
        assert np.abs(q1 - q1_ref).max() < 1e-5 * scale

    def test_predictor_mesh_reuse_and_skin(self, rng, monkeypatch):
        import epnn_tpu.infer as I
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems
        from epnn_tpu.infer import Predictor

        monkeypatch.setattr(I, "DENSE_MAX_ATOMS", 16)  # force the nbr path
        cfg = EPNNConfig(n_elems=10, h_dim=16, e_dim=16, msg_dim=8,
                         mlp_hidden=(8, 8), T=2)
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.3 if a.ndim == 1 else a, params)
        g = np.random.default_rng(5)
        natoms = 40
        mol = Molecule(name="m",
                       symbols=list(g.choice(["H", "C", "N", "O"], natoms)),
                       xyz=g.uniform(0, 7, (natoms, 3)).astype(np.float32),
                       total_charge=1.0)
        b = pad_molecules([mol], table_for_n_elems(10), pad_to=40)
        mesh = make_mesh(n_data=1, n_atoms=4)

        base = Predictor(params=params, cfg=cfg, mesh=mesh).predict_batch(b)
        reuse = Predictor(params=params, cfg=cfg, mesh=mesh,
                          reuse_neighbors=True).predict_batch(b)
        scale0 = np.abs(base).max() + 1.0
        assert np.abs(reuse - base).max() < 1e-5 * scale0

        skin_pred = Predictor(params=params, cfg=cfg, mesh=mesh,
                              reuse_neighbors=True, neighbor_skin=0.5)
        q0_ = skin_pred.predict_batch(b)
        scale = np.abs(base).max() + 1.0
        assert np.abs(q0_ - base).max() < 1e-5 * scale
        # drift within skin/2: no rebuild, still matches a fresh predictor
        b.xyz += (g.uniform(-1, 1, b.xyz.shape) * 0.05).astype(
            np.float32) * b.node_mask[..., None]
        q1 = skin_pred.predict_batch(b)
        assert skin_pred.skin_rebuilds == 1
        q1_ref = Predictor(params=params, cfg=cfg, mesh=mesh).predict_batch(b)
        assert np.abs(q1 - q1_ref).max() < 1e-5 * scale

    def test_predictor_mesh_auto_window_unsorted_goes_off(self, rng,
                                                          monkeypatch):
        """r4-advisor HIGH fix: on a ≥2-atom-device mesh the auto
        ``near_window`` width is measured on per-device row slices whose
        neighbor indices are GLOBAL — the clamp must be at the global
        table height (window off for an unsorted 3-D geometry), never at
        the slice height R, which would silently mask-drop real pairs.
        Charges through the chunked mesh path must stay bitwise equal to
        the unchunked reuse path."""
        import epnn_tpu.infer as I
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems
        from epnn_tpu.infer import Predictor

        monkeypatch.setattr(I, "DENSE_MAX_ATOMS", 16)  # force the nbr path
        cfg = SMALL
        params = init_params(cfg, jax.random.key(3))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.2 if a.ndim == 1 else a, params)
        g = np.random.default_rng(11)
        natoms = 40
        # dense 3-D blob in caller-random order: every device slice's
        # neighbor-index spread is ~N >> R
        mol = Molecule(name="m",
                       symbols=list(g.choice(["H", "C", "N", "O"], natoms)),
                       xyz=g.uniform(0, 5, (natoms, 3)).astype(np.float32),
                       total_charge=1.0)
        b = pad_molecules([mol], table_for_n_elems(cfg.n_elems), pad_to=40)
        mesh = make_mesh(n_data=1, n_atoms=4)

        base = Predictor(params=params, cfg=cfg, mesh=mesh,
                         reuse_neighbors=True).predict_batch(b)
        pred = Predictor(params=params, cfg=cfg, mesh=mesh,
                         reuse_neighbors=True, near_row_chunk=8,
                         spatial_sort="off")
        out = pred.predict_batch(b)
        np.testing.assert_array_equal(out, base)
        # the cached auto width must be 0 (off), not clamped at R=10
        widths = [w for d in pred._winw_cache.values() for w in d.values()]
        assert widths == [0], widths

    def test_predictor_mesh_cold_sorted_window(self, rng, monkeypatch):
        """r4-advisor fix: COLD mesh big-graph calls (no reuse tables)
        get their window width from the sorted cell keys — the auto
        spatial sort's cost is repaid through windowed gathers instead of
        being paid for nothing.  Line geometry → a genuinely compact
        window; charges must match the unsorted/unwindowed mesh forward
        to fp noise (the sort permutes reduction order)."""
        import epnn_tpu.infer as I
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.data.xyz import Molecule
        from epnn_tpu.elements import table_for_n_elems
        from epnn_tpu.infer import Predictor

        monkeypatch.setattr(I, "DENSE_MAX_ATOMS", 16)
        monkeypatch.setattr(I, "HUGE_GRAPH_MIN_ATOMS", 32)
        cfg = SMALL
        params = init_params(cfg, jax.random.key(4))
        g = np.random.default_rng(13)
        natoms = 64
        xyz = np.zeros((natoms, 3), np.float32)
        xyz[:, 0] = g.permutation(natoms) * 1.1  # scrambled line
        xyz[:, 1] = g.uniform(0, 0.5, natoms)
        mol = Molecule(name="m",
                       symbols=list(g.choice(["H", "C", "N", "O"], natoms)),
                       xyz=xyz, total_charge=0.0)
        b = pad_molecules([mol], table_for_n_elems(cfg.n_elems), pad_to=64)
        mesh = make_mesh(n_data=1, n_atoms=4)

        base = Predictor(params=params, cfg=cfg, mesh=mesh,
                         spatial_sort="off").predict_batch(b)
        pred = Predictor(params=params, cfg=cfg, mesh=mesh,
                         near_row_chunk=8, spatial_sort="auto")
        out = pred.predict_batch(b)
        scale = np.abs(base).max() + 1.0
        assert np.abs(out - base).max() < 1e-5 * scale
        # the sort must have produced a real (compact, on) cold window
        widths = [w for d in pred._winw_cache.values() for w in d.values()]
        assert widths and all(0 < w < 64 for w in widths), widths


@pytest.mark.heavy  # ring-train covered by loss_decreases + dryrun; uq0 tracks
@pytest.mark.isolate  # two DISTINCT ring-training executables in one test
# (XLA:CPU virtual-device collective SIGABRT artifact; conftest child)
def test_ring_training_uniform_q0_tracks():
    """Ring-sharded training with the round-1 collapse (uniform_q0=True —
    pmax/psum grid assembly under remat+grad) tracks the uncollapsed
    step's losses."""
    import optax

    from epnn_tpu.data.dataset import pad_molecules, uniform_q0_contract
    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.models import EPNNConfig
    from epnn_tpu.parallel.atom_shard import make_sharded_train_step
    from epnn_tpu.train.loop import TrainState

    cfg = EPNNConfig(n_elems=10, h_dim=16, e_dim=16, msg_dim=8,
                     mlp_hidden=(8, 8), T=2)
    params = init_params(cfg, jax.random.key(0))
    g = np.random.default_rng(0)
    mols = [Molecule(name=f"m{i}",
                     symbols=list(g.choice(["H", "C", "N", "O"], 40)),
                     xyz=g.uniform(0, 7, (40, 3)).astype(np.float32),
                     total_charge=0.0) for i in range(2)]
    b = pad_molecules(mols, table_for_n_elems(10), pad_to=48)
    assert uniform_q0_contract(b.x, b.q0, b.node_mask)
    y = g.normal(size=b.q0.shape).astype(np.float32) * 0.1
    w = np.ones((2,), np.float32)
    mesh = make_mesh(n_data=2, n_atoms=4)
    opt = optax.adam(3e-3)
    losses = {}
    for uq0 in (False, True):
        step = make_sharded_train_step(cfg, opt, mesh, neighbor_k=12,
                                       shard_mode="ring", uniform_q0=uq0)
        st = TrainState(params=params, opt_state=opt.init(params), step=0)
        ls = []
        for _ in range(3):
            st, loss, _, _ = step(st, b.x, b.q0, b.xyz, b.node_mask, y, w)
            ls.append(float(loss))
        losses[uq0] = ls
    assert losses[True][-1] < losses[True][0], losses
    assert np.allclose(losses[True], losses[False], rtol=1e-4), losses
