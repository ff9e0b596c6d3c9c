"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

from epnn_tpu.ops.pallas_kernels import (
    dense_message_rowsum,
    dense_message_rowsum_reference,
    fused_epn_rowsum,
    fused_message_rowsum,
)


def _np_rbf_gate(xyz, mask, cutoff=3.0, eta=2.0, e_dim=16, tol=1e-5):
    """First-principles oracle for the in-tile featurization (mirrors the
    reference semantics charge_gn.py:122-163, 90-94 — written independently
    of epnn_tpu.ops.fused so a shared bug cannot hide)."""
    n = len(xyz)
    d = np.sqrt(((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1))
    c = (np.cos(np.pi * d / cutoff) + 1) / 2
    c[d >= cutoff] = 0.0
    c[d <= 0.0] = 1.0
    cmask = mask[:, None] * mask[None, :] * (1 - np.eye(n))
    c = c * cmask
    mu = np.linspace(0.1, cutoff, e_dim)
    rbf = c[:, :, None] * np.exp(-eta * (d[:, :, None] - mu) ** 2)
    gate = (rbf.max(-1) > tol).astype(np.float32)
    return rbf.astype(np.float32), gate, c.astype(np.float32)


@pytest.fixture()
def pair_setup(rng):
    n, h, e_dim = 24, 8, 16
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    xyz = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    mask = np.ones(n, np.float32)
    mask[19:] = 0.0
    w1e = rng.normal(size=(e_dim, h)).astype(np.float32) * 0.3
    w2 = rng.normal(size=(h, h)).astype(np.float32) * 0.3
    b2 = rng.normal(size=(h,)).astype(np.float32)
    return n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2


class TestFusedEPNKernel:
    """The stage-5 flagship: both orderings + gate + antisymmetric reduction
    in-tile (reference charge_gn.py:101-118)."""

    def test_matches_oracle(self, pair_setup):
        n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2 = pair_setup
        out = np.asarray(fused_epn_rowsum(
            pi, pj, xyz, mask, w1e, w2, b2, block_i=8, block_j=8))

        rbf, gate, _ = _np_rbf_gate(xyz, mask, e_dim=e_dim)
        epart = rbf @ w1e
        hid_n = np.maximum(pi[:, None] + pj[None, :] + epart, 0)
        hid_t = np.maximum(pi[None, :] + pj[:, None] + epart, 0)
        hid_n = np.maximum(hid_n @ w2 + b2, 0)
        hid_t = np.maximum(hid_t @ w2 + b2, 0)
        expect = (0.5 * gate[:, :, None] * (hid_n - hid_t)).sum(1)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-4)

    def test_antisymmetry_exact(self, pair_setup):
        """Σ_i out_i @ w_out must cancel to ~0 (charge conservation)."""
        n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2 = pair_setup
        out = np.asarray(fused_epn_rowsum(
            pi, pj, xyz, mask, w1e, w2, b2, block_i=8, block_j=8))
        total = out.sum(0)
        assert np.abs(total).max() < 1e-4 * (np.abs(out).sum(0).max() + 1)

    def test_block_invariance(self, pair_setup):
        n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2 = pair_setup
        outs = [
            np.asarray(fused_epn_rowsum(pi, pj, xyz, mask, w1e, w2, b2,
                                        block_i=bi, block_j=bj))
            for bi, bj in ((8, 8), (8, 24), (24, 24))
        ]
        for o in outs[1:]:
            np.testing.assert_allclose(o, outs[0], atol=1e-4)

    def test_soft_gate(self, pair_setup):
        n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2 = pair_setup
        out = np.asarray(fused_epn_rowsum(
            pi, pj, xyz, mask, w1e, w2, b2, soft_gate=True,
            block_i=8, block_j=8))
        rbf, _, c = _np_rbf_gate(xyz, mask, e_dim=e_dim)
        epart = rbf @ w1e
        hid_n = np.maximum(pi[:, None] + pj[None, :] + epart, 0)
        hid_t = np.maximum(pi[None, :] + pj[:, None] + epart, 0)
        hid_n = np.maximum(hid_n @ w2 + b2, 0)
        hid_t = np.maximum(hid_t @ w2 + b2, 0)
        expect = (0.5 * c[:, :, None] * (hid_n - hid_t)).sum(1)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-4)


class TestDoublingRBF:
    """rbf_method="doubling" rebuilds the e_dim RBF channels from TWO exps
    per pair (geometric recurrence over the uniform mu grid, assembled by
    log2(e_dim) masked lane squarings) — must agree with the direct form to
    fp32 exponent-domain noise and stay finite for far/padded atoms."""

    @pytest.mark.parametrize("soft", [False, True])
    def test_epn_doubling_matches_direct(self, pair_setup, soft):
        n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2 = pair_setup
        a = np.asarray(fused_epn_rowsum(
            pi, pj, xyz, mask, w1e, w2, b2, soft_gate=soft,
            block_i=8, block_j=8, rbf_method="direct"))
        b = np.asarray(fused_epn_rowsum(
            pi, pj, xyz, mask, w1e, w2, b2, soft_gate=soft,
            block_i=8, block_j=8, rbf_method="doubling"))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)
        # antisymmetric cancellation is preserved (u, R0 are symmetric in
        # the pair, so both orderings see bitwise-identical features)
        assert np.abs(b.sum(0)).max() < 1e-4 * (np.abs(b).sum(0).max() + 1)

    @pytest.mark.parametrize("masked", [True, False])
    def test_message_doubling_matches_direct(self, pair_setup, masked):
        n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2 = pair_setup
        cv = np.ones(n, np.float32)
        a = np.asarray(fused_message_rowsum(
            pi, pj, xyz, mask, cv, w1e, w2, b2, masked=masked,
            block_i=8, block_j=8, rbf_method="direct"))
        b = np.asarray(fused_message_rowsum(
            pi, pj, xyz, mask, cv, w1e, w2, b2, masked=masked,
            block_i=8, block_j=8, rbf_method="doubling"))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)

    def test_far_atoms_stay_finite(self, pair_setup):
        """Unclamped u^ch would overflow at d >> cutoff (padded atoms sit at
        the origin, real ones can be hundreds of Å away) — the doubling
        branch clamps d to the cutoff, where the envelope is exactly 0."""
        n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2 = pair_setup
        xyz = xyz.copy()
        xyz[: n // 2] += 800.0
        out = np.asarray(fused_epn_rowsum(
            pi, pj, xyz, mask, w1e, w2, b2, block_i=8, block_j=8,
            rbf_method="doubling"))
        assert np.isfinite(out).all()
        ref = np.asarray(fused_epn_rowsum(
            pi, pj, xyz, mask, w1e, w2, b2, block_i=8, block_j=8,
            rbf_method="direct"))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


class TestPackedFusedKernels:
    """Lane-packed variants must agree with the unpacked kernels bitwise-ish
    (same math; kron-structured weights make cross-group products exact
    zeros) and preserve antisymmetry."""

    @pytest.fixture()
    def setup32(self, rng):
        n, h, e_dim = 64, 32, 16  # pack = 4; n % (4·8) == 0
        pi = rng.normal(size=(n, h)).astype(np.float32)
        pj = rng.normal(size=(n, h)).astype(np.float32)
        xyz = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        mask = np.ones(n, np.float32)
        mask[57:] = 0.0
        w1e = rng.normal(size=(e_dim, h)).astype(np.float32) * 0.3
        w2 = rng.normal(size=(h, h)).astype(np.float32) * 0.3
        b2 = rng.normal(size=(h,)).astype(np.float32)
        return pi, pj, xyz, mask, w1e, w2, b2

    @pytest.mark.parametrize("soft", [False, True])
    def test_epn_packed_matches_unpacked(self, setup32, soft):
        pi, pj, xyz, mask, w1e, w2, b2 = setup32
        a = np.asarray(fused_epn_rowsum(pi, pj, xyz, mask, w1e, w2, b2,
                                        soft_gate=soft, block_i=8, block_j=8,
                                        packed=False))
        b = np.asarray(fused_epn_rowsum(pi, pj, xyz, mask, w1e, w2, b2,
                                        soft_gate=soft, block_i=8,
                                        block_j=32, packed=True))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)
        # antisymmetric cancellation survives the packing
        assert np.abs(b.sum(0)).max() < 1e-4 * (np.abs(b).sum(0).max() + 1)

    @pytest.mark.parametrize("masked", [True, False])
    def test_message_packed_matches_unpacked(self, setup32, masked):
        pi, pj, xyz, mask, w1e, w2, b2 = setup32
        cv = np.ones(len(pi), np.float32)
        a = np.asarray(fused_message_rowsum(pi, pj, xyz, mask, cv, w1e, w2,
                                            b2, masked=masked, block_i=8,
                                            block_j=8, packed=False))
        b = np.asarray(fused_message_rowsum(pi, pj, xyz, mask, cv, w1e, w2,
                                            b2, masked=masked, block_i=8,
                                            block_j=32, packed=True))
        if masked:
            # the unpacked kernel zeroes padded rows via the pair mask; the
            # packed wrapper applies the row factor outside — same contract
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)
        else:
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)


class TestFusedMessageKernel:
    @pytest.mark.parametrize("masked", [True, False])
    def test_matches_oracle(self, pair_setup, masked):
        n, h, e_dim, pi, pj, xyz, mask, w1e, w2, b2 = pair_setup
        col_vec = np.ones(n, np.float32)
        out = np.asarray(fused_message_rowsum(
            pi, pj, xyz, mask, col_vec, w1e, w2, b2, masked=masked,
            block_i=8, block_j=8))

        rbf, _, _ = _np_rbf_gate(xyz, mask, e_dim=e_dim)
        epart = rbf @ w1e
        hid = np.maximum(pi[:, None] + pj[None, :] + epart, 0)
        hid = np.maximum(hid @ w2 + b2, 0)
        if masked:
            pairm = mask[:, None] * mask[None, :]  # diag kept
            hid = hid * pairm[:, :, None]
        expect = hid.sum(1)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-4)


class TestNeighborCompact:
    """Kernel-built neighbor lists must produce the exact same candidate SET
    as build_neighbors' top_k compaction whenever k honors the contract
    (k ≥ true max neighbor count) — order may differ (ascending column vs
    nearest-first)."""

    def _sets_match(self, xyz, mask, cutoff, k):
        from epnn_tpu.ops.fused import build_neighbors
        from epnn_tpu.ops.pallas_kernels import neighbor_compact

        i1, m1 = map(np.asarray, build_neighbors(xyz, mask, cutoff, k))
        i2, m2 = map(np.asarray, neighbor_compact(xyz, mask, cutoff, k))
        assert (m1.sum(1) == m2.sum(1)).all(), "per-row counts differ"
        for r in range(len(xyz)):
            got = set(i2[r][m2[r] > 0].tolist())
            want = set(i1[r][m1[r] > 0].tolist())
            assert got == want, (r, sorted(want), sorted(got))

    def test_matches_topk_set(self, rng):
        from epnn_tpu.ops.fused import max_neighbor_count

        n = 200
        xyz = rng.uniform(0, (n / 0.1) ** (1 / 3), (n, 3)).astype(np.float32)
        mask = np.ones(n, np.float32)
        mask[-20:] = 0.0
        k = int(max_neighbor_count(xyz, mask, 3.0)) + 4
        self._sets_match(xyz, mask, 3.0, k)

    def test_coincident_and_masked_atoms(self, rng):
        xyz = np.zeros((8, 3), np.float32)
        xyz[2] = [1.0, 0, 0]
        xyz[3] = [0, 1.5, 0]
        mask = np.ones(8, np.float32)
        mask[5:] = 0.0
        self._sets_match(xyz, mask, 3.0, 8)

    def test_block_boundary_rows(self, rng):
        """Atoms straddling tile boundaries (the count carry across the j
        grid) — pick N not a multiple of the block so padding is exercised."""
        from epnn_tpu.ops.fused import max_neighbor_count

        n = 57
        xyz = rng.uniform(0, 8.0, (n, 3)).astype(np.float32)
        mask = np.ones(n, np.float32)
        k = int(max_neighbor_count(xyz, mask, 3.0)) + 2
        self._sets_match(xyz, mask, 3.0, k)

    @pytest.mark.heavy  # non-default selection kernel (top_k/cell-list default)
    def test_forward_with_kernel_neighbors_matches(self, rng):
        """Kernel-built neighbor lists fed into the forward via the
        ``neighbors=`` argument (format integration: f32→int32 idx, mask
        dtype) must match the in-forward top_k selection to fp noise —
        different candidate ORDER, identical set."""
        import jax

        from epnn_tpu.models import init_params
        from epnn_tpu.models.config import EPNNConfig
        from epnn_tpu.ops import forward_blocked, fuse_params
        from epnn_tpu.ops.pallas_kernels import neighbor_compact

        cfg = EPNNConfig(n_elems=4, h_dim=8, e_dim=16, msg_dim=8,
                         mlp_hidden=(16,), T=2)
        params = init_params(cfg, jax.random.key(0))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.3 if a.ndim == 1 else a, params)
        fused = fuse_params(params, cfg)
        n = 40
        x = rng.normal(size=(1, n, 4)).astype(np.float32)
        q0 = (rng.normal(size=(1, n)) * 0.1).astype(np.float32)
        xyz = rng.uniform(0, 7, (1, n, 3)).astype(np.float32)
        mask = np.ones((1, n), np.float32)
        idx, m = neighbor_compact(xyz[0], mask[0], cfg.cutoff, 16)
        a = np.asarray(forward_blocked(fused, x, q0, xyz, mask, cfg,
                                       neighbor_k=16))
        b = np.asarray(forward_blocked(fused, x, q0, xyz, mask, cfg,
                                       neighbor_k=16,
                                       neighbors=(idx[None], m[None])))
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() < 1e-4 * max(scale, 1.0)
        # conservation unaffected by the kernel neighbor order (fp
        # association noise only — random-init weights amplify it)
        np.testing.assert_allclose(b.sum(), a.sum(), atol=2e-3)


@pytest.mark.parametrize("masked", [True, False])
def test_matches_oracle(rng, masked):
    n, h = 256, 32
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    nm = np.ones(n, np.float32)
    if masked:
        nm[200:] = 0.0
    w2 = rng.normal(size=(h, h)).astype(np.float32) * 0.2
    b2 = rng.normal(size=(h,)).astype(np.float32)
    out = np.asarray(
        dense_message_rowsum(pi, pj, nm, w2, b2, block_i=64, block_jp=32)
    )
    oracle = dense_message_rowsum_reference(pi, pj, nm, w2, b2)
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_kernel_has_no_first_layer_bias(rng):
    """The kernel's contract: pi carries any first-layer bias; the kernel
    must not add one.  Guard computed from first principles (not via the
    shared oracle, which the round-1 double-add bug also infected)."""
    n, h = 32, 8
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    nm = np.ones(n, np.float32)
    w2 = np.eye(h, dtype=np.float32)
    b2 = np.zeros(h, np.float32)
    out = np.asarray(dense_message_rowsum(pi, pj, nm, w2, b2,
                                          block_i=8, block_jp=2))
    expect = np.maximum(pi[:, None, :] + pj[None, :, :], 0.0).sum(1)
    np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-5)


def test_block_invariance(rng):
    n, h = 256, 32
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    nm = np.ones(n, np.float32)
    w2 = np.eye(h, dtype=np.float32)
    b2 = np.zeros(h, np.float32)
    outs = [
        np.asarray(dense_message_rowsum(pi, pj, nm, w2, b2,
                                        block_i=bi, block_jp=bjp))
        for bi, bjp in ((64, 16), (128, 64), (256, 32))
    ]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=1e-4)


@pytest.mark.parametrize("r,n", [(64, 64), (16, 64)])
def test_dense_message_custom_vjp(rng, r, n):
    """The kernel's backward (recompute-in-tile custom VJP) must match the
    XLA oracle's gradients for every differentiable input — including the
    rectangular R != N shape the atom-sharded train step differentiates
    (each shard's R = N/D rows against the full N columns)."""
    import jax
    import jax.numpy as jnp

    h = 32
    pi = jnp.asarray(rng.normal(size=(r, h)), jnp.float32)
    pj = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    cv = jnp.asarray((rng.uniform(size=n) > 0.2), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, h)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(r, h)), jnp.float32)

    def loss_k(pi, pj, w2, b2):
        return jnp.sum(dense_message_rowsum(pi, pj, cv, w2, b2,
                                            block_i=16, block_jp=8) * t)

    def loss_ref(pi, pj, w2, b2):
        hid = jax.nn.relu(pi[:, None, :] + pj[None, :, :])
        hid = jax.nn.relu(hid @ w2 + b2)
        return jnp.sum((hid * cv[None, :, None]).sum(1) * t)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(pi, pj, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(pi, pj, w2, b2)
    for name, a, b in zip(("dpi", "dpj", "dw2", "db2"), gk, gr):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max()) + 1.0
        assert err < 1e-4 * scale, (name, err, scale)


def test_odd_width_no_packing(rng):
    """Widths that don't divide 128 fall back to unpacked (P=1) layout."""
    n, h = 64, 24
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    nm = np.ones(n, np.float32)
    w2 = rng.normal(size=(h, h)).astype(np.float32) * 0.2
    b2 = rng.normal(size=(h,)).astype(np.float32)
    out = np.asarray(dense_message_rowsum(pi, pj, nm, w2, b2,
                                          block_i=32, block_jp=16))
    oracle = dense_message_rowsum_reference(pi, pj, nm, w2, b2)
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_dense_message_int8_tier(rng):
    """mid_dtype='int8' (fast-mode serving tier): quantized mid matmul must
    track the f32 oracle to int8 quantization error (~1% of row scale)."""
    n, h = 64, 32
    pi = rng.normal(size=(n, h)).astype(np.float32)
    pj = rng.normal(size=(n, h)).astype(np.float32)
    nm = np.ones(n, np.float32)
    w2 = (rng.normal(size=(h, h)) * 0.3).astype(np.float32)
    b2 = (rng.normal(size=(h,)) * 0.1).astype(np.float32)
    out = np.asarray(dense_message_rowsum(pi, pj, nm, w2, b2,
                                          block_i=32, block_jp=8,
                                          mid_dtype="int8"))
    oracle = dense_message_rowsum_reference(pi, pj, nm, w2, b2)
    scale = np.abs(oracle).max()
    assert np.abs(out - oracle).max() < 0.03 * scale
    # f32 default unchanged by the new plumbing
    out32 = np.asarray(dense_message_rowsum(pi, pj, nm, w2, b2,
                                            block_i=32, block_jp=8))
    np.testing.assert_allclose(out32, oracle, rtol=1e-5, atol=1e-4)


class TestNearFieldKernels:
    """Fused near-field kernels (r5): gathered O(N·k) message correction
    and antisymmetric pass reduction from pre-gathered flat inputs."""

    @pytest.fixture()
    def near_setup(self, rng):
        import jax.numpy as jnp

        n, k, h, e = 96, 12, 32, 16
        pi = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
        pj = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, size=(n, k)), jnp.int32)
        mask = jnp.asarray(rng.uniform(size=(n, k)) > 0.3, jnp.float32)
        rbf = jnp.asarray(rng.normal(size=(n * k, e)), jnp.float32) \
            * mask.reshape(-1, 1)
        w1e = jnp.asarray(rng.normal(size=(e, h)) * 0.3, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(h, h)) * 0.3, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
        return n, k, h, pi, pj, idx, mask, rbf, w1e, w2, b2

    def test_message_corr_matches_ref(self, near_setup):
        import jax.numpy as jnp

        from epnn_tpu.ops.pallas_kernels import (
            _near_msg_ref,
            near_message_corr,
        )

        n, k, h, pi, pj, idx, mask, rbf, w1e, w2, b2 = near_setup
        pjn = pj[idx.reshape(-1)]
        out = near_message_corr(pi, pjn, rbf, mask, w1e, w2, b2,
                                block_i=32)
        ref = _near_msg_ref(pi, pjn, rbf, mask, w1e, w2, b2, prec=None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_message_corr_grads(self, near_setup):
        import jax
        import jax.numpy as jnp

        from epnn_tpu.ops.pallas_kernels import (
            _near_msg_ref,
            near_message_corr,
        )

        n, k, h, pi, pj, idx, mask, rbf, w1e, w2, b2 = near_setup
        pjn = pj[idx.reshape(-1)]
        t = jnp.sin(jnp.arange(n * h, dtype=jnp.float32)).reshape(n, h)

        def loss_k(pi, pjn, rbf, w1e, w2, b2):
            return jnp.sum(near_message_corr(
                pi, pjn, rbf, mask, w1e, w2, b2, block_i=32) * t)

        def loss_r(pi, pjn, rbf, w1e, w2, b2):
            return jnp.sum(_near_msg_ref(
                pi, pjn, rbf, mask, w1e, w2, b2, prec=None) * t)

        gk = jax.grad(loss_k, argnums=tuple(range(6)))(
            pi, pjn, rbf, w1e, w2, b2)
        gr = jax.grad(loss_r, argnums=tuple(range(6)))(
            pi, pjn, rbf, w1e, w2, b2)
        for name, a, b in zip(("dpi", "dpjn", "drbf", "dw1e", "dw2",
                               "db2"), gk, gr):
            err = float(jnp.abs(a - b).max())
            scale = float(jnp.abs(b).max()) + 1.0
            assert err < 1e-4 * scale, (name, err, scale)

    def test_pass_rowsum_matches_ref(self, near_setup):
        import jax.numpy as jnp

        from epnn_tpu.ops.pallas_kernels import (
            _near_pass_ref,
            near_pass_rowsum,
        )

        n, k, h, pi, pj, idx, mask, rbf, w1e, w2, b2 = near_setup
        rs = jnp.concatenate([pi, pj], axis=-1)
        ppn = rs[idx.reshape(-1)]
        gh = 0.5 * mask
        out = near_pass_rowsum(rs, ppn, rbf, gh, w1e, w2, b2, block_i=32)
        ref = _near_pass_ref(rs, ppn, rbf, gh, w1e, w2, b2, prec=None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_pass_rowsum_antisymmetric(self, rng):
        """A symmetric neighbor structure must conserve: Σ_i out_i @ w_out
        is exactly the sum of gh_ij·(hn−ht) over both orderings of every
        pair, which cancel bitwise."""
        import jax.numpy as jnp

        from epnn_tpu.ops.pallas_kernels import near_pass_rowsum

        n, h, e = 64, 32, 16
        k = 4
        # ring topology: i's neighbors are i±1, i±2 (symmetric by design)
        base = np.arange(n)
        idx = np.stack([(base + 1) % n, (base - 1) % n,
                        (base + 2) % n, (base - 2) % n], axis=1)
        idx = jnp.asarray(idx, jnp.int32)
        # symmetric pair features: e_ij = f(|i-j| mod ring) same both ways
        rng2 = np.random.default_rng(7)
        pi = jnp.asarray(rng2.normal(size=(n, h)), jnp.float32)
        pj = jnp.asarray(rng2.normal(size=(n, h)), jnp.float32)
        rs = jnp.concatenate([pi, pj], axis=-1)
        ppn = rs[idx.reshape(-1)]
        ring_d = np.minimum((idx - base[:, None]) % n,
                            (base[:, None] - idx) % n)
        feat = rng2.normal(size=(3, e)).astype(np.float32)
        rbf = jnp.asarray(feat[np.minimum(ring_d, 2).reshape(-1) - 1],
                          jnp.float32)
        gh = jnp.asarray(0.5 / (1.0 + ring_d), jnp.float32)
        w1e = jnp.asarray(rng2.normal(size=(e, h)) * 0.3, jnp.float32)
        w2 = jnp.asarray(rng2.normal(size=(h, h)) * 0.3, jnp.float32)
        b2 = jnp.asarray(rng2.normal(size=(h,)), jnp.float32)
        out = near_pass_rowsum(rs, ppn, rbf, gh, w1e, w2, b2, block_i=16)
        w_out = jnp.asarray(rng2.normal(size=(h,)), jnp.float32)
        total = float(jnp.sum(out @ w_out))
        assert abs(total) < 1e-3

    def test_pass_rowsum_grads(self, near_setup):
        import jax
        import jax.numpy as jnp

        from epnn_tpu.ops.pallas_kernels import (
            _near_pass_ref,
            near_pass_rowsum,
        )

        n, k, h, pi, pj, idx, mask, rbf, w1e, w2, b2 = near_setup
        rs = jnp.concatenate([pi, pj], axis=-1)
        ppn = rs[idx.reshape(-1)]
        gh = 0.5 * mask
        t = jnp.cos(jnp.arange(n * h, dtype=jnp.float32)).reshape(n, h)

        def loss_k(rs, ppn, rbf, gh, w1e, w2, b2):
            return jnp.sum(near_pass_rowsum(
                rs, ppn, rbf, gh, w1e, w2, b2, block_i=32) * t)

        def loss_r(rs, ppn, rbf, gh, w1e, w2, b2):
            return jnp.sum(_near_pass_ref(
                rs, ppn, rbf, gh, w1e, w2, b2, prec=None) * t)

        gk = jax.grad(loss_k, argnums=tuple(range(7)))(
            rs, ppn, rbf, gh, w1e, w2, b2)
        gr = jax.grad(loss_r, argnums=tuple(range(7)))(
            rs, ppn, rbf, gh, w1e, w2, b2)
        for name, a, b in zip(("drs", "dppn", "drbf", "dgh", "dw1e",
                               "dw2", "db2"), gk, gr):
            err = float(jnp.abs(a - b).max())
            scale = float(jnp.abs(b).max()) + 1.0
            assert err < 1e-4 * scale, (name, err, scale)
