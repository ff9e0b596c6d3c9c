"""Model property tests: conservation, masking, equivariance, param counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.elements import TRAIN_TABLE
from epnn_tpu.featurize import rbf_edges
from epnn_tpu.models import EPNN, EPNNConfig, PRESETS, count_params, init_params


def make_inputs(rng, cfg, b=2, n=12, n_real=None):
    x = rng.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
    xyz = rng.uniform(-3, 3, size=(b, n, 3)).astype(np.float32)
    mask = np.ones((b, n), np.float32)
    if n_real is not None:
        mask[:, n_real:] = 0.0
        x[:, n_real:] = 0.0
        xyz[:, n_real:] = 0.0
    q_total = rng.integers(-2, 3, size=(b,)).astype(np.float32)
    nreal = mask.sum(1)
    q0 = (q_total[:, None] / nreal[:, None]) * mask
    e = np.asarray(rbf_edges(xyz, mask, e_dim=cfg.e_dim))
    return x, q0, e, mask, q_total


class TestConservation:
    @pytest.mark.parametrize("preset", ["model", "model2", "decay_model"])
    def test_total_charge_exact(self, rng, preset):
        cfg = PRESETS[preset]
        params = init_params(cfg, jax.random.key(0))
        x, q0, e, mask, q_total = make_inputs(rng, cfg, b=3, n=10)
        model = EPNN(cfg)
        kwargs = {}
        if cfg.pass_weighting == "soft_envelope":
            kwargs["soft_env"] = np.ones_like(mask)[:, :, None] * mask[:, None, :]
        q = np.asarray(model.apply(params, x, q0, e, mask, **kwargs))
        np.testing.assert_allclose(q.sum(axis=1), q_total, atol=5e-6)

    def test_conservation_with_padding(self, rng):
        cfg = PRESETS["model"]
        params = init_params(cfg, jax.random.key(1))
        x, q0, e, mask, q_total = make_inputs(rng, cfg, b=2, n=16, n_real=9)
        q = np.asarray(EPNN(cfg).apply(params, x, q0, e, mask))
        np.testing.assert_allclose(q.sum(axis=1), q_total, atol=5e-6)
        # padded atoms end exactly at their initial (zero) charge
        assert np.all(q[:, 9:] == 0.0)


class TestMasking:
    def test_padding_invariance(self, rng):
        """With mask_messages=True, growing the pad width must not change
        real-atom outputs (the reference fails this — SURVEY §8 Q10)."""
        cfg = EPNNConfig(mask_messages=True)
        params = init_params(cfg, jax.random.key(2))
        model = EPNN(cfg)

        x, q0, e, mask, _ = make_inputs(rng, cfg, b=1, n=8)
        q_small = np.asarray(model.apply(params, x, q0, e, mask))

        pad = 5
        xp = np.pad(x, ((0, 0), (0, pad), (0, 0)))
        q0p = np.pad(q0, ((0, 0), (0, pad)))
        ep = np.pad(e, ((0, 0), (0, pad), (0, pad), (0, 0)))
        maskp = np.pad(mask, ((0, 0), (0, pad)))
        q_big = np.asarray(model.apply(params, xp, q0p, ep, maskp))

        np.testing.assert_allclose(q_big[:, :8], q_small, atol=1e-6)
        assert np.all(q_big[:, 8:] == 0.0)

    def test_reference_mode_depends_on_padding(self, rng):
        """Sanity-check that compat mode really reproduces the quirk."""
        cfg = EPNNConfig(mask_messages=False)
        params = init_params(cfg, jax.random.key(2))
        model = EPNN(cfg)
        x, q0, e, mask, _ = make_inputs(rng, cfg, b=1, n=8)
        q_small = np.asarray(model.apply(params, x, q0, e, mask))
        pad = 5
        xp = np.pad(x, ((0, 0), (0, pad), (0, 0)))
        q0p = np.pad(q0, ((0, 0), (0, pad)))
        ep = np.pad(e, ((0, 0), (0, pad), (0, pad), (0, 0)))
        maskp = np.pad(mask, ((0, 0), (0, pad)))
        q_big = np.asarray(model.apply(params, xp, q0p, ep, maskp))
        assert not np.allclose(q_big[:, :8], q_small, atol=1e-6)


class TestEquivariance:
    def test_permutation(self, rng):
        cfg = EPNNConfig()
        params = init_params(cfg, jax.random.key(3))
        model = EPNN(cfg)
        x, q0, e, mask, _ = make_inputs(rng, cfg, b=1, n=9)
        q = np.asarray(model.apply(params, x, q0, e, mask))
        perm = rng.permutation(9)
        qp = np.asarray(
            model.apply(
                params,
                x[:, perm],
                q0[:, perm],
                e[:, perm][:, :, perm],
                mask[:, perm],
            )
        )
        np.testing.assert_allclose(qp, q[:, perm], atol=1e-5)

    def test_rigid_motion_invariance(self, rng, toy_molecules):
        """Charges depend on geometry only through distances; rotating +
        translating the molecule must not change them."""
        from scipy.spatial.transform import Rotation

        cfg = EPNNConfig()
        params = init_params(cfg, jax.random.key(4))
        model = EPNN(cfg)
        batch = pad_molecules(toy_molecules[:1], TRAIN_TABLE, pad_to=8)
        e1 = np.asarray(rbf_edges(batch.xyz, batch.node_mask))
        q1 = np.asarray(model.apply(params, batch.x, batch.q0, e1, batch.node_mask))
        rot = Rotation.random(random_state=1).as_matrix().astype(np.float32)
        xyz2 = batch.xyz @ rot.T + np.float32([1.0, -2.0, 0.5])
        e2 = np.asarray(rbf_edges(xyz2, batch.node_mask))
        q2 = np.asarray(model.apply(params, batch.x, batch.q0, e2, batch.node_mask))
        np.testing.assert_allclose(q1, q2, atol=1e-5)


class TestParamCounts:
    """Param counts must match the shipped checkpoints (SURVEY §2.5)."""

    @pytest.mark.parametrize(
        "preset,expected",
        [("model", 74_677), ("model2", 46_515), ("decay_model", 74_037)],
    )
    def test_counts(self, preset, expected):
        cfg = PRESETS[preset]
        params = init_params(cfg, jax.random.key(0))
        assert count_params(params) == expected


def test_shipped_json_configs_match_presets():
    """configs/*.json are the on-disk form of the presets; they must never
    drift (a stale mask_messages here was the round-1 footgun)."""
    import dataclasses
    import json
    import os

    from epnn_tpu.models import EPNNConfig

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    for name, preset in PRESETS.items():
        path = os.path.join(cfg_dir, f"{name}.json")
        assert os.path.exists(path), path
        with open(path) as f:
            d = json.load(f)
        d["mlp_hidden"] = tuple(d["mlp_hidden"])
        assert EPNNConfig(**d) == preset, name


class TestDtypePolicy:
    def test_bfloat16_forward_runs_and_conserves(self, rng):
        cfg = EPNNConfig(compute_dtype="bfloat16", highest_precision=False)
        params = init_params(cfg, jax.random.key(5))
        x, q0, e, mask, q_total = make_inputs(rng, cfg, b=2, n=8)
        q = np.asarray(EPNN(cfg).apply(params, x, q0, e, mask))
        assert q.dtype == np.float32 or q.dtype == jnp.bfloat16
        # antisymmetry cancels exactly even in bf16 — totals stay integral
        np.testing.assert_allclose(
            np.asarray(q, np.float32).sum(1), q_total, atol=2e-2
        )
