"""Polarization-response analysis tests."""

import numpy as np
import pytest

from epnn_tpu.analysis import polarization_response, split_dimer
from epnn_tpu.data.xyz import Molecule
from epnn_tpu.infer import Predictor
from epnn_tpu.models import EPNNConfig, init_params


@pytest.fixture(scope="module")
def tiny_predictor():
    import jax

    cfg = EPNNConfig(h_dim=16, e_dim=16, msg_dim=8, mlp_hidden=(8, 8), T=2)
    params = init_params(cfg, jax.random.key(0))
    return Predictor(params=params, cfg=cfg)


@pytest.fixture()
def dimer():
    g = np.random.default_rng(5)
    xyz = np.concatenate(
        [g.uniform(-1.5, 1.5, (5, 3)), g.uniform(-1.5, 1.5, (4, 3)) + 2.0]
    ).astype(np.float32)
    return Molecule(name="dim", symbols=["C", "O", "H", "H", "H", "N", "H", "H", "H"],
                    xyz=xyz, total_charge=-1.0, split=5)


def test_split_dimer(dimer):
    a, b = split_dimer(dimer, charges=(-1.0, 0.0))
    assert a.natoms == 5 and b.natoms == 4
    assert a.total_charge == -1.0 and b.total_charge == 0.0
    np.testing.assert_array_equal(np.vstack([a.xyz, b.xyz]), dimer.xyz)


def test_split_requires_index():
    m = Molecule(name="x", symbols=["H", "H"], xyz=np.zeros((2, 3), np.float32),
                 total_charge=0.0)
    with pytest.raises(ValueError, match="split"):
        split_dimer(m)


def test_split_requires_charges(dimer):
    """Monomer net charges are physical inputs — guessing them produces
    meaningless polarization numbers, so omitting them is an error."""
    with pytest.raises(ValueError, match="charges"):
        split_dimer(dimer)


def test_duplicate_names_get_distinct_predictions(tiny_predictor):
    g = np.random.default_rng(11)
    mk = lambda q: Molecule(
        name="same", symbols=["C", "H", "H"],
        xyz=g.uniform(-1, 1, (3, 3)).astype(np.float32), total_charge=q)
    a, b = mk(0.0), mk(1.0)
    qa, qb = tiny_predictor.predict_molecules([a, b])
    assert abs(qa.sum() - 0.0) < 1e-4
    assert abs(qb.sum() - 1.0) < 1e-4


def test_polarization_response(tiny_predictor, dimer):
    label = np.zeros(dimer.natoms, np.float32)
    res = polarization_response(
        tiny_predictor, dimer, monomer_charges=(-1.0, 0.0),
        label_polarization=label,
    )
    assert res.pred_polarization.shape == (9,)
    # dimer and monomer totals each conserve, so the response sums to ~0
    assert abs(res.pred_polarization.sum()) < 1e-3
    assert res.mae is not None
    assert "polarization response" in res.summary()


def test_far_monomers_conserve_separately(tiny_predictor):
    """Monomers beyond the cutoff cannot exchange electrons (the transfer
    gate is zero across the gap), so each monomer's polarization must sum to
    zero — though per-atom responses are nonzero because GNN messages are
    global (features flow, charge does not)."""
    g = np.random.default_rng(6)
    xyz = np.concatenate(
        [g.uniform(-1, 1, (4, 3)), g.uniform(-1, 1, (3, 3)) + 50.0]
    ).astype(np.float32)
    far = Molecule(name="far", symbols=["C", "H", "H", "H", "O", "H", "H"],
                   xyz=xyz, total_charge=0.0, split=4)
    res = polarization_response(tiny_predictor, far, monomer_charges=(0.0, 0.0))
    pol = res.pred_polarization
    assert abs(pol[:4].sum()) < 1e-4   # monomer A total conserved
    assert abs(pol[4:].sum()) < 1e-4   # monomer B total conserved


def test_predictor_dispatch_boundary(tiny_predictor, rng):
    """Dense vs blocked dispatch must agree at the boundary."""
    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.elements import table_for_n_elems

    g = np.random.default_rng(9)
    n = 12
    mol = Molecule(name="d", symbols=["C"] * n,
                   xyz=g.uniform(-3, 3, (n, 3)).astype(np.float32),
                   total_charge=1.0)
    table = table_for_n_elems(tiny_predictor.cfg.n_elems)
    batch = pad_molecules([mol], table, pad_to=16)
    tiny_predictor.force_mode = "dense"
    qd = tiny_predictor.predict_batch(batch)
    tiny_predictor.force_mode = "blocked"
    qb = tiny_predictor.predict_batch(batch)
    tiny_predictor.force_mode = None
    np.testing.assert_allclose(qd, qb, atol=1e-4)
    np.testing.assert_allclose(qd.sum(), 1.0, atol=1e-5)
