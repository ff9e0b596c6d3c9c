"""AOT serving export (jax.export StableHLO artifacts).

Agreement contract (measured while building this): the StableHLO
serialize→deserialize round-trip is BITWISE (same program in, same
program out), but the exported program is a fresh jit CLOSURE over the
weights — inlining the forward inside that wrapper re-fuses the same
math, which moves fp association by ~1e-6 e on the blocked path (the
dense path happens to re-lower identically, so it IS bitwise).  Tests
pin dense at array_equal and the blocked/md paths at a 5e-6 tolerance;
charge conservation (architectural antisymmetry) holds in every
lowering.  Covers all three calling conventions (dense / blocked / md),
the manifest contract, shape validation, and the CLI subcommand.
"""

import json
import os

import numpy as np
import pytest

from epnn_tpu.data.dataset import pad_molecules
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.infer import Predictor
from epnn_tpu.io.export_serving import (ARTIFACT_FILE, MANIFEST_FILE,
                                        export_predictor, load_serving)
from epnn_tpu.models import EPNNConfig, init_params


def _make_pred(seed=0, **kw):
    import jax

    cfg = EPNNConfig(T=2)
    params = init_params(cfg, jax.random.key(seed))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.3 if a.ndim == 1 else a, params)
    return Predictor(params=params, cfg=cfg, **kw)


def _batch(toy_molecules, cfg, pad_to=16):
    return pad_molecules(toy_molecules, table_for_n_elems(cfg.n_elems),
                         pad_to=pad_to)


def test_export_dense_roundtrip(tmp_path, toy_molecules):
    pred = _make_pred()
    batch = _batch(toy_molecules, pred.cfg)
    manifest = export_predictor(pred, batch, str(tmp_path))
    assert manifest["mode"] == "dense"
    assert os.path.exists(tmp_path / ARTIFACT_FILE)
    assert os.path.exists(tmp_path / MANIFEST_FILE)

    art = load_serving(str(tmp_path))
    q_art = art(batch.x, batch.q0, batch.xyz, batch.node_mask)
    q_live = pred.predict_batch(batch)
    np.testing.assert_array_equal(q_art, q_live)
    # manifest is valid standalone JSON carrying the full model config
    with open(tmp_path / MANIFEST_FILE) as f:
        m = json.load(f)
    assert m["config"]["T"] == 2
    assert m["padded_atoms"] == batch.padded_atoms
    assert m["inputs"][0]["shape"] == [batch.batch_size,
                                       batch.padded_atoms,
                                       pred.cfg.n_elems]


def test_export_blocked_roundtrip(tmp_path, toy_molecules):
    pred = _make_pred(force_mode="blocked")
    batch = _batch(toy_molecules, pred.cfg)
    manifest = export_predictor(pred, batch, str(tmp_path),
                                mode="blocked")
    assert manifest["neighbor_k"] >= 1
    art = load_serving(str(tmp_path))
    q_art = art(batch.x, batch.q0, batch.xyz, batch.node_mask)
    q_live = pred.predict_batch(batch)
    assert np.abs(q_art - q_live).max() < 5e-6  # re-lowering association
    # conservation survives the round-trip
    sums = (q_art * batch.node_mask).sum(axis=1)
    np.testing.assert_allclose(sums, batch.total_q, atol=5e-5)


def test_export_md_mode(tmp_path, toy_molecules):
    """md-mode artifacts take (idx, nbr_mask) and re-gather pair distances
    from the CURRENT coordinates in-graph — moving atoms within the skin
    changes the charges without a re-export or neighbor rebuild."""
    pred = _make_pred(force_mode="blocked", reuse_neighbors=True,
                      neighbor_skin=0.4)
    batch = _batch(toy_molecules, pred.cfg)
    manifest = export_predictor(pred, batch, str(tmp_path), mode="md")
    assert manifest["neighbor_skin"] == pytest.approx(0.4)
    art = load_serving(str(tmp_path))

    # the live Predictor's own skin tables (cached — predict_batch below
    # reuses the identical arrays, so agreement must be bitwise)
    idx, nbr_mask = (np.asarray(a) for a in pred._neighbors_skin(batch))
    assert idx.shape[-1] == manifest["neighbor_k"]
    q_art = art(batch.x, batch.q0, batch.xyz, batch.node_mask,
                idx, nbr_mask)
    q_live = pred.predict_batch(batch)
    assert np.abs(q_art - q_live).max() < 5e-6

    # perturb coordinates within the skin: same tables stay valid, the
    # artifact tracks the live skin-mode Predictor
    batch.xyz[:, :3] += 0.05
    q_art2 = art(batch.x, batch.q0, batch.xyz, batch.node_mask,
                 idx, nbr_mask)
    q_live2 = pred.predict_batch(batch)
    assert np.abs(q_art2 - q_live2).max() < 5e-6
    assert np.abs(q_art2 - q_art).max() > 0  # geometry actually moved

    # md artifacts refuse calls without tables; others refuse tables
    with pytest.raises(ValueError, match="neighbor tables"):
        art(batch.x, batch.q0, batch.xyz, batch.node_mask)


def test_export_shape_validation(tmp_path, toy_molecules):
    pred = _make_pred()
    batch = _batch(toy_molecules, pred.cfg)
    export_predictor(pred, batch, str(tmp_path))
    art = load_serving(str(tmp_path))
    with pytest.raises(ValueError, match="static serving shape"):
        art(batch.x[:, :8], batch.q0[:, :8], batch.xyz[:, :8],
            batch.node_mask[:, :8])
    # bad manifest format is rejected loudly
    with open(tmp_path / MANIFEST_FILE) as f:
        m = json.load(f)
    m["format"] = "something/else"
    with open(tmp_path / MANIFEST_FILE, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="not an epnn_tpu serving"):
        load_serving(str(tmp_path))


def test_export_bakes_far_cluster(tmp_path, toy_molecules):
    """A far_cluster Predictor exports the clustered tier — the artifact
    matches the clustered live forward, not the exact one."""
    pred = _make_pred(force_mode="blocked", far_cluster=4)
    batch = _batch(toy_molecules, pred.cfg)
    manifest = export_predictor(pred, batch, str(tmp_path),
                                mode="blocked")
    assert manifest["far_cluster"] == 4
    art = load_serving(str(tmp_path))
    q_art = art(batch.x, batch.q0, batch.xyz, batch.node_mask)
    q_clustered = pred.predict_batch(batch)
    assert np.abs(q_art - q_clustered).max() < 5e-6
    # ... and differs from the exact tier (the approximation is baked)
    exact = Predictor(params=pred.params, cfg=pred.cfg,
                      force_mode="blocked")
    assert np.abs(q_art - exact.predict_batch(batch)).max() > 1e-5


def test_export_cli(tmp_path, toy_molecules):
    """The export subcommand writes a loadable artifact from a checkpoint."""
    from epnn_tpu.cli import main
    from epnn_tpu.io import save_params

    pred = _make_pred()
    ckpt = tmp_path / "ckpt"
    save_params(str(ckpt), pred.params, pred.cfg)
    xyz_path = tmp_path / "toy.xyz"
    mol = toy_molecules[0]
    lines = [f"{mol.natoms}", f"{mol.total_charge:.1f} 1"]
    for s, r in zip(mol.symbols, mol.xyz):
        lines.append(f"{s} {r[0]:.6f} {r[1]:.6f} {r[2]:.6f}")
    xyz_path.write_text("\n".join(lines) + "\n")

    out = tmp_path / "artifact"
    main(["export", "--checkpoint", str(ckpt), str(xyz_path),
          "--out", str(out), "--pad-to", "8"])
    art = load_serving(str(out))
    assert art.manifest["padded_atoms"] == 8
    batch = pad_molecules([mol], table_for_n_elems(pred.cfg.n_elems),
                          pad_to=8)
    q = art(batch.x, batch.q0, batch.xyz, batch.node_mask)
    # CLI applies the parity precision policy; check physics, not bits
    assert abs((q * batch.node_mask).sum() - mol.total_charge) < 5e-5
