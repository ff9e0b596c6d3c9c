"""Data-layer tests: xyz parsing, padding/bucketing, tooling converters."""

import os

import numpy as np
import pytest

from epnn_tpu.data import (
    bucket_molecules,
    load_directory,
    load_molecule,
    minibatches,
    pad_molecules,
    parse_xyz_text,
    train_val_split,
)
from epnn_tpu.data.horton import parse_mtp_text
from epnn_tpu.data.qm9 import convert_text
from epnn_tpu.elements import INFER_TABLE, TRAIN_TABLE


SAMPLE_XYZ = """3
-1 1 some comment
O 0.0 0.0 0.0
H 0.95 0.0 0.0 0.123
H -0.24 0.92 0.0
"""


class TestXYZ:
    def test_parse_basic(self):
        mol = parse_xyz_text(SAMPLE_XYZ, name="water_anion")
        assert mol.natoms == 3
        assert mol.total_charge == -1.0
        assert mol.symbols == ["O", "H", "H"]
        assert mol.xyz.shape == (3, 3)
        # extra per-atom tokens (Mulliken column) ignored
        np.testing.assert_allclose(mol.xyz[1], [0.95, 0, 0])

    def test_header_count_ignored(self):
        # stale header count: atoms inferred from lines, like the reference
        text = "99\n0 1\nH 0 0 0\nH 1 0 0\n"
        assert parse_xyz_text(text).natoms == 2

    def test_labels_and_splits(self, tmp_path):
        p = tmp_path / "m.xyz"
        p.write_text(SAMPLE_XYZ)
        np.save(tmp_path / "m.npy", np.array([-0.8, -0.1, -0.1]))
        np.save(tmp_path / "msplits.npy", np.array(2))
        mol = load_molecule(str(p))
        np.testing.assert_allclose(mol.labels, [-0.8, -0.1, -0.1])
        assert mol.split == 2

    def test_label_length_mismatch_raises(self, tmp_path):
        p = tmp_path / "m.xyz"
        p.write_text(SAMPLE_XYZ)
        np.save(tmp_path / "m.npy", np.array([1.0, 2.0]))
        with pytest.raises(Exception):
            load_molecule(str(p))

    def test_raw_qm9_rejected_with_hint(self):
        text = "5\ngdb 100 7.1 4.3\nC 0 0 0\n"
        with pytest.raises(Exception, match="qm9"):
            parse_xyz_text(text)


class TestPadding:
    def test_pad_molecules(self, toy_molecules):
        batch = pad_molecules(toy_molecules, TRAIN_TABLE)
        assert batch.padded_atoms == 16  # max natoms 11 → bucket multiple 8
        assert batch.batch_size == 4
        # initial charges sum to Q on real atoms
        np.testing.assert_allclose(
            (batch.q0 * batch.node_mask).sum(1), batch.total_q, atol=1e-5
        )
        # feature slot 0 is the raw atomic number
        assert batch.x[0, 0, 0] == 8.0  # O
        assert np.all(batch.x[0, 3:] == 0.0)  # padding rows zero

    def test_bucketing(self, toy_molecules):
        buckets = bucket_molecules(toy_molecules, TRAIN_TABLE)
        assert set(buckets) == {8, 16}
        assert buckets[8].batch_size == 3
        assert buckets[16].batch_size == 1

    def test_minibatches_cover_all(self, toy_molecules, rng):
        batch = pad_molecules(toy_molecules, TRAIN_TABLE)
        seen = []
        for mb, n_real in minibatches(batch, 3, rng=rng):
            assert mb.batch_size == 3
            seen.extend(mb.names[:n_real])
        assert sorted(seen) == sorted(batch.names)

    def test_split_matches_sklearn_reference(self):
        tr, va = train_val_split(10, 0.2, seed=42)
        assert len(tr) == 8 and len(va) == 2
        assert set(tr) | set(va) == set(range(10))


class TestTooling:
    def test_horton_parse(self):
        text = (
            "number of atoms: 2\nnumber of fields: 9\nMultipoles\n---\n"
            "0 0 0 | -0.5 0.1 0.2\n"
            "1 1 1 | 0.5 0.0 0.0\n"
        )
        charges = parse_mtp_text(text)
        np.testing.assert_allclose(charges, [-0.5, 0.5])

    def test_qm9_convert(self):
        raw = (
            "2\ngdb 1 157.7 157.7\n"
            "C\t0.0\t0.0\t0.0\t-0.5\n"
            "O\t1.2*^-1\t0.0\t0.0\t0.5\n"
        )
        out = convert_text(raw)
        mol = parse_xyz_text(out)
        assert mol.total_charge == 0.0
        np.testing.assert_allclose(mol.xyz[1, 0], 0.12, atol=1e-6)


@pytest.mark.usefixtures("mixed_dir")
class TestReferenceData:
    def test_load_mixed(self, mixed_dir):
        mols = load_directory(mixed_dir, require_labels=False)
        assert len(mols) == 4379
        largest = max(m.natoms for m in mols)
        assert largest == 41
        labeled = [m for m in mols if m.labels is not None]
        # 28 geometries ship without labels; the golden artifacts were made
        # from the 4,351 labeled ones (3,480 train + 871 val)
        assert len(labeled) == 4351
        with_split = [m for m in mols if m.split is not None]
        assert len(with_split) == 2979  # the SSI dimers

    def test_protein_parses(self, protein_dir):
        mol = load_molecule(os.path.join(protein_dir, "6qlp_capped.xyz"))
        assert mol.natoms == 2220
        assert mol.total_charge == 2.0


class TestNativeParser:
    def test_matches_python_parser(self, tmp_path):
        from epnn_tpu.data import native

        if not native.available():
            pytest.skip("native library not built (make -C native)")
        p = tmp_path / "m.xyz"
        p.write_text(SAMPLE_XYZ)
        mol_n = native.parse_xyz_file(str(p))
        mol_p = parse_xyz_text(SAMPLE_XYZ, name="m")
        assert mol_n.symbols == mol_p.symbols
        assert mol_n.total_charge == mol_p.total_charge
        np.testing.assert_array_equal(mol_n.xyz, mol_p.xyz)

    def test_native_bulk_matches(self, mixed_dir):
        from epnn_tpu.data import native
        from epnn_tpu.data.xyz import load_directory

        if not native.available():
            pytest.skip("native library not built (make -C native)")
        mols_native = load_directory(mixed_dir, use_native=True)[:100]
        mols_py = load_directory(mixed_dir, use_native=False)[:100]
        for a, b in zip(mols_native, mols_py):
            assert a.name == b.name and a.symbols == b.symbols
            assert a.total_charge == b.total_charge
            np.testing.assert_array_equal(a.xyz, b.xyz)


class TestCompatShim:
    """epnn_tpu.compat.gen_padded_init_state vs the reference loader."""

    def test_matches_reference_loader(self, tmp_path, toy_molecules):
        import sys

        from conftest import REFERENCE_DIR, reference_available

        if not reference_available():
            pytest.skip("reference repo not mounted")
        d = tmp_path / "mols"
        d.mkdir()
        for m in toy_molecules:
            lines = [str(m.natoms), f"{m.total_charge:g} 1"]
            for s, xyz in zip(m.symbols, m.xyz):
                lines.append(f"{s} {float(xyz[0])!r} {float(xyz[1])!r} "
                             f"{float(xyz[2])!r}")
            (d / f"{m.name}.xyz").write_text("\n".join(lines) + "\n")
            np.save(d / f"{m.name}.npy", m.labels)

        from epnn_tpu.compat import gen_padded_init_state

        ours = gen_padded_init_state(str(d) + "/", h_dim=8, e_dim=16)

        sys.path.insert(0, REFERENCE_DIR)
        try:
            import charge_gn
        except Exception as exc:
            pytest.skip(f"cannot import reference: {exc}")
        finally:
            sys.path.pop(0)
        theirs = charge_gn.gen_padded_init_state(str(d) + "/", 8, 16)

        labels = ["x", "h", "q", "e", "Q", "y", "mask"]
        our_names = [str(n) for n in ours[7]]
        their_names = [str(n) for n in theirs[7]]
        order = [their_names.index(n) for n in our_names]
        for lab, a, b in zip(labels, ours[:7], theirs[:7]):
            b = np.asarray(b)
            if b.ndim >= 1 and b.shape[0] == len(order):
                b = b[order]
            np.testing.assert_allclose(
                np.asarray(a), b, atol=1e-5, err_msg=lab
            )
