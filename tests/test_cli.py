"""CLI smoke tests (in-process, CPU)."""

import json
import os

import numpy as np
import pytest

from epnn_tpu.cli import build_parser, main


def test_parser_covers_all_commands():
    ap = build_parser()
    sub = next(a for a in ap._actions if hasattr(a, "choices") and a.choices)
    assert set(sub.choices) == {
        "train", "infer", "import-ckpt", "eval-pol", "horton2npy",
        "convert-qm9", "export", "bench",
    }


def test_convert_qm9_cli(tmp_path):
    src = tmp_path / "raw"
    dst = tmp_path / "conv"
    src.mkdir()
    (src / "a.xyz").write_text("1\ngdb 1 2 3\nC\t0.0\t0.0\t0.0\t-0.1\n")
    main(["convert-qm9", str(src), str(dst)])
    assert (dst / "a.xyz").read_text().startswith("1\n0 0\n")


def test_horton2npy_cli(tmp_path):
    d = tmp_path / "mtp"
    d.mkdir()
    (d / "x-mtp.txt").write_text(
        "number of atoms: 1\nnumber of fields: 9\nMultipoles\n---\n"
        "0 0 0 | -0.25 0.0\n"
    )
    main(["horton2npy", str(d)])
    np.testing.assert_allclose(np.load(d / "x-mtp.npy"), [-0.25])


def test_train_and_infer_cli(tmp_path, toy_molecules):
    data = tmp_path / "data"
    data.mkdir()
    for m in toy_molecules:
        lines = [str(m.natoms), f"{m.total_charge:g} 1"]
        for s, xyz in zip(m.symbols, m.xyz):
            lines.append(f"{s} {xyz[0]} {xyz[1]} {xyz[2]}")
        (data / f"{m.name}.xyz").write_text("\n".join(lines) + "\n")
        np.save(data / f"{m.name}.npy", m.labels)
    out = tmp_path / "run"
    main([
        "train", "--data", str(data) + "/", "--out", str(out),
        "--epochs", "2", "--batch-size", "4", "--rounds", "1",
        "--h-dim", "8", "--e-dim", "8", "--msg-dim", "8", "--layers", "8",
    ])
    assert (out / "best" / "params.msgpack").exists()

    preds = tmp_path / "preds"
    main(["infer", "--checkpoint", str(out / "best"), str(data), "--out",
          str(preds)])
    files = sorted(os.listdir(preds))
    assert len(files) == len(toy_molecules)
    q = np.load(preds / files[0])
    assert np.isfinite(q).all()

    # --no-collapse-round1 pins the uncollapsed summation order; outputs
    # must agree with the default (auto-collapse) run to fp noise
    preds_nc = tmp_path / "preds_nc"
    main(["infer", "--checkpoint", str(out / "best"), str(data), "--out",
          str(preds_nc), "--no-collapse-round1"])
    q_nc = np.load(preds_nc / files[0])
    np.testing.assert_allclose(q_nc, q, atol=1e-5)

    # fine-tune from the run's best checkpoint through the fused big-graph
    # path (--dense-max-atoms below the bucket width forces the dispatch)
    out2 = tmp_path / "run2"
    main([
        "train", "--data", str(data) + "/", "--out", str(out2),
        "--epochs", "1", "--batch-size", "4",
        "--init-from", str(out / "best"), "--dense-max-atoms", "4",
    ])
    assert (out2 / "best" / "params.msgpack").exists()


def test_cli_finetune_80atom_fragment(tmp_path, protein_dir):
    """CLI fine-tune of the imported decay model on the reference's labeled
    80-atom fragment (protein.tar.gz:6QLP_184_186.*), routed through the
    fused path: loss must decrease with bounded (no dense pair) memory."""
    import shutil

    from conftest import REFERENCE_DIR

    main(["import-ckpt",
          os.path.join(REFERENCE_DIR, "models", "decay_model_weights"),
          "--out", str(tmp_path / "decay")])
    data = tmp_path / "frag"
    data.mkdir()
    # two copies so the trainer's 80/20 split has both a train and a val mol
    for stem in ("6QLP_184_186", "frag_copy"):
        for ext in (".xyz", ".npy"):
            shutil.copy(os.path.join(protein_dir, "6QLP_184_186" + ext),
                        data / (stem + ext))
    out = tmp_path / "ft"
    main([
        "train", "--data", str(data) + "/", "--out", str(out),
        "--epochs", "3", "--batch-size", "1", "--lr", "1e-4",
        "--init-from", str(tmp_path / "decay"), "--dense-max-atoms", "64",
    ])
    rows = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert rows[-1]["train_loss"] < rows[0]["train_loss"], rows
    # fine-tuning from trained weights: starts at a low loss already
    assert rows[0]["train_loss"] < 1e-2


def test_infer_far_budget_flag_parses():
    a = build_parser().parse_args(
        ["infer", "--checkpoint", "c", "p", "--far-budget", "1e-4"])
    assert a.far_budget == pytest.approx(1e-4)
    a2 = build_parser().parse_args(["infer", "--checkpoint", "c", "p"])
    assert a2.far_budget is None


def test_cli_never_enables_compile_cache_on_cpu(tmp_path):
    """cli.main() must NOT turn on the persistent compile cache when the
    EFFECTIVE platform is CPU — in-process callers (this suite) flip the
    platform via jax.config without setting EPNN_PLATFORM, and a cache
    enabled mid-suite poisons every later compile: the NEXT suite run
    segfaults at the first AOT cache LOAD (the documented XLA:CPU
    feature-mismatch crash; reproduced 2026-08-19 in test_train via
    entries written by an earlier in-process test_cli run)."""
    import jax

    src = tmp_path / "raw"
    src.mkdir()
    (src / "a.xyz").write_text("1\ngdb 1 2 3\nC\t0.0\t0.0\t0.0\t-0.1\n")
    main(["convert-qm9", str(src), str(tmp_path / "conv")])
    assert jax.config.jax_compilation_cache_dir is None
