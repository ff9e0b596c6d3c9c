"""Evaluate a checkpoint on the curated charged species (anions/cations).

End-to-end exercise of the HORTON label pipeline: the curated `.xyz` files
carry a molecule *name* on line 2 (not a charge), so the net charge is
injected per directory (-1 anions / +1 cations) and MBIS labels are parsed
from the `*-mtp.txt` HORTON outputs.

Data quirk found here: these species also appear in `mixed/` but with label
files named `<stem>_mbis-mtp.npy` while the geometry is `<stem>dz.xyz` — the
stem mismatch is why 28 mixed geometries load label-less (SURVEY §9).
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EPNN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EPNN_PLATFORM"])

import numpy as np

from epnn_tpu.data.horton import parse_mtp_file
from epnn_tpu.data.xyz import parse_xyz_text
from epnn_tpu.infer import Predictor

BASE = os.environ.get("EPNN_CURATED", "/root/repo/.cache/refdata/curated")
CKPT = os.environ.get("EPNN_CKPT", "/root/repo/trained/mixed_b16")


def load_set(xyz_dir, mtp_dir, q):
    mols = []
    for f in sorted(os.listdir(os.path.join(BASE, xyz_dir))):
        if not f.endswith(".xyz"):
            continue
        lines = open(os.path.join(BASE, xyz_dir, f)).read().splitlines()
        fixed = "\n".join([lines[0], f"{q} 1"] + lines[2:])
        mol = parse_xyz_text(fixed, name=f[:-4])
        stem = f[: -len("dz.xyz")]
        mtp = os.path.join(BASE, mtp_dir, stem + "_mbis-mtp.txt")
        if os.path.exists(mtp):
            lab = parse_mtp_file(mtp)
            if len(lab) == mol.natoms:
                mol.labels = lab.astype(np.float32)
        mols.append(mol)
    return mols


def main():
    anions = load_set("opt_chargedn", "optn_outputs_h", -1)
    cations = load_set("opt_chargedp", "optp_outputs_h", +1)
    pred = Predictor.from_checkpoint(CKPT)
    for name, mset in (("anions", anions), ("cations", cations)):
        labeled = [m for m in mset if m.labels is not None]
        qs = pred.predict_molecules(labeled)
        errs = np.concatenate([np.abs(q - m.labels) for m, q in zip(labeled, qs)])
        cons = max(abs(q.sum() - m.total_charge) for m, q in zip(labeled, qs))
        print(f"{name}: {len(labeled)} labeled of {len(mset)} | "
              f"MAE {errs.mean():.5f} e | max {errs.max():.4f} e | "
              f"worst conservation {cons:.2e} e")


if __name__ == "__main__":
    main()
