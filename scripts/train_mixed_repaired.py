"""Training run 2: mixed set with the 28 charged species' labels repaired.

The curated anions/cations inside mixed/ carry labels under
`<stem>_mbis-mtp.npy` while their geometries are `<stem>dz.xyz` (SURVEY §9),
so every prior training — the reference's included — silently dropped them.
This run attaches those labels and retrains; scripts/eval_curated.py
measures the effect on charged-species MAE.
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EPNN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EPNN_PLATFORM"])

import numpy as np

from epnn_tpu.data import load_directory
from epnn_tpu.models import EPNNConfig
from epnn_tpu.train import TrainConfig, train

DATA = os.environ.get("EPNN_DATA", "/root/repo/.cache/refdata/mixed")
OUT = os.environ.get("EPNN_OUT", "/root/repo/runs/mixed_repaired_b16")

mols = load_directory(DATA)
repaired = 0
for m in mols:
    if m.labels is None and m.name.endswith("dz"):
        cand = os.path.join(DATA, m.name[:-2] + "_mbis-mtp.npy")
        if os.path.exists(cand):
            lab = np.asarray(np.load(cand), np.float32)
            if len(lab) == m.natoms:
                m.labels = lab
                repaired += 1
mols = [m for m in mols if m.labels is not None]
print(f"{len(mols)} labeled molecules ({repaired} repaired)", flush=True)

cfg = EPNNConfig(n_elems=10, T=5)
epochs = int(os.environ.get("EPNN_EPOCHS", "600"))
bs = int(os.environ.get("EPNN_BS", "16"))
steps_per_epoch = -(-len(mols) * 4 // (5 * bs))
tc = TrainConfig(
    learning_rate=float(os.environ.get("EPNN_LR", "2e-3")),
    grad_clip_norm=float(os.environ.get("EPNN_CLIP", "1.0")),
    lr_schedule="cosine",
    warmup_steps=200,
    total_steps=epochs * steps_per_epoch,
    epochs=epochs,
    batch_size=bs,
    loss="masked_mse",
    seed=0,
    checkpoint_dir=OUT,
    log_path=os.path.join(OUT, "metrics.jsonl"),
    resume=os.environ.get("EPNN_RESUME", "1") == "1",
)
os.makedirs(OUT, exist_ok=True)
res = train(mols, cfg, tc)
print("best val masked MAE:", res.best_val_masked_mae)
