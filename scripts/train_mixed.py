"""Full training run on the mixed dataset (reference experiment reproduction).

Reference setup (charge_gn.py:412-471): T=5, h_dim=e_dim=48, [32,32] MLPs,
Adam defaults, 80/20 split seed 42, batch 1, 500 epochs, best-val
checkpointing.  We train the same architecture with bucketed minibatches
(batch 16) and masked loss; quality target: masked val MAE ≈ 0.0151 e
(BASELINE.md).
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EPNN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EPNN_PLATFORM"])

from epnn_tpu.data import load_directory
from epnn_tpu.models import EPNNConfig
from epnn_tpu.train import TrainConfig, train

DATA = os.environ.get("EPNN_DATA", "/root/repo/.cache/refdata/mixed")
OUT = os.environ.get("EPNN_OUT", "/root/repo/runs/mixed_b16")

mols = [m for m in load_directory(DATA) if m.labels is not None]
print(f"{len(mols)} labeled molecules", flush=True)

cfg = EPNNConfig(n_elems=10, T=5)  # clean mode: masked messages
epochs = int(os.environ.get("EPNN_EPOCHS", "600"))
bs = int(os.environ.get("EPNN_BS", "16"))
steps_per_epoch = -(-len(mols) * 4 // (5 * bs))  # ~80% train split
tc = TrainConfig(
    learning_rate=float(os.environ.get("EPNN_LR", "2e-3")),
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
    dump_predictions=False,
)
os.makedirs(OUT, exist_ok=True)
res = train(mols, cfg, tc)
print("best val masked MAE:", res.best_val_masked_mae)
print("best val padded-metric MAE:", res.best_val_padded_mae)
