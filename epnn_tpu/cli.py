"""Command-line interface: ``python -m epnn_tpu <command>``.

Replaces the reference's edit-the-source workflow (hard-coded hparams at
``charge_gn.py:413-425``, fill-in placeholders at ``infer.py:42``) with real
subcommands:

  train         train a model on a directory of .xyz/.npy systems
  infer         predict charges for .xyz files (checkpoint or reference ckpt)
  import-ckpt   convert a reference TF checkpoint to the native format
  eval-pol      polarization-response analysis on a dimer
  horton2npy    extract MBIS charges from HORTON *-mtp.txt outputs
  convert-qm9   convert raw QM9 .xyz files to loader format
  export        AOT-export a serving forward (StableHLO via jax.export)
  bench         benchmark inference on a system
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--h-dim", type=int, default=48)
    p.add_argument("--e-dim", type=int, default=48)
    p.add_argument("--msg-dim", type=int, default=32)
    p.add_argument("--layers", type=int, nargs="+", default=[32, 32])
    p.add_argument("--rounds", "-T", type=int, default=5)
    p.add_argument("--n-elems", type=int, default=10,
                   help="atom feature width (10: 9-element table, 9: 8-element)")
    p.add_argument("--cutoff", type=float, default=3.0)
    p.add_argument("--eta", type=float, default=2.0)
    p.add_argument("--reference-compat", action="store_true",
                   help="reproduce the reference's unmasked GNN messages")
    p.add_argument("--preset",
                   choices=["model", "model2", "decay_model", "model_clean",
                            "model2_clean", "decay_model_clean"],
                   help="architecture preset: reference-named presets carry "
                        "the checkpoint's exact semantics (unmasked messages); "
                        "*_clean variants use pairwise-masked messages")


def _model_config(args):
    from epnn_tpu.models import EPNNConfig, PRESETS

    if args.preset:
        cfg = PRESETS[args.preset]
    else:
        cfg = EPNNConfig(
            n_elems=args.n_elems, h_dim=args.h_dim, e_dim=args.e_dim,
            msg_dim=args.msg_dim, mlp_hidden=tuple(args.layers),
            T=args.rounds, cutoff=args.cutoff, eta=args.eta,
        )
    if args.reference_compat:
        cfg = cfg.replace(mask_messages=False)
    return cfg


def cmd_train(args):
    from epnn_tpu.data import load_directory
    from epnn_tpu.train import TrainConfig, train

    cfg = _model_config(args)
    mols = [m for m in load_directory(args.data) if m.labels is not None]
    print(f"{len(mols)} labeled systems from {args.data}")
    val_mols = None
    if getattr(args, "val_data", None):
        val_mols = [m for m in load_directory(args.val_data)
                    if m.labels is not None]
        if not val_mols:
            raise SystemExit(
                f"--val-data {args.val_data}: no labeled systems found "
                "(needs .xyz files with matching .npy label arrays)")
        print(f"{len(val_mols)} labeled validation systems "
              f"from {args.val_data}")
    if args.init_from:
        # fine-tune: the checkpoint's config wins (arch must match weights)
        from epnn_tpu.io import load_config

        cfg = load_config(args.init_from)
    prec = getattr(args, "precision", "keep")
    if prec == "fast":
        # precision is a runtime policy, not part of the architecture —
        # overriding it keeps the weights/arch compatible.  Imported
        # reference checkpoints carry highest_precision=True (artifact
        # parity), which silently disables the packed far-field kernel
        # and runs HIGHEST-precision matmuls in the train step (~2x
        # slower at scale, scripts/tpu_profile_r9.py realstep/e2e).
        cfg = cfg.replace(matmul_precision="default")
    elif prec == "parity":
        cfg = cfg.replace(matmul_precision="highest",
                          dense_matmul_precision="default")
    tc = TrainConfig(
        learning_rate=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        loss=args.loss, seed=args.seed, checkpoint_dir=args.out,
        log_path=os.path.join(args.out, "metrics.jsonl") if args.out else None,
        resume=args.resume, init_from=args.init_from,
        val_fraction=getattr(args, "val_fraction", 0.2),
        split_seed=getattr(args, "split_seed", 42),
        lr_schedule=getattr(args, "lr_schedule", "constant"),
        warmup_steps=getattr(args, "warmup_steps", 0),
        lr_final_fraction=getattr(args, "lr_final_fraction", 0.05),
        grad_clip_norm=getattr(args, "grad_clip_norm", None),
        grad_accum=getattr(args, "grad_accum", 1),
        lr_plateau_factor=getattr(args, "lr_plateau_factor", None),
        lr_plateau_patience=getattr(args, "lr_plateau_patience", 2),
        ema_decay=getattr(args, "ema_decay", None),
        dump_predictions=getattr(args, "dump_predictions", False),
        debug_nans=getattr(args, "debug_nans", False),
        dense_max_atoms=args.dense_max_atoms,
        collapse_round1=not getattr(args, "no_collapse_round1", False),
        far_cluster=getattr(args, "far_cluster", 0) or 0,
        far_cluster_grad=getattr(args, "far_cluster_grad",
                                 "exact") != "stop",
        remat=getattr(args, "remat", False),
        near_row_chunk=getattr(args, "near_row_chunk", -1),
        near_window=getattr(args, "near_window", 0),
        eval_every=getattr(args, "eval_every", 1),
        early_stop_patience=getattr(args, "early_stop_patience", None),
        precompute_neighbors=not getattr(args, "no_precompute_neighbors",
                                         False),
        tensorboard_dir=(os.path.join(args.out, "tb")
                         if args.out and args.tensorboard else None),
    )
    if args.out:
        os.makedirs(args.out, exist_ok=True)
    mesh = None
    if getattr(args, "multihost", False):
        import jax

        from epnn_tpu.parallel import (
            initialize_distributed,
            is_coordinator,
            make_multihost_mesh,
        )

        initialize_distributed()
        mesh = make_multihost_mesh()
        print(f"multi-host mesh over {dict(mesh.shape)} "
              f"({jax.process_count()} processes, this is process "
              f"{jax.process_index()})")
        if not is_coordinator():
            # non-coordinator processes run the same SPMD programs but
            # must not race the coordinator's checkpoint/log files
            import dataclasses

            tc = dataclasses.replace(tc, checkpoint_dir=None, log_path=None,
                                     tensorboard_dir=None)
    elif args.data_parallel:
        from epnn_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"data-parallel over {mesh.shape} mesh")
    res = train(mols, cfg, tc, val_mols=val_mols, mesh=mesh)
    print(f"best val masked MAE: {res.best_val_masked_mae:.5f} e "
          f"(padded-metric equivalent: {res.best_val_padded_mae:.5f} e)")



def _make_predictor(args, **kw):
    """Predictor from --checkpoint / --reference-models with the CLI's
    precision policy applied (see benchmarks/RESULTS.md):

    * parity — fp32-HIGHEST near-field + electron passing, far field at
      default precision (measured parity-neutral: <=8e-6 e vs the golden
      artifacts either way).
    * fast — default matmul precision everywhere (conservation stays exact).
    """
    from epnn_tpu.infer import Predictor

    if args.reference_models:
        pred = Predictor.from_reference(args.reference_models,
                                        args.reference_name, **kw)
    else:
        pred = Predictor.from_checkpoint(args.checkpoint, **kw)
    if getattr(args, "precision", "parity") == "fast":
        cfg = pred.cfg.replace(matmul_precision="default")
    else:
        cfg = pred.cfg.replace(matmul_precision="highest",
                               dense_matmul_precision="default")
    if getattr(args, "compute_dtype", None) is not None:
        # unconditional: an explicit --compute-dtype float32 must also
        # override a bfloat16-configured checkpoint
        cfg = cfg.replace(compute_dtype=args.compute_dtype)
    return Predictor(params=pred.params, cfg=cfg, **kw)


def _add_window_flags(p):
    """Windowed huge-N gather knobs shared by infer/bench (r11: 568k
    serving 3.61 s -> 1.07 s, bitwise-identical charges)."""
    p.add_argument("--near-window", type=int, default=-1, metavar="W",
                   dest="near_window",
                   help="windowed huge-N gathers: per-chunk dynamic-slice "
                        "windows of W rows keep the gather tables under "
                        "the v5e ~60 MB staging cliff (bitwise-identical "
                        "charges when W covers each chunk's neighbor-index "
                        "spread). -1 = auto (measured from the serving "
                        "tables when chunking is active), 0 = off")
    p.add_argument("--spatial-sort", choices=("auto", "on", "off"),
                   default="auto", dest="spatial_sort",
                   help="cell-sort atoms internally so windowed gathers "
                        "get compact windows (charges return in input "
                        "order; fp-association-level change only). auto = "
                        "on for huge-N serving (reuse + chunked)")


def cmd_infer(args):
    from epnn_tpu.data import load_directory, load_molecule
    from epnn_tpu.infer import Predictor

    kw = {}
    if getattr(args, "renormalize", False):
        kw["renormalize"] = True
    if getattr(args, "no_collapse_round1", False):
        kw["collapse_round1"] = "off"
    if getattr(args, "far_cluster", 0):
        kw["far_cluster"] = args.far_cluster
    if getattr(args, "near_row_chunk", -1) != -1:
        kw["near_row_chunk"] = args.near_row_chunk
    if getattr(args, "near_window", -1) != -1:
        kw["near_window"] = args.near_window
    if getattr(args, "spatial_sort", "auto") != "auto":
        kw["spatial_sort"] = args.spatial_sort
    shard = getattr(args, "atom_shard", 0) or getattr(args, "ring_shard", 0)
    if shard:
        from epnn_tpu.parallel import make_mesh

        kw["mesh"] = make_mesh(n_data=1, n_atoms=shard)
        kw["shard_mode"] = "ring" if getattr(args, "ring_shard", 0) else "atom"
        print(f"sharding the atom axis over {shard} devices "
              f"({kw['shard_mode']} layout)")
    pred = _make_predictor(args, **kw)
    if os.path.isdir(args.path):
        mols = load_directory(args.path)
    else:
        mols = [load_molecule(args.path)]
    budget = getattr(args, "far_budget", None)
    if budget is not None:
        from epnn_tpu.data.dataset import pad_molecules
        from epnn_tpu.elements import table_for_n_elems

        big = max(mols, key=lambda m: m.natoms)
        cal = pred.calibrate_far_cluster(
            pad_molecules([big], table_for_n_elems(pred.cfg.n_elems),
                          pad_to=args.pad_to),
            budget=budget, apply=True)
        errs = ", ".join(f"C={c}: {e:.2e}" for c, e in
                         sorted(cal["errors"].items()))
        if cal["selected"] is None:
            print(f"far-cluster calibration on {big.name}: no candidate "
                  f"meets {budget:g} e ({errs}) — serving exact")
        else:
            print(f"far-cluster calibration on {big.name}: C="
                  f"{cal['selected']} (measured max|dq| "
                  f"{cal['errors'][cal['selected']]:.2e} e <= {budget:g}; "
                  f"{errs})")
    charges = pred.predict_molecules(mols, pad_to=args.pad_to)
    os.makedirs(args.out, exist_ok=True)
    for m, q in zip(mols, charges):
        np.save(os.path.join(args.out, m.name + "_pred.npy"), q)
        print(f"{m.name}: n={m.natoms} Q={m.total_charge:+.1f} "
              f"sum(q)={q.sum():+.5f}")
    print(f"wrote {len(mols)} prediction files to {args.out}")


def cmd_import_ckpt(args):
    from epnn_tpu.io import import_checkpoint, save_params

    params, cfg = import_checkpoint(args.prefix, e_dim=args.e_dim)
    save_params(args.out, params, cfg)
    from epnn_tpu.models import count_params

    print(f"imported {count_params(params)} params "
          f"(T={cfg.T}, n_elems={cfg.n_elems}) -> {args.out}")


def cmd_eval_pol(args):
    from epnn_tpu.analysis import polarization_response, split_dimer
    from epnn_tpu.data import load_molecule

    kw = {}
    if getattr(args, "no_collapse_round1", False):
        kw["collapse_round1"] = "off"
    pred = _make_predictor(args, **kw)
    dimer = load_molecule(args.dimer)
    monomers = None
    if args.monomers:
        monomers = [load_molecule(p) for p in args.monomers]
    elif args.monomer_charges is None:
        raise SystemExit(
            "eval-pol: monomer net charges are physical inputs — pass "
            "--monomers <a.xyz> <b.xyz> (headers carry the charges) or "
            "--monomer-charges qA qB to split the dimer"
        )
    label = np.load(args.labels).reshape(-1) if args.labels else None
    res = polarization_response(
        pred, dimer, monomers=monomers,
        monomer_charges=args.monomer_charges,
        label_polarization=label,
        pad_to=args.pad_to,
    )
    print(res.summary())


def cmd_horton2npy(args):
    from epnn_tpu.data.horton import convert_tree

    written = convert_tree(args.path, args.out)
    print(f"converted {len(written)} MBIS multipole files")


def cmd_convert_qm9(args):
    from epnn_tpu.data.qm9 import convert_directory

    written = convert_directory(args.src, args.dst)
    print(f"converted {len(written)} raw QM9 files -> {args.dst}")


def cmd_export(args):
    from epnn_tpu.data import load_molecule, pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.io.export_serving import export_predictor

    kw = {}
    if getattr(args, "no_collapse_round1", False):
        kw["collapse_round1"] = "off"
    if getattr(args, "far_cluster", 0):
        kw["far_cluster"] = args.far_cluster
    pred = _make_predictor(args, **kw)
    mol = load_molecule(args.path)
    table = table_for_n_elems(pred.cfg.n_elems)
    batch = pad_molecules([mol], table, pad_to=args.pad_to)
    platforms = (tuple(args.platforms.split(","))
                 if getattr(args, "platforms", None) else None)
    manifest = export_predictor(pred, batch, args.out, mode=args.mode,
                                platforms=platforms)
    print(f"exported {manifest['mode']}-mode serving artifact "
          f"(B={manifest['batch_size']}, N={manifest['padded_atoms']}, "
          f"platforms={manifest['platforms']}) -> {args.out}")


def cmd_bench(args):
    from epnn_tpu.data import load_molecule, pad_molecules
    from epnn_tpu.elements import table_for_n_elems
    from epnn_tpu.infer import Predictor
    kw = {}
    if getattr(args, "no_collapse_round1", False):
        kw["collapse_round1"] = "off"
    if getattr(args, "neighbor_skin", 0.0):
        kw["neighbor_skin"] = args.neighbor_skin
    if getattr(args, "far_cluster", 0):
        kw["far_cluster"] = args.far_cluster
    if getattr(args, "near_row_chunk", -1) != -1:
        kw["near_row_chunk"] = args.near_row_chunk
    if getattr(args, "near_window", -1) != -1:
        kw["near_window"] = args.near_window
    if getattr(args, "spatial_sort", "auto") != "auto":
        kw["spatial_sort"] = args.spatial_sort
    pred = _make_predictor(
        args, reuse_neighbors=getattr(args, "reuse_neighbors", False), **kw)
    mol = load_molecule(args.path)
    table = table_for_n_elems(pred.cfg.n_elems)
    batch = pad_molecules([mol], table)
    # default: serialized-chain methodology (the honest steady-state number
    # on tunneled backends — same as bench.py); --per-call restores per-call
    # block_until_ready timing (dispatch latency on tunneled hosts)
    stats = pred.benchmark_batch(
        batch, iters=args.iters, warmup_loops=args.warmup,
        profile_dir=args.profile_dir,
        per_call=getattr(args, "per_call", False),
    )
    stats.update(natoms=mol.natoms, name=mol.name)
    if getattr(args, "far_cluster", 0):
        diag = pred.far_field_diagnostics(batch)
        stats.update(
            far_cluster=args.far_cluster,
            far_cluster_max_abs_dq=float(diag["max_abs_dq"].max()),
            far_cluster_radius=float(diag["max_radius"].max()),
        )
    print(json.dumps(stats))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="epnn_tpu")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="train a model")
    _add_model_args(p)
    p.add_argument("--data", required=True)
    p.add_argument("--val-data", dest="val_data", default=None,
                   help="explicit validation directory (xyz+npy); when set, "
                        "ALL of --data trains and no random split happens")
    p.add_argument("--val-fraction", type=float, default=0.2,
                   dest="val_fraction",
                   help="random held-out fraction of --data when no "
                        "--val-data is given (default 0.2, split seed 42 — "
                        "the reference protocol)")
    p.add_argument("--out", default="runs/default")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--loss", choices=["masked_mse", "padded_mse"],
                   default="masked_mse")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-from",
                   help="fine-tune: initialize params (and config) from a "
                        "native checkpoint dir (e.g. from import-ckpt)")
    p.add_argument("--precision", choices=["keep", "fast", "parity"],
                   default="keep",
                   help="matmul precision POLICY for training (runtime "
                        "knob, not architecture): 'keep' (default) honors "
                        "the config/checkpoint; 'fast' forces default "
                        "precision (enables the packed far-field kernel — "
                        "imported reference checkpoints otherwise carry "
                        "highest_precision and train ~2x slower at scale); "
                        "'parity' forces the inference parity policy")
    p.add_argument("--dense-max-atoms", type=int, default=256,
                   help="buckets padded wider than this train through the "
                        "blockwise fused path (no dense pair tensors)")
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="join the JAX distributed runtime (one process per "
                        "host; coordinator/rank from EPNN_COORDINATOR / "
                        "EPNN_NUM_PROCESSES / EPNN_PROCESS_ID, or Cloud "
                        "TPU auto-detection) and train data-parallel over "
                        "the GLOBAL device mesh — DCN carries only the "
                        "data axis; non-coordinators skip checkpoint/log "
                        "writes")
    p.add_argument("--no-collapse-round1", action="store_true",
                   help="disable the round-1 far-field collapse on "
                        "fused/sharded buckets (auto-verified per bucket; "
                        "~19%% off the protein-scale train step — this "
                        "flag pins the uncollapsed summation order)")
    p.add_argument("--far-cluster", type=int, default=0, dest="far_cluster",
                   help="opt-in APPROXIMATE clustered far-field tier for "
                        "the TRAINING step on fused/sharded buckets (C "
                        "weighted k-means centroids replace each h!=0 "
                        "round's O(N^2) far field — big-graph fine-tuning "
                        "accelerator; eval + checkpoint selection stay "
                        "exact).  0 = exact")
    p.add_argument("--far-cluster-grad", choices=("exact", "stop"),
                   default="exact", dest="far_cluster_grad",
                   help="gradient mode of the clustered tier: 'exact' "
                        "(default) differentiates the final centroids "
                        "under the fixed assignment (the true gradient of "
                        "the clustered forward); 'stop' drops the "
                        "far-field dL/dpj path (fit fully stop-gradient)")
    p.add_argument("--no-precompute-neighbors", action="store_true",
                   help="rebuild neighbor lists inside every train/eval "
                        "step instead of once per bucket (audit mode; "
                        "per-bucket tables are bitwise-identical and "
                        "skip the selection cost — 40%% of the big-graph "
                        "step's device time)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize message/pass rounds in the fused/"
                        "sharded training backward (bounds residual memory "
                        "at O(round state); default OFF — measured faster "
                        "without at every size tried, the far-field "
                        "kernel's VJP already recomputes in-tile)")
    p.add_argument("--near-row-chunk", type=int, default=-1,
                   dest="near_row_chunk", metavar="ROWS",
                   help="huge-N training memory mode: run each round's "
                        "(N, k, ·) near-field activations in lax.map "
                        "chunks of ROWS rows (training twin of the "
                        "Predictor's near_row_chunk).  -1 (default) = "
                        "auto: buckets >= 200k padded atoms chunk with "
                        "the balanced policy and force remat for "
                        "themselves; 0 = off; explicit ROWS requires "
                        "--remat (which also checkpoints the chunk body "
                        "so the backward recomputes chunk-by-chunk)")
    p.add_argument("--near-window", type=int, default=0,
                   dest="near_window", metavar="W",
                   help="windowed huge-N near gathers for the chunked "
                        "training path (requires --near-row-chunk and "
                        "spatially sorted atoms with window width <= W "
                        "— see ops.fused.neighbor_window_width)")
    p.add_argument("--eval-every", type=int, default=1, dest="eval_every",
                   help="evaluate the validation set every Nth epoch only "
                        "(the final epoch always evaluates; skipped epochs "
                        "log val metrics as null and never update the best "
                        "checkpoint).  Exact eval on a big-graph bucket "
                        "costs ~a training epoch — >1 amortizes it")
    p.add_argument("--lr-schedule", choices=("constant", "cosine"),
                   default="constant", dest="lr_schedule",
                   help="LR schedule (cosine decays to --lr-final-fraction "
                        "of the peak over the run)")
    p.add_argument("--warmup-steps", type=int, default=0,
                   dest="warmup_steps",
                   help="linear LR warmup steps (cosine schedule only)")
    p.add_argument("--lr-final-fraction", type=float, default=0.05,
                   dest="lr_final_fraction",
                   help="cosine floor as a fraction of the peak LR")
    p.add_argument("--ema-decay", type=float, default=None, dest="ema_decay",
                   help="exponential moving average of the weights (e.g. "
                        "0.999); validation, best-checkpoint selection and "
                        "artifact dumps then use the EMA params — best/ "
                        "contains what you serve.  One fused multiply-add "
                        "per step; resumes from <out>/ema")
    p.add_argument("--lr-plateau-factor", type=float, default=None,
                   dest="lr_plateau_factor",
                   help="reduce-on-plateau: multiply the LR by this when "
                        "val MAE has not improved for "
                        "--lr-plateau-patience evaluated epochs (constant "
                        "schedule only; scales a runtime operand — no "
                        "step recompile)")
    p.add_argument("--lr-plateau-patience", type=int, default=2,
                   dest="lr_plateau_patience",
                   help="evaluated epochs without improvement before each "
                        "plateau LR reduction (default 2)")
    p.add_argument("--grad-accum", type=int, default=1, dest="grad_accum",
                   help="accumulate gradients over N minibatches before "
                        "each optimizer update (effective batch = "
                        "batch-size x N; use when big-graph memory forces "
                        "batch-size down)")
    p.add_argument("--grad-clip-norm", type=float, default=None,
                   dest="grad_clip_norm",
                   help="optax global-norm gradient clipping (stabilized "
                        "the rescued charged-species training — "
                        "benchmarks/RESULTS.md)")
    p.add_argument("--split-seed", type=int, default=42, dest="split_seed",
                   help="random-split seed (default 42, the reference "
                        "protocol)")
    p.add_argument("--dump-predictions", action="store_true",
                   dest="dump_predictions",
                   help="dump train/val prediction+label+name arrays next "
                        "to the best checkpoint on every improvement (the "
                        "reference's model_systems/ artifact protocol)")
    p.add_argument("--debug-nans", action="store_true", dest="debug_nans",
                   help="enable jax_debug_nans for the run")
    p.add_argument("--early-stop-patience", type=int, default=None,
                   dest="early_stop_patience",
                   help="stop when the val masked MAE has not improved for "
                        "this many consecutive EVALUATED epochs (composes "
                        "with --eval-every; default: run all epochs, the "
                        "reference protocol)")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard event files under <out>/tb")
    p.set_defaults(fn=cmd_train)

    def _ckpt_args(p):
        p.add_argument("--checkpoint", help="native checkpoint dir")
        p.add_argument("--reference-models",
                       help="reference models/ dir (TF checkpoints)")
        p.add_argument("--reference-name", default="decay_model")
        p.add_argument("--precision", choices=["parity", "fast"],
                       default="parity",
                       help="parity: fp32-HIGHEST near-field (bit-comparable "
                            "to the reference, <=1e-5 e); fast: default "
                            "matmul precision (conservation stays exact, "
                            "~8%% lower latency)")
        p.add_argument("--no-collapse-round1", action="store_true",
                       help="disable the round-1 far-field collapse (auto-"
                            "detected per batch; measured bitwise-identical "
                            "on TPU — this flag pins the uncollapsed "
                            "summation order for strict audits)")
        p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                       default=None, dest="compute_dtype",
                       help="activation dtype for the forward (default: "
                            "keep the checkpoint config).  bfloat16: "
                            "-10.7%% at 568k atoms, conservation 4.9e-8 "
                            "renormalized — benchmarks/RESULTS.md r11; "
                            "the electron-passing rounds stay f32 for "
                            "exact antisymmetry regardless")

    p = sub.add_parser("infer", help="predict charges")
    _ckpt_args(p)
    p.add_argument("path", help=".xyz file or directory")
    p.add_argument("--out", default="predictions")
    p.add_argument("--pad-to", type=int)
    p.add_argument("--atom-shard", type=int, default=0, metavar="N",
                   help="shard each graph's pair grid over N devices "
                        "(replicated projections)")
    p.add_argument("--ring-shard", type=int, default=0, metavar="N",
                   help="shard atoms over N devices with ring ppermute "
                        "circulation (nothing replicated)")
    p.add_argument("--renormalize", action="store_true",
                   help="redistribute the fp conservation residue uniformly "
                        "over real atoms: sum(q) matches the net charge to "
                        "fp ulp (residue/n_real per-atom shift)")
    p.add_argument("--far-cluster", type=int, default=0, metavar="C",
                   help="APPROXIMATE clustered far-field serving tier: "
                        "quantize each message round's O(N^2) beyond-cutoff "
                        "reduction to C weighted k-means centroids (O(N*C)). "
                        "Near field + electron passing stay exact, so "
                        "conservation is untouched; quantify the h-error "
                        "with Predictor.far_field_diagnostics. 0 = exact")
    p.add_argument("--far-budget", type=float, default=None, metavar="E",
                   help="auto-calibrate the clustered tier: measure "
                        "max|dq| vs the exact forward on the LARGEST input "
                        "molecule at ascending C (16,32,64,128,256) and "
                        "serve with the smallest C within E (in e); falls "
                        "back to exact when none qualifies")
    p.add_argument("--near-row-chunk", type=int, default=-1, metavar="R",
                   dest="near_row_chunk",
                   help="huge-N memory mode: run the (N,k,.) near-field "
                        "activations and the cell builder's candidate "
                        "gather in chunks of R rows (bitwise-identical "
                        "charges, bounded HBM — graphs past ~0.5M atoms "
                        "need it on one 16 GB chip). -1 = auto (on past "
                        "200k padded atoms), 0 = off")
    _add_window_flags(p)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("import-ckpt", help="TF checkpoint -> native format")
    p.add_argument("prefix", help="TF checkpoint prefix")
    p.add_argument("--out", required=True)
    p.add_argument("--e-dim", type=int, default=48)
    p.set_defaults(fn=cmd_import_ckpt)

    p = sub.add_parser("eval-pol", help="polarization-response analysis")
    _ckpt_args(p)
    p.add_argument("dimer", help="dimer .xyz (with splits metadata)")
    p.add_argument("--monomers", nargs=2,
                   help="monomer .xyz files (headers carry the net charges)")
    p.add_argument("--monomer-charges", nargs=2, type=float,
                   help="monomer net charges (required when splitting the "
                        "dimer without --monomers)")
    p.add_argument("--labels", help="label polarization .npy")
    p.add_argument("--pad-to", type=int)
    p.set_defaults(fn=cmd_eval_pol)

    p = sub.add_parser("horton2npy", help="extract MBIS charges")
    p.add_argument("path")
    p.add_argument("--out")
    p.set_defaults(fn=cmd_horton2npy)

    p = sub.add_parser("convert-qm9", help="raw QM9 -> loader format")
    p.add_argument("src")
    p.add_argument("dst")
    p.set_defaults(fn=cmd_convert_qm9)

    p = sub.add_parser(
        "export",
        help="AOT-export a serving forward (StableHLO via jax.export)")
    _ckpt_args(p)
    p.add_argument("path", help=".xyz file fixing the serving geometry "
                               "class (shapes/neighbor_k are static in "
                               "the artifact)")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--pad-to", type=int,
                   help="padded atom width of the artifact (default: the "
                        "molecule's natoms rounded up)")
    p.add_argument("--mode", choices=["dense", "blocked", "md"],
                   default=None,
                   help="calling convention (default: the Predictor's own "
                        "dispatch for this size; 'md' adds precomputed "
                        "(idx, nbr_mask) neighbor-table inputs for "
                        "Verlet-skin loops)")
    p.add_argument("--platforms",
                   help="comma-separated lowering platforms (e.g. "
                        "'tpu,cpu'); default: the current backend only. "
                        "Multi-platform artifacts use the pure-XLA path")
    p.add_argument("--far-cluster", type=int, default=0, metavar="C",
                   help="bake the APPROXIMATE clustered far-field tier "
                        "into the artifact (see `infer --far-cluster`)")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("bench", help="benchmark inference")
    _ckpt_args(p)
    p.add_argument("path", help=".xyz file")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--profile-dir")
    p.add_argument("--reuse-neighbors", action="store_true",
                   help="serving/MD mode: build the neighbor list once and "
                        "reuse it every iteration (bitwise-identical "
                        "charges; ~40%% faster at protein scale)")
    p.add_argument("--neighbor-skin", type=float, default=0.0,
                   help="Verlet-skin MD serving (needs --reuse-neighbors): "
                        "select once at cutoff+skin, re-gather only the "
                        "O(N*k) pair distances each step until any atom "
                        "drifts past skin/2 — the honest per-step cost of "
                        "an MD loop with moving coordinates (exact charges)")
    p.add_argument("--per-call", action="store_true",
                   help="time independent per-call block_until_ready "
                        "round-trips instead of the serialized-chain "
                        "methodology (on tunneled TPU backends per-call "
                        "numbers include ~25 ms/call of dispatch overhead "
                        "— see benchmarks/RESULTS.md)")
    p.add_argument("--far-cluster", type=int, default=0, metavar="C",
                   help="benchmark the APPROXIMATE clustered far-field tier "
                        "with C centroids (see `infer --far-cluster`); the "
                        "printed JSON adds the measured max |dq| vs the "
                        "exact forward on the same geometry")
    p.add_argument("--near-row-chunk", type=int, default=-1, metavar="R",
                   dest="near_row_chunk",
                   help="huge-N memory mode (see `infer --near-row-chunk`); "
                        "-1 = auto, 0 = off")
    _add_window_flags(p)
    p.set_defaults(fn=cmd_bench)

    return ap


def main(argv=None):
    # Select the JAX platform before any backend initializes.  This must go
    # through jax.config (not env vars): some environments preimport jax with
    # a pinned platform via sitecustomize, making JAX_PLATFORMS too late.
    import jax

    platform = os.environ.get("EPNN_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = os.environ.get("EPNN_COMPILE_CACHE", ".cache/jaxcache")
    # The persistent cache only helps where compiles are expensive (the
    # tunneled TPU backend); on XLA:CPU, loading AOT executables compiled
    # on a different host steps on machine-feature mismatches (E-log spam,
    # potential SIGILL — the documented suite SIGABRT tell).  Default it
    # off on CPU; EPNN_COMPILE_CACHE=<dir> still forces it anywhere.
    # The CPU check must read the EFFECTIVE platform, not just the env
    # var: in-process callers (the test suite) flip the platform through
    # jax.config without setting EPNN_PLATFORM — keying on the env var
    # alone silently enabled the cache for the whole pytest process and
    # segfaulted a later suite run at the first AOT cache LOAD.
    effective = (platform or jax.config.jax_platforms or "")
    if (cache_dir == ".cache/jaxcache"
            and effective.split(",")[0].strip() == "cpu"):
        cache_dir = None
    if cache_dir and cache_dir != "0":
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.abspath(cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
