"""Training loop: bucketed batching, jit'd updates, masked metrics,
best-val checkpointing, full resume.

Capability parity with the reference trainer (``charge_gn.py:412-471``) plus
everything it lacks (SURVEY §5): minibatching instead of batch-1 Python loops,
optimizer-state checkpointing, resume, JSONL metric logs, and optional data
parallelism over a device mesh (``mesh`` argument; batches are sharded on the
leading axis, gradients are averaged by XLA collectives — no hand-written
comms).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from epnn_tpu.data.dataset import MolBatch, bucket_molecules, minibatches
from epnn_tpu.data.xyz import Molecule
from epnn_tpu.elements import table_for_n_elems
from epnn_tpu.featurize import rbf_edges
from epnn_tpu.io import checkpoint as ckpt_io
from epnn_tpu.models import EPNN, EPNNConfig, init_params
from epnn_tpu.train import metrics as M


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer/loop hyperparameters (reference defaults: Adam lr=1e-3,
    beta1=0.9, beta2=0.999, eps=1e-7 — keras defaults at charge_gn.py:419 —
    500 epochs, 80/20 split with seed 42)."""

    learning_rate: float = 1e-3
    lr_schedule: str = "constant"   # 'constant' | 'cosine'
    lr_final_fraction: float = 0.05  # cosine floor as a fraction of peak
    warmup_steps: int = 0
    total_steps: Optional[int] = None  # cosine horizon (derived if None)
    #: reduce-on-plateau: multiply the LR by this factor when the val
    #: masked MAE has not improved for lr_plateau_patience consecutive
    #: EVALUATED epochs (constant schedule only).  The LR lives in the
    #: optimizer state as a runtime operand (optax.inject_hyperparams),
    #: so scaling it between epochs recompiles NOTHING — important on
    #: tunneled TPU hosts where a big-graph step compile costs minutes.
    lr_plateau_factor: Optional[float] = None
    lr_plateau_patience: int = 2
    #: exponential moving average of the weights (e.g. 0.999): one fused
    #: multiply-add over the ~74K params per step (negligible; dispatch
    #: pipelines with the step).  When set, validation, best-checkpoint
    #: selection, and prediction artifacts all use the EMA weights —
    #: "best/" then CONTAINS the EMA params (what you serve).  The EMA
    #: tree checkpoints/resumes alongside the train state (<out>/ema).
    ema_decay: Optional[float] = None
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-7
    grad_clip_norm: Optional[float] = None  # optax global-norm clipping
    #: accumulate gradients over this many minibatches before applying one
    #: optimizer update (optax.MultiSteps) — simulates an effective batch
    #: of batch_size*grad_accum when a bucket's memory forces batch_size
    #: down (e.g. protein-scale graphs at batch_size=1).  Grads average
    #: across the window; clipping/Adam see the averaged grad.  The
    #: accumulator lives in opt_state, so it checkpoints/resumes — but a
    #: resume must use the SAME grad_accum (opt_state shape changes).
    grad_accum: int = 1
    epochs: int = 500
    batch_size: int = 32
    loss: str = "masked_mse"
    seed: int = 0
    val_fraction: float = 0.2
    split_seed: int = 42
    bucket_multiple: int = 8
    checkpoint_dir: Optional[str] = None
    log_path: Optional[str] = None
    resume: bool = False
    #: initialize params from a params-only checkpoint dir (fresh optimizer)
    #: — the fine-tune entry point, e.g. an import-ckpt'd reference model
    init_from: Optional[str] = None
    #: optional TensorBoard event-file directory (SURVEY §5; skipped with a
    #: warning when no SummaryWriter implementation is importable)
    tensorboard_dir: Optional[str] = None
    debug_nans: bool = False
    #: evaluate the validation set every Nth epoch only (the final epoch
    #: always evaluates, so best-checkpoint selection can never end on a
    #: skipped epoch).  Exact eval on a big-graph bucket costs about a
    #: training epoch (17,760 atoms: eval fwd ~87 ms/step vs clustered
    #: train 93 — RESULTS.md r9c); >1 amortizes it across epochs.
    #: Skipped epochs log val metrics as None and never update "best".
    eval_every: int = 1
    #: stop when the val masked MAE has not improved for this many
    #: consecutive EVALUATED epochs (composes with eval_every; None —
    #: the reference protocol — runs all epochs and keeps best-val)
    early_stop_patience: Optional[int] = None
    #: dump train/val prediction + label + name arrays next to the best
    #: checkpoint on every improvement (the reference's artifact protocol,
    #: charge_gn.py:433-434,465-468 — what model_systems/ contains)
    dump_predictions: bool = False
    #: buckets padded wider than this train through the blockwise fused path
    #: (remat'd, neighbor-split) instead of the dense model — the dense loss
    #: materializes (B, N, N, e_dim) edge tensors and O(N²·pair_feat)
    #: activations, which is HBM-catastrophic at protein scale (the
    #: reference trains dense-only, charge_gn.py:393-402, and cannot go
    #: there at all).  Mirrors Predictor's inference dispatch.
    dense_max_atoms: int = 256
    #: row-block size for the fused training path
    fused_block: int = 256
    #: round-1 far-field collapse on fused/sharded buckets (exact under the
    #: pad_molecules contract, which is verified per bucket before use —
    #: ~19% off the protein-scale train step, benchmarks/RESULTS.md round
    #: 6).  False pins the uncollapsed round-1 summation order for strict
    #: audits (the Predictor's collapse_round1='off' analog).
    collapse_round1: bool = True
    #: opt-in APPROXIMATE clustered far-field tier for the TRAINING step on
    #: fused/sharded (neighbor-split) buckets — the training twin of
    #: ``Predictor(far_cluster=C)``: each h≠0 message round's O(N²) far
    #: field runs as a C-centroid weighted grid.  The forward error carries
    #: the usual Lipschitz×radius bound; gradients follow
    #: ``far_cluster_grad``.  Intended for big-graph fine-tuning where the
    #: near field dominates learning; EVAL steps and checkpoint selection
    #: always run EXACT.  0 = exact training (default).
    far_cluster: int = 0
    #: precompute per-bucket neighbor tables ONCE and reuse them every
    #: step/epoch (training geometries never move, so per-step in-forward
    #: selection is pure waste — the r9 trace showed top_k was 40% of the
    #: 17,760-atom train step's device time).  Tables are (B, N, k) idx/
    #: mask/d² device arrays per fused bucket, row-gathered in-graph per
    #: minibatch; outputs are bitwise-identical to in-forward selection
    #: (same d² plane).  Applies to the single-host fused path; sharded
    #: steps keep in-forward selection (tables would need resharding).
    precompute_neighbors: bool = True
    #: rematerialize message/pass rounds in the fused/sharded training
    #: backward.  False (default): keep round residuals — measured FASTER
    #: on v5e at every size tried (17,760 atoms: exact 526→456 ms/step,
    #: clustered C=32 160→155; scripts/tpu_profile_r9.py remat) because
    #: the packed far-field kernel's custom VJP already recomputes
    #: in-tile, so blanket remat only re-runs the cheap near chain.
    #: Residual memory is O(N·k·h) per round (~3.5 GB at 17,760) — set
    #: True for buckets where that breaks HBM.
    remat: bool = False
    #: gradient mode of the clustered tier.  True (default): the final
    #: centroids are recomputed differentiably under the (piecewise-
    #: constant, stop-gradient) assignment, so the step optimizes the TRUE
    #: gradient of the clustered forward — the far-field ∂L/∂pj path flows
    #: with Jacobian w_j/W_c (``ops/cluster.py weighted_kmeans
    #: differentiable=True``; at C=N this reduces to exact training up to
    #: fp order).  False: r7f behavior — fit fully stop-gradient, the
    #: j-side far-field gradient dropped (far field frozen per step).
    far_cluster_grad: bool = True
    #: huge-N memory mode for the fused training path — the training twin
    #: of ``forward_blocked(near_row_chunk=...)``: each round's (N, k, ·)
    #: near-field activations run in ``lax.map`` chunks of this many rows,
    #: and under ``remat`` the chunk BODY is checkpointed too, so the
    #: backward recomputes chunk-by-chunk (peak residual = one chunk).
    #: ``-1`` (default) = auto: buckets at/above
    #: ``infer.HUGE_GRAPH_MIN_ATOMS`` (200k) padded atoms chunk with the
    #: Predictor's balanced policy and FORCE remat for themselves (the
    #: full-width near activations OOM one chip at that scale — r12
    #: battery); smaller buckets run full-width.  ``0`` = off everywhere.
    #: ``> 0`` = explicit chunk size; requires ``remat=True`` (enforced) —
    #: without it the lax.map scan keeps every chunk's residuals alive
    #: and the chunking saves nothing.
    near_row_chunk: int = -1
    #: windowed huge-N near gathers for the chunked training path (the
    #: training twin of ``forward_blocked(near_window=W)``): per-chunk
    #: dynamic-slice windows keep the gathered tables under the v5e
    #: table-bytes cliff (benchmarks/RESULTS.md round 11).  Requires
    #: ``near_row_chunk`` and SPATIALLY SORTED atoms wide enough that
    #: ``ops.fused.neighbor_window_width`` ≤ this value — out-of-window
    #: pairs are mask-dropped (a deterministic conservation error, never
    #: garbage), so sort + size the width before turning this on.
    #: 0 = plain gathers (default).
    near_window: int = 0


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.lr_plateau_factor is not None:
        if tc.lr_schedule != "constant":
            raise ValueError(
                "lr_plateau_factor requires lr_schedule='constant' "
                "(a step-indexed schedule and plateau scaling would fight)")
        # the LR becomes a leaf of opt_state (a runtime operand of the
        # compiled step), so train() can scale it between epochs without
        # retracing/recompiling any step executable
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=tc.learning_rate,
            b1=tc.beta1, b2=tc.beta2, eps=tc.eps)
    else:
        if tc.lr_schedule == "cosine":
            total = tc.total_steps or 100_000
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0 if tc.warmup_steps else tc.learning_rate,
                peak_value=tc.learning_rate,
                warmup_steps=tc.warmup_steps,
                decay_steps=total,
                end_value=tc.learning_rate * tc.lr_final_fraction,
            )
        else:
            lr = tc.learning_rate
        opt = optax.adam(lr, b1=tc.beta1, b2=tc.beta2, eps=tc.eps)
    if tc.grad_clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(tc.grad_clip_norm), opt)
    if tc.grad_accum > 1:
        # mean-accumulate grads across grad_accum minibatches; the inner
        # chain (clip -> adam) updates once per window with its own step
        # count advancing per WINDOW (correct schedule semantics)
        opt = optax.MultiSteps(
            opt, every_k_schedule=tc.grad_accum).gradient_transformation()
    return opt


def _scale_plateau_lr(opt_state, factor: float):
    """Multiply the injected learning_rate leaf by ``factor`` in place of
    structure (same pytree shape/dtypes — compiled steps keep their
    executables).  Chain states are plain tuples; recurse through them."""
    hp = getattr(opt_state, "hyperparams", None)  # Inject[Stateful]HyperparamsState
    if isinstance(hp, dict) and "learning_rate" in hp:
        hp = dict(hp)
        hp["learning_rate"] = hp["learning_rate"] * factor
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_scale_plateau_lr(s, factor) for s in opt_state)
    if hasattr(opt_state, "_fields") and hasattr(opt_state, "_replace"):
        # namedtuple wrapper states (e.g. optax MultiStepsState holding
        # the injected-LR chain in inner_opt_state): recurse every field
        return opt_state._replace(**{
            f: _scale_plateau_lr(getattr(opt_state, f), factor)
            for f in opt_state._fields})
    return opt_state


def create_state(cfg: EPNNConfig, tc: TrainConfig, rng: jax.Array) -> TrainState:
    params = init_params(cfg, rng)
    opt = make_optimizer(tc)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def _loss_fn(params, model, loss_name, x, q0, xyz, node_mask, y, weight):
    e = rbf_edges(xyz, node_mask, e_dim=model.config.e_dim,
                  cutoff=model.config.cutoff, eta=model.config.eta)
    pred = model.apply(params, x, q0, e, node_mask)
    loss = M.LOSSES[loss_name](pred, y, node_mask, weight)
    return loss, pred


@functools.partial(jax.jit, static_argnames=("model", "loss_name", "opt"))
def train_step(state: TrainState, model: EPNN, loss_name: str,
               opt: optax.GradientTransformation,
               x, q0, xyz, node_mask, y, weight):
    (loss, pred), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
        state.params, model, loss_name, x, q0, xyz, node_mask, y, weight
    )
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1)
    mets = M.mae_sums(pred, y, node_mask, weight)
    return new_state, loss, pred, mets


@functools.partial(jax.jit, static_argnames=("model", "loss_name"))
def eval_step(params, model: EPNN, loss_name: str,
              x, q0, xyz, node_mask, y, weight):
    loss, pred = _loss_fn(params, model, loss_name, x, q0, xyz, node_mask, y, weight)
    mets = M.mae_sums(pred, y, node_mask, weight)
    return loss, pred, mets


def _loss_fn_fused(params, cfg, loss_name, block, neighbor_k, use_pallas,
                   x, q0, xyz, node_mask, y, weight, uniform_q0=False,
                   far_cluster=0, far_cluster_grad=False, remat=True,
                   neighbors=None, nbr_tables=None, nbr_rows=None,
                   near_row_chunk=0, near_window=0):
    """Loss through the blockwise fused forward (epnn_tpu.ops.fused): no
    dense pair tensors, remat bounds activation memory at round boundaries.
    fuse_params is a pure (differentiable) restructuring, so gradients flow
    back to the same flax params pytree the dense path trains.  With
    ``use_pallas`` the far-field reduction runs in the packed Mosaic kernel
    forward AND backward (recompute-in-tile custom VJP).  ``uniform_q0``
    asserts the pad_molecules round-1 collapse contract (see
    :func:`epnn_tpu.ops.fused.forward_blocked`; 25.6 → 20.7 ms/step at
    protein scale, scripts/tpu_profile_r6.py)."""
    from epnn_tpu.ops import forward_blocked, fuse_params

    if nbr_tables is not None:
        # bucket-resident (B_bucket, N, k) idx/mask/d² tables, row-gathered
        # in-graph to this minibatch's rows (device gather — no per-step
        # host transfer; TrainConfig.precompute_neighbors)
        neighbors = tuple(t[nbr_rows] for t in nbr_tables)
    fused = fuse_params(params, cfg)
    pred = forward_blocked(fused, x, q0, xyz, node_mask, cfg,
                           block=block, neighbor_k=neighbor_k, remat=remat,
                           use_pallas=use_pallas, uniform_q0=uniform_q0,
                           far_cluster=far_cluster,
                           far_cluster_grad=far_cluster_grad,
                           neighbors=neighbors,
                           near_row_chunk=near_row_chunk,
                           near_window=near_window)
    loss = M.LOSSES[loss_name](pred, y, node_mask, weight)
    return loss, pred


@functools.partial(
    jax.jit, static_argnames=("cfg", "loss_name", "opt", "block",
                              "neighbor_k", "use_pallas", "uniform_q0",
                              "far_cluster", "far_cluster_grad", "remat",
                              "near_row_chunk", "near_window")
)
def train_step_fused(state: TrainState, cfg: EPNNConfig, loss_name: str,
                     opt: optax.GradientTransformation, block: int,
                     neighbor_k: int, x, q0, xyz, node_mask, y, weight,
                     use_pallas: bool = False, uniform_q0: bool = False,
                     far_cluster: int = 0, far_cluster_grad: bool = False,
                     remat: bool = True, neighbors=None,
                     nbr_tables=None, nbr_rows=None,
                     near_row_chunk: int = 0, near_window: int = 0):
    (loss, pred), grads = jax.value_and_grad(_loss_fn_fused, has_aux=True)(
        state.params, cfg, loss_name, block, neighbor_k, use_pallas,
        x, q0, xyz, node_mask, y, weight, uniform_q0, far_cluster,
        far_cluster_grad, remat, neighbors, nbr_tables, nbr_rows,
        near_row_chunk, near_window
    )
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1)
    mets = M.mae_sums(pred, y, node_mask, weight)
    return new_state, loss, pred, mets


@functools.partial(
    jax.jit, static_argnames=("cfg", "loss_name", "block", "neighbor_k",
                              "use_pallas", "uniform_q0", "near_row_chunk",
                              "near_window")
)
def eval_step_fused(params, cfg: EPNNConfig, loss_name: str, block: int,
                    neighbor_k: int, x, q0, xyz, node_mask, y, weight,
                    use_pallas: bool = False, uniform_q0: bool = False,
                    neighbors=None, nbr_tables=None, nbr_rows=None,
                    near_row_chunk: int = 0, near_window: int = 0):
    loss, pred = _loss_fn_fused(params, cfg, loss_name, block, neighbor_k,
                                use_pallas, x, q0, xyz, node_mask, y, weight,
                                uniform_q0, neighbors=neighbors,
                                nbr_tables=nbr_tables, nbr_rows=nbr_rows,
                                near_row_chunk=near_row_chunk,
                                near_window=near_window)
    mets = M.mae_sums(pred, y, node_mask, weight)
    return loss, pred, mets


def _batch_args(mb: MolBatch, n_real: int):
    weight = np.zeros(mb.batch_size, np.float32)
    weight[:n_real] = 1.0
    return mb.x, mb.q0, mb.xyz, mb.node_mask, mb.y, weight


class MetricAccumulator:
    """Accumulates metric *device values* and converts to host floats only
    when read — per-step float() would force a device sync per step, which
    is latency-bound on tunneled backends."""

    def __init__(self):
        self._mets = []
        self._losses = []
        self._cache = None

    def update(self, loss, mets):
        self._mets.append(mets)
        self._losses.append(loss)
        self._cache = None

    def _reduced(self):
        # ONE batched device_get for losses+metrics, cached until the next
        # update — each separate transfer over the tunnel costs ~25 ms, so
        # per-property gets would tax every epoch boundary 6x
        if self._cache is None:
            import numpy as _np

            ls, ms = jax.device_get((self._losses, self._mets))
            m = _np.asarray(ms, dtype=_np.float64)
            self._cache = (
                float(_np.mean(_np.asarray(ls))) if ls else 0.0,
                m.sum(axis=0) if len(m) else _np.zeros(4),
            )
        return self._cache

    @property
    def masked_mae(self) -> float:
        _, (ms, mn, _, _) = self._reduced()
        return float(ms / max(mn, 1.0))

    @property
    def padded_mae(self) -> float:
        _, (_, _, ps, pn) = self._reduced()
        return float(ps / max(pn, 1.0))

    @property
    def loss(self) -> float:
        return self._reduced()[0]


def _dump_prediction_artifacts(out_dir, params, cfg, train_mols, val_mols):
    """Best-checkpoint prediction dumps, mirroring the reference's
    model_systems/ artifact set (padded (nmol, natom) arrays + name lists)."""
    from epnn_tpu.infer import Predictor

    pred = Predictor(params=params, cfg=cfg)
    art = os.path.join(out_dir, "artifacts")
    os.makedirs(art, exist_ok=True)
    for split, mols in (("train", train_mols), ("val", val_mols)):
        width = max(m.natoms for m in mols)
        charges = pred.predict_molecules(mols)
        preds = np.zeros((len(mols), width), np.float32)
        labs = np.zeros((len(mols), width), np.float32)
        for i, (m, q) in enumerate(zip(mols, charges)):
            preds[i, : m.natoms] = q
            if m.labels is not None:
                labs[i, : m.natoms] = m.labels
        np.save(os.path.join(art, f"{split}_pred_charges.npy"), preds)
        np.save(os.path.join(art, f"{split}_lab_charges.npy"), labs)
        np.save(os.path.join(art, f"{split}_names.npy"),
                np.array([m.name for m in mols]), allow_pickle=True)


@dataclasses.dataclass
class TrainResult:
    state: TrainState
    best_val_masked_mae: float
    best_val_padded_mae: float
    history: List[Dict[str, float]]


def _make_tb_writer(directory: str):
    """TensorBoard SummaryWriter from whichever backend is installed
    (torch.utils.tensorboard, then tensorboardX).  The flag was asked for
    explicitly, so an environment with neither is a hard error — a
    silently-dead observability flag is worse than none."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        try:
            from tensorboardX import SummaryWriter
        except Exception as e:
            raise RuntimeError(
                "tensorboard_dir is set but no SummaryWriter backend is "
                "available (tried torch.utils.tensorboard, tensorboardX): "
                f"{e}. Install one or drop --tensorboard; JSONL metrics "
                "(log_path) are always written.") from e
    return SummaryWriter(directory)


def train(
    mols: Sequence[Molecule],
    cfg: EPNNConfig,
    tc: TrainConfig,
    val_mols: Optional[Sequence[Molecule]] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    progress: bool = True,
) -> TrainResult:
    """Train an EPNN on a molecule list. If ``val_mols`` is None, an 80/20
    split with ``tc.split_seed`` is used (reference behavior)."""
    if tc.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if tc.near_window and tc.near_row_chunk == 0:
        raise ValueError("TrainConfig.near_window requires near_row_chunk "
                         "(windowed gathers exist on the chunked path)")
    if tc.near_row_chunk > 0 and not tc.remat:
        raise ValueError(
            "TrainConfig.near_row_chunk requires remat=True: without the "
            "round + chunk-body checkpoints the lax.map backward keeps "
            "every chunk's residuals alive at once, so the chunking saves "
            "no memory (pass --remat; the -1 auto policy forces remat for "
            "the huge buckets it chunks)")

    if val_mols is None:
        if tc.val_fraction <= 0.0:
            train_mols, val_mols = list(mols), []
        else:
            from epnn_tpu.data.dataset import train_val_split

            tr_idx, va_idx = train_val_split(len(mols), tc.val_fraction,
                                             tc.split_seed)
            train_mols = [mols[i] for i in tr_idx]
            val_mols = [mols[i] for i in va_idx]
    else:
        train_mols = list(mols)

    has_val = len(val_mols) > 0
    if not has_val:
        import warnings

        warnings.warn(
            "empty validation set: val metrics will be null, no best "
            "checkpoint is selected, and early stopping never fires — "
            "pass val_mols (CLI --val-data) or val_fraction > 0",
            stacklevel=2)

    table = table_for_n_elems(cfg.n_elems)
    train_buckets = bucket_molecules(train_mols, table, tc.bucket_multiple)
    val_buckets = bucket_molecules(val_mols, table, tc.bucket_multiple)

    model = EPNN(cfg)
    opt = make_optimizer(tc)
    state = create_state(cfg, tc, jax.random.key(tc.seed))
    if tc.init_from:
        state = state.replace(
            params=ckpt_io.load_params(tc.init_from, state.params)
        )
    start_epoch = 0
    best = float("inf")
    best_padded = float("inf")
    stale_evals = 0
    lr_now = tc.learning_rate
    lr_stale = 0

    if tc.resume and tc.checkpoint_dir and ckpt_io.has_checkpoint(tc.checkpoint_dir):
        meta = ckpt_io.load_meta(tc.checkpoint_dir)
        saved_accum = int(meta.get("grad_accum", 1))
        if saved_accum != tc.grad_accum:
            # the MultiSteps accumulator lives in opt_state, so the pytree
            # template would not match — fail with the cause, not a
            # serialization structure error
            raise ValueError(
                f"resume with grad_accum={tc.grad_accum} but the checkpoint "
                f"was trained with grad_accum={saved_accum}; resume with "
                f"the same value (the accumulator is part of the optimizer "
                f"state)")
        state = ckpt_io.load_train_state(tc.checkpoint_dir, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best = float(meta.get("best_val_masked_mae", best))
        best_padded = float(meta.get("best_val_padded_mae", best_padded))
        stale_evals = int(meta.get("stale_evals", 0))
        # the scaled LR itself lives in the restored opt_state; these are
        # the host-side mirrors (history logging + plateau counter)
        lr_now = float(meta.get("lr_now", lr_now))
        lr_stale = int(meta.get("lr_stale", 0))

    if mesh is not None:
        from epnn_tpu.parallel.sharding import shard_state

        state = shard_state(state, mesh)

    ema_params = None
    if tc.ema_decay is not None:
        ema_params = state.params  # inherits the mesh sharding, if any
        _ema_dir = (os.path.join(tc.checkpoint_dir, "ema")
                    if tc.checkpoint_dir else None)
        if tc.resume and _ema_dir and os.path.isdir(_ema_dir):
            ema_params = ckpt_io.load_params(_ema_dir, state.params)
        _d = float(tc.ema_decay)
        ema_step = jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda a, b: _d * a + (1.0 - _d) * b, e, p))

    # data-order RNG is re-derived per epoch from (seed, epoch) — a resumed
    # run at epoch E draws the SAME minibatch order an uninterrupted run
    # would have (no dependence on how many epochs this process replayed),
    # so crash/resume cannot silently change the training data sequence
    def epoch_rng(epoch: int) -> np.random.Generator:
        return np.random.default_rng([tc.seed, epoch])
    history: List[Dict[str, float]] = []
    log_f = open(tc.log_path, "a") if tc.log_path else None
    tb = _make_tb_writer(tc.tensorboard_dir) if tc.tensorboard_dir else None

    def put(mb, n_real):
        args = _batch_args(mb, n_real)
        if mesh is not None:
            from epnn_tpu.parallel.sharding import shard_batch_args

            args = shard_batch_args(args, mesh)
        return args

    # Big-graph buckets train through the fused path with an exact static
    # neighbor_k, computed once per bucket (host-side scan).  On a mesh with
    # an ``atoms`` axis > 1, they instead train atom-SHARDED: each graph's
    # pair grid spreads over the atoms axis (forward AND backward through
    # shard_map) — training graphs whose pair work exceeds one device.
    from epnn_tpu.data.dataset import round_up

    n_dev = mesh.shape.get("data", 1) if mesh is not None else 1
    n_atoms_axis = mesh.shape.get("atoms", 1) if mesh is not None else 1
    sharded_train = sharded_eval = None
    if n_atoms_axis > 1:
        from epnn_tpu.parallel.atom_shard import (
            make_sharded_eval_step,
            make_sharded_train_step,
        )

        # per-(neighbor_k, uniform_q0) step cache: small pads (k=None) use
        # the dense-featurized sharded form; big buckets the neighbor-split
        # one (O(N·k/D) featurized + remat'd rounds per device).  uniform_q0
        # is the round-1 far-field collapse — honored by the nbr forms only.
        _sh_cache: Dict[tuple, tuple] = {}

        def _sharded_steps(k: Optional[int], uq0: bool = False,
                           nch: int = 0):
            uq0 = bool(uq0) and k is not None
            nch = nch if k else 0
            if (k, uq0, nch) not in _sh_cache:
                # huge-N chunk/window (TrainConfig.near_row_chunk /
                # near_window, per-bucket auto via bucket_chunk_sharded)
                # thread into the neighbor-split atom-sharded step
                # (train()'s mesh path is always atom mode; ring training
                # goes through make_sharded_train_step directly).  A
                # chunked bucket forces remat for itself (chunking without
                # the chunk-body checkpoint saves no memory).
                _sh_cache[(k, uq0, nch)] = (
                    make_sharded_train_step(
                        cfg, opt, mesh, tc.loss, neighbor_k=k,
                        use_pallas=fused_pallas if k else False,
                        uniform_q0=uq0,
                        far_cluster=tc.far_cluster if k else 0,
                        far_cluster_grad=tc.far_cluster_grad,
                        remat=tc.remat or nch > 0,
                        near_row_chunk=nch,
                        near_window=tc.near_window if nch else 0),
                    make_sharded_eval_step(
                        cfg, mesh, tc.loss, neighbor_k=k,
                        use_pallas=fused_pallas if k else False,
                        uniform_q0=uq0,
                        near_row_chunk=nch,
                        near_window=tc.near_window if nch else 0),
                )
            return _sh_cache[(k, uq0, nch)]

        sharded_train = lambda k, uq0=False, nch=0: _sharded_steps(
            k, uq0, nch)[0]
        sharded_eval = lambda k, uq0=False, nch=0: _sharded_steps(
            k, uq0, nch)[1]
    fused_k: Dict[int, int] = {}
    # the packed far-field kernel (now differentiable via its custom VJP)
    # wins on TPU when the far field runs at default precision
    _dense_prec = cfg.dense_matmul_precision or cfg.matmul_precision or (
        "highest" if cfg.highest_precision else "default")
    try:
        _on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        _on_tpu = False
    fused_pallas = _on_tpu and _dense_prec == "default"
    if (_on_tpu and _dense_prec != "default"
            and any(pad > tc.dense_max_atoms for pad in train_buckets)):
        # imported reference checkpoints carry highest_precision=True (an
        # inference artifact-parity policy) — inheriting it into a big-graph
        # fine-tune disables the packed far-field kernel and runs HIGHEST-
        # precision matmuls (~2x slower at 17,760 atoms).  Runtime policy,
        # not architecture: overriding keeps the weights compatible.
        print("note: training big-graph buckets at non-default matmul "
              "precision (cfg.highest_precision/matmul_precision) — "
              "~2x slower and the packed far-field kernel is disabled; "
              "pass cfg.replace(matmul_precision='default') or CLI "
              "--precision fast unless you need parity-grade training")
    from epnn_tpu import infer as _infer_mod

    if tc.near_row_chunk == 0 and any(
            pad >= _infer_mod.HUGE_GRAPH_MIN_ATOMS for pad in train_buckets):
        import warnings

        # the r12 568k battery: full-width near activations flirt with
        # HBM at this scale and PLAIN gathers measured 5.8x slower than
        # windowed (39.6 vs 6.8 s/step) — benchmarks/RESULTS.md round 13
        warnings.warn(
            "huge-N training bucket (>=200k padded atoms) with "
            "TrainConfig.near_row_chunk=0 (explicitly off): the full-width "
            "near activations can OOM one chip and un-windowed gathers "
            "measured 5.8x slower at 568k atoms.  Use -1 (auto) or an "
            "explicit chunk (requires remat=True) and, with spatially "
            "sorted atoms, near_window (safe width from "
            "ops.fused.neighbor_window_width)",
            stacklevel=2)

    def bucket_chunk(pad: int) -> int:
        """Effective huge-N row chunk for a single-chip fused bucket
        (``TrainConfig.near_row_chunk``; -1 = the Predictor's balanced
        auto policy, off below the huge-N threshold or when the balanced
        chunk would not split the width)."""
        if tc.near_row_chunk >= 0:
            return tc.near_row_chunk
        if pad < _infer_mod.HUGE_GRAPH_MIN_ATOMS:
            return 0
        from epnn_tpu.ops.fused import balanced_row_chunk

        ch = balanced_row_chunk(pad, _infer_mod.HUGE_GRAPH_ROW_CHUNK)
        return ch if 0 < ch < pad else 0

    def bucket_chunk_sharded(pad: int) -> int:
        """Mesh twin: keyed on the GLOBAL padded width (the gather cliff
        is set by the global tables), sized to the per-device rows R —
        the Predictor's ``_near_chunk_sharded`` policy."""
        r_dev = max(pad // n_atoms_axis, 1)
        if tc.near_row_chunk >= 0:
            return tc.near_row_chunk if tc.near_row_chunk < r_dev else 0
        if pad < _infer_mod.HUGE_GRAPH_MIN_ATOMS:
            return 0
        from epnn_tpu.ops.fused import balanced_row_chunk

        ch = balanced_row_chunk(r_dev, _infer_mod.HUGE_GRAPH_ROW_CHUNK)
        return ch if 0 < ch < r_dev else 0

    if tc.near_window > 0 and not any(
            (bucket_chunk_sharded(pad) if n_atoms_axis > 1
             and pad % n_atoms_axis == 0 else bucket_chunk(pad))
            for pad in train_buckets):
        import warnings

        # windows exist only on the chunked path — with the -1 auto
        # default a sub-threshold dataset would otherwise silently
        # measure the un-windowed program (r4-round code review)
        warnings.warn(
            "TrainConfig.near_window is set but no training bucket will "
            "chunk (auto chunking engages at "
            f"{_infer_mod.HUGE_GRAPH_MIN_ATOMS} padded atoms; widest "
            f"bucket here: {max(train_buckets, default=0)}) — the window "
            "setting has no effect; set near_row_chunk explicitly to "
            "chunk smaller buckets", stacklevel=2)

    # round-1 far-field collapse (bitwise-identical on TPU, ~19% off the
    # protein-scale train step — scripts/tpu_profile_r6.py): bucket rows
    # come from pad_molecules so the contract normally holds, but verify
    # per bucket rather than assume (minibatch row-subset/tiling preserves
    # a bucket-level pass)
    _uq0_cache: Dict[int, bool] = {}

    def bucket_uq0(bucket: MolBatch) -> bool:
        if not tc.collapse_round1:
            return False
        key = id(bucket)
        if key not in _uq0_cache:
            from epnn_tpu.data.dataset import uniform_q0_contract

            _uq0_cache[key] = uniform_q0_contract(
                bucket.x, bucket.q0, bucket.node_mask)
        return _uq0_cache[key]

    def bucket_plan(pad: int, bucket: MolBatch):
        """(batch_size, neighbor_k or None) for one bucket."""
        bs = min(tc.batch_size, round_up(bucket.batch_size, n_dev))
        bs = max(bs - bs % n_dev, n_dev) if n_dev > 1 else bs
        if pad <= tc.dense_max_atoms:
            return bs, None
        key = id(bucket)  # train/val buckets can share a pad width but
        # hold different geometries — k must be per bucket object
        if key not in fused_k:
            from epnn_tpu.ops.fused import max_neighbor_count

            k = max(
                max_neighbor_count(bucket.xyz[b], bucket.node_mask[b],
                                   cfg.cutoff)
                for b in range(bucket.batch_size)
            )
            fused_k[key] = max(min(round_up(k + 4, 8), pad - 1), 1)
        return bs, fused_k[key]

    fused_block = tc.fused_block

    # TrainConfig.precompute_neighbors: per-bucket (B, N, k) idx/mask/d²
    # neighbor tables built ONCE and kept device-resident — training
    # geometries never move, so per-step in-forward selection is pure
    # recompute (the r9 trace: top_k = 40% of the 17,760-atom step's
    # device time).  Row-gathered in-graph per minibatch; charges are
    # bitwise-identical (same d² plane as in-forward selection).
    _nbr_cache: Dict[int, tuple] = {}

    def bucket_neighbors(bucket: MolBatch, k: Optional[int]):
        if not tc.precompute_neighbors or k is None:
            return None
        key = id(bucket)
        if key not in _nbr_cache:
            from epnn_tpu.infer import CELL_GRID_MIN_ATOMS
            from epnn_tpu.ops.fused import (build_neighbors_batch,
                                            build_neighbors_cell,
                                            cell_grid_params)

            if bucket.padded_atoms >= CELL_GRID_MIN_ATOMS:
                nc, cap = 1, 1
                for bi in range(bucket.batch_size):
                    c_, p_ = cell_grid_params(
                        bucket.xyz[bi], bucket.node_mask[bi],
                        float(cfg.cutoff))
                    nc, cap = max(nc, c_), max(cap, p_)
                nc, cap = round_up(nc, 512), round_up(cap, 4)
                # row_chunk: the builder's full-width candidate gather is
                # 8.67 GB padded at 568k — compile-time HBM OOM without
                # chunking (r12 battery)
                outs = [build_neighbors_cell(
                    bucket.xyz[bi], bucket.node_mask[bi],
                    float(cfg.cutoff), int(k), nc, cap, with_d2=True,
                    row_chunk=bucket_chunk(bucket.padded_atoms))
                    for bi in range(bucket.batch_size)]
                tabs = tuple(jnp.stack([o[j] for o in outs])
                             for j in range(3))
            else:
                tabs = tuple(build_neighbors_batch(
                    jnp.asarray(bucket.xyz), jnp.asarray(bucket.node_mask),
                    float(cfg.cutoff), int(k)))
            _nbr_cache[key] = jax.block_until_ready(tabs)
        return _nbr_cache[key]

    for epoch in range(start_epoch, tc.epochs):
        t0 = time.time()
        acc = MetricAccumulator()
        rng = epoch_rng(epoch)
        for pad, bucket in train_buckets.items():
            bs, k = bucket_plan(pad, bucket)
            for mb, n_real, rows in minibatches(bucket, bs, rng=rng,
                                                with_indices=True):
                if k is None:
                    state, loss, _, mets = train_step(
                        state, model, tc.loss, opt, *put(mb, n_real)
                    )
                elif sharded_train is not None and pad % n_atoms_axis == 0:
                    tabs = bucket_neighbors(bucket, k)
                    state, loss, _, mets = sharded_train(
                        k, bucket_uq0(bucket), bucket_chunk_sharded(pad))(
                        state, *_batch_args(mb, n_real),
                        neighbors=(tuple(t[np.asarray(rows)] for t in tabs)
                                   if tabs is not None else None)
                    )
                else:
                    tabs = bucket_neighbors(bucket, k)
                    nch = bucket_chunk(pad)
                    state, loss, _, mets = train_step_fused(
                        state, cfg, tc.loss, opt, min(fused_block, pad), k,
                        *put(mb, n_real), use_pallas=fused_pallas,
                        uniform_q0=bucket_uq0(bucket),
                        far_cluster=tc.far_cluster,
                        far_cluster_grad=tc.far_cluster_grad,
                        remat=tc.remat or nch > 0, nbr_tables=tabs,
                        nbr_rows=(jnp.asarray(rows, jnp.int32)
                                  if tabs is not None else None),
                        near_row_chunk=nch,
                        near_window=tc.near_window if nch else 0
                    )
                acc.update(loss, mets)
                if ema_params is not None:
                    ema_params = ema_step(ema_params, state.params)
        eval_params = state.params if ema_params is None else ema_params
        run_eval = has_val and (tc.eval_every <= 1
                                or (epoch + 1) % tc.eval_every == 0
                                or epoch == tc.epochs - 1)
        vacc = MetricAccumulator()
        for pad, bucket in (val_buckets.items() if run_eval else ()):
            bs, k = bucket_plan(pad, bucket)
            for mb, n_real, rows in minibatches(bucket, bs,
                                                with_indices=True):
                if k is None:
                    loss, _, mets = eval_step(
                        eval_params, model, tc.loss, *put(mb, n_real)
                    )
                elif sharded_eval is not None and pad % n_atoms_axis == 0:
                    tabs = bucket_neighbors(bucket, k)
                    loss, _, mets = sharded_eval(
                        k, bucket_uq0(bucket), bucket_chunk_sharded(pad))(
                        eval_params, *_batch_args(mb, n_real),
                        neighbors=(tuple(t[np.asarray(rows)] for t in tabs)
                                   if tabs is not None else None)
                    )
                else:
                    tabs = bucket_neighbors(bucket, k)
                    nch = bucket_chunk(pad)
                    loss, _, mets = eval_step_fused(
                        eval_params, cfg, tc.loss, min(fused_block, pad), k,
                        *put(mb, n_real), use_pallas=fused_pallas,
                        uniform_q0=bucket_uq0(bucket), nbr_tables=tabs,
                        nbr_rows=(jnp.asarray(rows, jnp.int32)
                                  if tabs is not None else None),
                        near_row_chunk=nch,
                        near_window=tc.near_window if nch else 0
                    )
                vacc.update(loss, mets)

        row = {
            "epoch": epoch,
            "train_loss": acc.loss,
            "train_masked_mae": acc.masked_mae,
            "train_padded_mae": acc.padded_mae,
            "val_loss": vacc.loss if run_eval else None,
            "val_masked_mae": vacc.masked_mae if run_eval else None,
            "val_padded_mae": vacc.padded_mae if run_eval else None,
            "seconds": time.time() - t0,
        }
        if tc.lr_plateau_factor is not None:
            row["lr"] = lr_now
        history.append(row)
        if log_f:
            log_f.write(json.dumps(row) + "\n")
            log_f.flush()
        if tb is not None:
            for key, val in row.items():
                if key != "epoch" and val is not None:
                    tb.add_scalar(key, val, epoch)
        if progress:
            vtxt = f"{vacc.masked_mae:.5f}" if run_eval else "—"
            print(
                f"epoch {epoch}: loss {acc.loss:.3e} "
                f"train MAE {acc.masked_mae:.5f} val MAE {vtxt} "
                f"({row['seconds']:.1f}s)",
                flush=True,
            )

        improved = run_eval and vacc.masked_mae < best
        if improved:
            best = vacc.masked_mae
            best_padded = vacc.padded_mae
        if run_eval:
            stale_evals = 0 if improved else stale_evals + 1
            if tc.lr_plateau_factor is not None:
                lr_stale = 0 if improved else lr_stale + 1
                if lr_stale >= tc.lr_plateau_patience:
                    state = state.replace(opt_state=_scale_plateau_lr(
                        state.opt_state, tc.lr_plateau_factor))
                    lr_now *= tc.lr_plateau_factor
                    lr_stale = 0
                    if progress:
                        print(f"plateau: LR -> {lr_now:.3e}", flush=True)
        if tc.checkpoint_dir:
            ckpt_io.save_train_state(
                tc.checkpoint_dir, state,
                meta={"epoch": epoch, "best_val_masked_mae": best,
                      "best_val_padded_mae": best_padded,
                      "stale_evals": stale_evals, "lr_now": lr_now,
                      "lr_stale": lr_stale, "step": int(state.step),
                      "grad_accum": tc.grad_accum},
            )
            if ema_params is not None:
                ckpt_io.save_params(
                    os.path.join(tc.checkpoint_dir, "ema"), ema_params, cfg
                )
            if improved:
                ckpt_io.save_params(
                    os.path.join(tc.checkpoint_dir, "best"), eval_params, cfg
                )
                if tc.dump_predictions:
                    _dump_prediction_artifacts(
                        tc.checkpoint_dir, eval_params, cfg,
                        train_mols, val_mols,
                    )
        if run_eval:
            if (tc.early_stop_patience is not None
                    and stale_evals >= tc.early_stop_patience):
                if progress:
                    print(f"early stop at epoch {epoch}: no val "
                          f"improvement in {stale_evals} evaluated epochs",
                          flush=True)
                break

    if log_f:
        log_f.close()
    if tb is not None:
        tb.close()
    return TrainResult(state=state, best_val_masked_mae=best,
                       best_val_padded_mae=best_padded, history=history)
