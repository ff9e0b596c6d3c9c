"""Blockwise fused forward pass — the TPU-native big-graph path.

The reference materializes the (N², 2F+E) pair-feature tensor for every MLP
evaluation (``charge_gn.py:62-68, 101-111``): at N=2,220 that is ~3.3 GB per
round per ordering, which is why its protein run is HBM-catastrophic and why a
naive port cannot scale.  This module restructures the same math so that the
N²-sized tensors never exist in HBM:

1. **Split first layer.**  The pair input is a concat ``[a_i, a_j, e_ij]``,
   so ``concat @ W1 = a_i @ W1_i + a_j @ W1_j + e_ij @ W1_e``.  The per-atom
   projections are (N, 32) matmuls done once per round; only the e-term needs
   per-pair work.
2. **On-the-fly RBF.**  Edge features are recomputed from coordinates inside
   each row block (flash-attention style) instead of being stored as an
   (N, N, 48) tensor — O(N·3) HBM reads replace O(N²·48).
3. **Row-block streaming.**  A ``lax.scan`` over row blocks keeps live
   intermediates at (block, N, 48), and both EPN pair orderings are evaluated
   inside the same block from the same projections, which keeps the
   antisymmetric transfer *bitwise* antisymmetric across blocks — total
   charge stays conserved under any block schedule.

Numerics note: the split-first-layer sum associates differently than the
reference's single K=166 matmul; the difference is fp32 rounding noise
(validated ≤2e-6 on the golden artifacts in tests/test_parity.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from epnn_tpu.featurize import MU_START
from epnn_tpu.models.config import EPNNConfig

HIGHEST = jax.lax.Precision.HIGHEST


def _resolve_precision(cfg):
    name = getattr(cfg, "matmul_precision", "") or (
        "highest" if cfg.highest_precision else "default"
    )
    return {
        "default": None,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def _split_dot(x, w, dims=None):
    """Manual bf16x3 split-float contraction: x and w are split into
    bf16 hi + lo halves and combined as x_hi·w_hi + x_hi·w_lo + x_lo·w_hi —
    three default-precision MXU passes with fp32 accumulation, ≈ fp32
    accuracy at ~half the cost of HIGHEST (bf16x6) and without the
    pathological slowness of XLA's Precision.HIGH on v5e."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    if dims is None:
        f = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    else:
        f = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            preferred_element_type=jnp.float32)
    return f(xh, wh) + (f(xh, wl) + f(xl, wh))


@dataclasses.dataclass(frozen=True)
class PairMLPWeights:
    """One pair MLP with its first layer split into [a_i | a_j | e] slices."""

    w1_i: jax.Array  # (F', H1)
    w1_j: jax.Array  # (F', H1)
    w1_e: jax.Array  # (E, H1)
    b1: jax.Array
    mids: Tuple[Tuple[jax.Array, jax.Array], ...]  # ((W, b), ...) hidden layers
    w_out: jax.Array
    b_out: jax.Array


jax.tree_util.register_pytree_node(
    PairMLPWeights,
    lambda w: ((w.w1_i, w.w1_j, w.w1_e, w.b1, w.mids, w.w_out, w.b_out), None),
    lambda _, c: PairMLPWeights(*c),
)


def _mlp_layers(tree: dict) -> List[Tuple[jax.Array, jax.Array]]:
    return [
        (tree[f"dense_{k}"]["kernel"], tree[f"dense_{k}"]["bias"])
        for k in range(len(tree))
    ]


def split_pair_mlp(tree: dict, cfg: EPNNConfig) -> PairMLPWeights:
    layers = _mlp_layers(tree)
    (w1, b1), mids, (wo, bo) = layers[0], layers[1:-1], layers[-1]
    f = cfg.atom_feat_dim
    return PairMLPWeights(
        w1_i=w1[:f], w1_j=w1[f:2 * f], w1_e=w1[2 * f:],
        b1=b1, mids=tuple(mids), w_out=wo, b_out=bo,
    )


@dataclasses.dataclass(frozen=True)
class FusedParams:
    """All model weights in fused-kernel layout.

    ``messages`` / ``passes`` are *round-stacked*: one PairMLPWeights whose
    leaves carry a leading T dimension, so the forward can ``lax.scan`` over
    rounds (10× smaller HLO than unrolling, same math — the reference's
    untied per-round MLPs become scan inputs).
    """

    messages: PairMLPWeights
    passes: PairMLPWeights
    update: Tuple[Tuple[jax.Array, jax.Array], ...]


jax.tree_util.register_pytree_node(
    FusedParams,
    lambda p: ((p.messages, p.passes, p.update), None),
    lambda _, c: FusedParams(*c),
)


def _stack_rounds(ws: List[PairMLPWeights]) -> PairMLPWeights:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ws)


def fuse_params(params: Any, cfg: EPNNConfig) -> FusedParams:
    """Convert a flax params pytree (epnn_tpu.models.EPNN) to fused layout."""
    p = params["params"] if "params" in params else params
    return FusedParams(
        messages=_stack_rounds(
            [split_pair_mlp(p[f"message_{t}"], cfg) for t in range(cfg.T)]
        ),
        passes=_stack_rounds(
            [split_pair_mlp(p[f"pass_{t}"], cfg) for t in range(cfg.T)]
        ),
        update=tuple(_mlp_layers(p["update"])),
    )


def _packed_mids(hid, w, prec, pack_to: int = 1):
    """Apply the mid Dense layers with pair rows packed into block-diagonal
    matmuls: (..., J, h) @ (h, h) becomes (..., J/p, p*h) @ kron(I_p, W) —
    per-element identical math (each h-segment multiplies its own W copy),
    but the MXU runs at full K=N=128 tile width instead of 4x-padded 32.
    Falls back to the plain chain when shapes don't divide."""
    *lead, j, h = hid.shape
    pack = max(1, pack_to // h)
    if pack == 1 or j % pack:
        for wm, bm in w.mids:
            hid = jax.nn.relu(jnp.dot(hid, wm, precision=prec) + bm)
        return hid
    hp = hid.reshape(*lead, j // pack, pack * h)
    for wm, bm in w.mids:
        wp = jnp.kron(jnp.eye(pack, dtype=wm.dtype), wm)
        bp = jnp.tile(bm, pack)
        hp = jax.nn.relu(jnp.dot(hp, wp, precision=prec) + bp)
    return hp.reshape(*lead, j, h)


def _apply_mlp(layers, x, prec=HIGHEST):
    for w, b in layers[:-1]:
        x = jax.nn.relu(jnp.dot(x, w, precision=prec) + b)
    w, b = layers[-1]
    return jnp.dot(x, w, precision=prec) + b


def rbf_and_gate(d2, cmask, cfg: EPNNConfig, dtype=jnp.float32):
    """Shared pair featurization: RBF edge features + electron-pass gate.

    The ONE implementation of the envelope/RBF/gate math used by every
    decomposed path (blocked, neighbor-gathered, ring-sharded) — mirrors
    :func:`epnn_tpu.featurize.rbf_edges` semantics (cosine envelope with the
    coincident-atom rule, reference ``charge_gn.py:122-163``) and the
    reference's is-near gate (``charge_gn.py:90-94``).

    Args:
      d2: squared pair distances, any shape (...,).
      cmask: multiplied into the envelope; carries pair validity AND the
        forced-zero diagonal/self rule (callers clear self pairs here).
      dtype: dtype of the returned rbf/gate.  Featurization math always
        runs in float32 (bf16 distances would smear the envelope edge);
        only the outputs are cast, so a bfloat16 compute_dtype confines
        itself to the MLP pipeline.

    Returns ``(rbf, gate)`` with shapes ``d2.shape + (e_dim,)`` / ``d2.shape``.
    """
    d2 = d2.astype(jnp.float32)
    cmask = cmask.astype(jnp.float32)
    d = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
    d = jnp.where(d2 > 0.0, d, 0.0)
    c = (jnp.cos(jnp.pi * d / cfg.cutoff) + 1.0) * 0.5
    c = jnp.where(d >= cfg.cutoff, 0.0, c)
    c = jnp.where(d <= 0.0, 1.0, c)
    c = c * cmask
    mu = jnp.linspace(MU_START, cfg.cutoff, cfg.e_dim, dtype=jnp.float32)
    rbf = c[..., None] * jnp.exp(-cfg.eta * (d[..., None] - mu) ** 2)
    # hard gate: any RBF channel above the tolerance (charge_gn.py:90-94)
    gate = (jnp.max(jnp.clip(rbf, cfg.is_near_tol, 1e5), axis=-1)
            != cfg.is_near_tol)
    if cfg.pass_weighting == "soft_envelope":
        gate = c  # decay-weighted passing instead of the hard gate
    return rbf.astype(dtype), gate.astype(dtype)


def _rbf_block(xyz_i, xyz_all, valid_pair, cfg: EPNNConfig,
               dtype=jnp.float32):
    """(B, N, e_dim) RBF features + (B, N) gate for one row block against all
    atoms (``valid_pair`` is built by the caller with the diagonal cleared)."""
    d2 = jnp.sum((xyz_i[:, None, :] - xyz_all[None, :, :]) ** 2, axis=-1)
    return rbf_and_gate(d2, valid_pair, cfg, dtype)


def _pad_rows(arr: jax.Array, block: int) -> jax.Array:
    n = arr.shape[0]
    rem = (-n) % block
    if rem:
        pad_width = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
        arr = jnp.pad(arr, pad_width)
    return arr


#: above this atom count, neighbor selection runs blockwise (the one-shot
#: (N, N) distance matrix would cost O(N^2) HBM - 1.3 GB fp32 at N~18K)
_NEIGHBOR_BLOCK_THRESHOLD = 4096
_NEIGHBOR_BLOCK = 1024


def block_neighbor_select(xyz_full, mask_full, start, xyz_rows, mask_rows,
                          cutoff: float, k: int, with_d2: bool = False):
    """The ONE copy of the within-cutoff candidate selection: rows
    [start, start+R) of the pair grid against all columns.  Used by
    :func:`build_neighbors` (start=0 or blockwise) and by the atom-sharded
    forward (start = the shard's row origin) — the superset/top_k contract
    must stay in sync between them.

    ``with_d2`` additionally returns the selected pairs' squared distances
    (the top_k scores are −d², so this is FREE) — featurization can then
    skip the (N, k, 3) coordinate gather and the distance recomputation
    entirely; values are bitwise identical (same subtract/square/sum on
    the same fp32 coordinates, gather merely reordered).  Invalid slots
    carry d² = 0, which downstream masking zeroes anyway."""
    n = xyz_full.shape[0]
    d2 = jnp.sum((xyz_rows[:, None, :] - xyz_full[None, :, :]) ** 2, axis=-1)
    rows = start + jnp.arange(xyz_rows.shape[0])
    not_self = rows[:, None] != jnp.arange(n)[None, :]
    cand = (d2 < cutoff * cutoff) & not_self
    cand &= (mask_rows[:, None] > 0) & (mask_full[None, :] > 0)
    score = jnp.where(cand, -d2, -jnp.inf)
    vals, idx = jax.lax.top_k(score, k)
    mask_out = (vals > -jnp.inf).astype(xyz_full.dtype)
    if with_d2:
        return idx, mask_out, jnp.where(vals > -jnp.inf, -vals, 0.0)
    return idx, mask_out


def build_neighbors(
    xyz: jax.Array, node_mask: jax.Array, cutoff: float, k: int,
    with_d2: bool = False,
):
    """(idx, nbr_mask)[, d2], each (N, k): candidate pairs within the cutoff.

    The candidate set {d < cutoff} is a strict superset of the reference's
    is-near gate (rbf can underflow the 1e-5 tolerance just inside the
    cutoff), and *everything* outside it has exactly-zero edge features
    (cosine envelope C = 0 at d >= cutoff), which is what makes the
    near/far split exact.  Requires k >= the true max neighbor count —
    enforce with :func:`max_neighbor_count` outside jit (top_k silently
    drops pairs otherwise, breaking antisymmetry).

    Selection is blockwise above ``_NEIGHBOR_BLOCK_THRESHOLD`` atoms: each
    row block scores its (block, N) distance slice and top-ks locally, so
    peak memory is O(block·N) instead of O(N²).
    """
    n = xyz.shape[0]

    def block_neighbors(start, xyz_rows, mask_rows):
        return block_neighbor_select(xyz, node_mask, start, xyz_rows,
                                     mask_rows, cutoff, k, with_d2=with_d2)

    if n <= _NEIGHBOR_BLOCK_THRESHOLD:
        return block_neighbors(0, xyz, node_mask)

    blk = _NEIGHBOR_BLOCK
    nb = -(-n // blk)
    xyz_b = _pad_rows(xyz, blk).reshape(nb, blk, 3)
    mask_b = _pad_rows(node_mask, blk).reshape(nb, blk)
    starts = jnp.arange(nb) * blk

    def scan_fn(carry, inp):
        start, xr, mr = inp
        return carry, block_neighbors(start, xr, mr)

    _, out = jax.lax.scan(scan_fn, None, (starts, xyz_b, mask_b))
    return tuple(a.reshape(nb * blk, k)[:n] for a in out)


@functools.partial(jax.jit, static_argnames=("cutoff", "k"))
def build_neighbors_batch(
    xyz: jax.Array, node_mask: jax.Array, cutoff: float, k: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched :func:`build_neighbors`: (B, N, k) idx + mask + d².

    Maps graphs sequentially rather than vmapping (batched top_k is the
    documented ~9× TPU pathology); intended for precomputing the
    ``neighbors`` argument of :func:`forward_blocked` once per geometry.
    The d² plane lets the forward skip the coordinate gather AND the
    distance recomputation (bitwise-identical featurization inputs).
    """
    if xyz.shape[0] == 1:
        i, m, d2 = build_neighbors(xyz[0], node_mask[0], cutoff, k,
                                   with_d2=True)
        return i[None], m[None], d2[None]
    return jax.lax.map(
        lambda a: build_neighbors(a[0], a[1], cutoff, k, with_d2=True),
        (xyz, node_mask),
    )


@jax.jit
def refresh_neighbor_d2(xyz: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N, k) squared distances for a FIXED neighbor index table from
    CURRENT coordinates — the Verlet-skin serving primitive: one (N, k, 3)
    gather + subtract/square/sum per graph, O(N·k) instead of the O(N²)
    selection.

    Same fp ops as :func:`block_neighbor_select`'s scoring (subtract,
    square, sum over 3 on the same f32 coordinates), so within-cutoff
    slots match a fresh selection's d² to the bit in practice; exactness
    of the downstream charges does not depend on that — any faithful d²
    feeds the same envelope/RBF math, and slots beyond the cutoff produce
    exactly-zero features (the superset contract,
    :func:`build_neighbors`).  Invalid slots gather arbitrary rows; the
    caller's ``nbr_mask`` zeroes them downstream as always."""
    return jax.vmap(
        lambda z, i: jnp.sum((z[:, None, :] - z[i]) ** 2, axis=-1)
    )(xyz, idx)


def max_neighbor_count(xyz, node_mask, cutoff: float) -> int:
    """Host-side exact max neighbor count (for choosing a safe static k).

    Above ``_NEIGHBOR_BLOCK_THRESHOLD`` atoms the count is computed by
    exact cell binning (vectorized O(N·27·cap) NumPy) instead of the
    O(N²) pairwise scan — the scan costs seconds at 17,760 atoms, which
    dominated every Verlet-skin rebuild in MD serving.  Both paths apply
    the identical ``d² < cutoff²`` predicate in f64, and every true
    neighbor is within ±1 cutoff-sided cell, so the results are equal by
    construction (regression test: tests/test_fused.py)."""
    import numpy as np

    xyz = np.asarray(xyz, np.float64)
    mask = np.asarray(node_mask) > 0
    if len(xyz) > _NEIGHBOR_BLOCK_THRESHOLD:
        return _max_neighbor_count_cells(xyz, mask, cutoff)
    return _max_neighbor_count_scan(xyz, mask, cutoff)


def _max_neighbor_count_scan(xyz, mask, cutoff: float) -> int:
    """The O(N²) blockwise pairwise scan (oracle for the cell-binned twin)."""
    import numpy as np

    best = 0
    for s in range(0, len(xyz), 512):
        rows = slice(s, min(s + 512, len(xyz)))
        d2 = ((xyz[rows, None, :] - xyz[None, :, :]) ** 2).sum(-1)
        near = (d2 < cutoff * cutoff) & mask[None, :] & mask[rows, None]
        for r in range(near.shape[0]):
            near[r, s + r] = False  # exclude self
        best = max(best, int(near.sum(1).max()) if near.size else 0)
    return best


def _max_neighbor_count_cells(xyz, mask, cutoff: float) -> int:
    """Exact cell-binned twin of the O(N²) count (see
    :func:`max_neighbor_count`): bin valid atoms into cutoff-sided cells,
    table them as (ncells, cap) padded rows, gather each atom's 27
    neighboring cells' members, and count ``d² < cutoff²`` in f64 —
    identical predicate, candidate superset guaranteed by the cell side."""
    import numpy as np

    pts = xyz[mask]
    n = len(pts)
    if n == 0:
        return 0
    lo = pts.min(0)
    cell = np.floor((pts - lo) / cutoff).astype(np.int64)
    dims = cell.max(0) + 1
    if int(np.prod(dims)) > 64 * n:
        # sprawling geometry: the dense cell table would dwarf the O(N²)
        # scan — compact the occupied cell ids instead of tabling them all
        return _max_neighbor_count_scan(xyz, mask, cutoff)
    strides = np.array([dims[1] * dims[2], dims[2], 1], np.int64)
    cid = cell @ strides
    order = np.argsort(cid, kind="stable")
    cid_sorted = cid[order]
    # rank within cell + capped table of member indices (+1; 0 = empty)
    uniq, start, counts = np.unique(cid_sorted, return_index=True,
                                    return_counts=True)
    cap = int(counts.max())
    rank = np.arange(n) - np.repeat(start, counts)
    ncells = int(np.prod(dims))
    table = np.zeros((ncells, cap), np.int64)
    table[cid_sorted, rank] = order + 1
    # 27-cell candidate gather per atom (clipped offsets may alias an
    # existing cell id — that only ADDS candidates, never drops one, and
    # the exact d² predicate discards them)
    offs = np.array([[dx, dy, dz] for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1) for dz in (-1, 0, 1)], np.int64)
    nbr_cells = cell[:, None, :] + offs[None, :, :]          # (n, 27, 3)
    valid_c = np.all((nbr_cells >= 0) & (nbr_cells < dims), axis=-1)
    nbr_ids = np.clip(nbr_cells, 0, dims - 1) @ strides       # (n, 27)
    cand = table[nbr_ids].reshape(n, 27 * cap)                # 1-based
    cand_ok = (cand > 0) & np.repeat(valid_c, cap, axis=1)
    ci = np.maximum(cand - 1, 0)
    d2 = ((pts[:, None, :] - pts[ci]) ** 2).sum(-1)
    near = cand_ok & (d2 < cutoff * cutoff) \
        & (ci != np.arange(n)[:, None])
    return int(near.sum(1).max())


def _CELL_INV(cutoff: float) -> float:
    """Shared binning reciprocal: cells of side cutoff/(1-1e-6) — slightly
    LARGER than the cutoff, so even with f32 rounding of the product a
    true neighbor pair (d < cutoff) is always within ±1 cell per axis."""
    return (1.0 - 1e-6) / cutoff


def cell_grid_params(xyz, node_mask, cutoff: float,
                     pad_cells: float = 1.25) -> Tuple[int, int]:
    """Host-side static grid bounds for :func:`build_neighbors_cell`:
    ``(ncells_pad, cell_cap)``.

    ``cell_cap`` is the exact max occupancy of one cutoff-sided cell (the
    superset contract's analog of ``k``); ``ncells_pad`` bounds nx·ny·nz,
    padded by ``pad_cells`` so MD-style coordinate drift doesn't force a
    recompile every step (the program is static in these two numbers)."""
    import numpy as np

    xyz = np.asarray(xyz, np.float32)
    m = np.asarray(node_mask) > 0
    pts = xyz[m]
    if len(pts) == 0:
        return 1, 1
    # mirror build_neighbors_cell's DEVICE binning bit-for-bit (f32
    # subtract + f32 reciprocal multiply): a boundary atom must land in
    # the same cell here as on device, or the exact cap bound is wrong
    cell = np.floor((pts - pts.min(0)) * np.float32(_CELL_INV(cutoff))
                    ).astype(np.int64)
    dims = cell.max(0) + 1
    _, counts = np.unique(cell, axis=0, return_counts=True)
    return (int(np.ceil(np.prod(dims) * pad_cells)), int(counts.max()))


def balanced_row_chunk(n: int, max_chunk: int, align: int = 256) -> int:
    """Row-chunk size ≤ ``max_chunk`` that minimizes pad waste at width
    ``n``: the chunked paths pad N up to a chunk multiple, so a fixed
    chunk can silently add up to one chunk of dead rows (the r10 568k
    sweep measured the cost pad-proportional: 15% pad → 14% slower).
    Uses the same chunk COUNT as ``max_chunk`` would, with the size
    rebalanced to ``ceil(n/chunks)`` rounded up to ``align`` rows (one
    sublane×lane f32 tile per 8·k columns keeps layouts unchanged)."""
    if max_chunk <= 0 or n <= max_chunk:
        return max_chunk
    nch = -(-n // max_chunk)
    return min(max_chunk, -(-(-(-n // nch)) // align) * align)


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def _window_width_jit(idx, nbr_mask, row_chunk: int):
    """Device twin of :func:`neighbor_window_width` (un-aligned raw
    width): max over row chunks of (max valid idx − min valid idx + 1),
    chunking restarting at row 0 of every leading-batch entry."""
    n, k = idx.shape[-2], idx.shape[-1]
    nck = -(-n // row_chunk) * row_chunk
    idx3 = idx.reshape(-1, n, k)
    m3 = nbr_mask.reshape(-1, n, k) > 0
    pad = [(0, 0), (0, nck - n), (0, 0)]
    lo = jnp.where(m3, idx3, n - 1)
    hi = jnp.where(m3, idx3, 0)
    lo = jnp.pad(lo, pad, constant_values=n - 1).reshape(
        idx3.shape[0], nck // row_chunk, -1)
    hi = jnp.pad(hi, pad).reshape(idx3.shape[0], nck // row_chunk, -1)
    return jnp.maximum(jnp.max(hi.max(-1) - lo.min(-1)) + 1, 1)


def cell_sort_key(xyz: np.ndarray, cutoff: float):
    """Host-side z-major cutoff-sided cell key (the r7g serving ordering
    — the ONE definition shared by ``Predictor._spatial_view``, bench.py's
    17,760 system and the huge-N batteries).  Returns ``(key, span)``:
    ``np.argsort(key, kind='stable')`` is the cell-sorted atom order, and
    any near pair (d ≤ cutoff) differs by at most ±1 cell per axis, so
    its sorted keys differ by at most ``span`` = nmax²+nmax+1 — the
    cold-path window bound."""
    xyz = np.asarray(xyz)
    cell = np.floor((xyz - xyz.min(0)) / float(cutoff)).astype(np.int64)
    nmax = int(cell.max()) + 1 if cell.size else 1
    key = (cell[:, 0] * nmax + cell[:, 1]) * nmax + cell[:, 2]
    return key, nmax * nmax + nmax + 1


def neighbor_window_width(idx, nbr_mask, row_chunk: int,
                          align: int = 4096,
                          table_rows: int | None = None) -> int:
    """Host-side safe ``near_window`` for windowed huge-N gathers: the max
    over row chunks of (max valid neighbor index − min valid + 1), rounded
    up to ``align`` rows (stable static shapes across similar geometries).
    Compact only when atoms are spatially ordered (cell-sorted); a random
    atom order returns ~n, which the forward treats as "window off".
    One O(N·k) pass over the selection tables — negligible next to a
    build; cache it per geometry alongside k.

    ``table_rows`` — height of the GLOBAL table the window will slide
    over, when ``idx`` is only a row SLICE of it (the sharded mesh path
    measures per-device slices whose neighbor indices stay global).  The
    result is clamped at the table height, never the slice height: a
    clamp at the slice height would silently undersize the window and
    mask-drop real pairs on any ≥2-device atom mesh."""
    if row_chunk <= 0:
        return 0
    n_tbl = int(table_rows) if table_rows is not None \
        else int(np.asarray(idx).shape[-2]) if not isinstance(idx, jax.Array) \
        else int(idx.shape[-2])
    if isinstance(idx, jax.Array) or isinstance(nbr_mask, jax.Array):
        # device tables (the huge-N serving caches): one reduction on
        # device + a scalar readback beats downloading a 91 MB idx table
        w = int(_window_width_jit(jnp.asarray(idx), jnp.asarray(nbr_mask),
                                  row_chunk))
        return min(-(-max(w, 1) // align) * align, n_tbl)
    idx = np.asarray(idx)
    m = np.asarray(nbr_mask) > 0
    n = int(idx.shape[-2])
    # chunking restarts at row 0 of every graph (the chunked path runs
    # per single graph), so scan each batch entry independently
    idx3 = idx.reshape(-1, n, idx.shape[-1])
    m3 = m.reshape(-1, n, m.shape[-1])
    width = 1
    for b in range(idx3.shape[0]):
        for s in range(0, n, row_chunk):
            mc = m3[b, s:s + row_chunk]
            if not mc.any():
                continue
            ic = idx3[b, s:s + row_chunk][mc]
            width = max(width, int(ic.max()) - int(ic.min()) + 1)
    return min(-(-width // align) * align, n_tbl)


@functools.partial(jax.jit,
                   static_argnames=("cutoff", "k", "ncells_pad", "cell_cap",
                                    "with_d2", "table_layout", "count_only",
                                    "row_chunk"))
def build_neighbors_cell(
    xyz: jax.Array, node_mask: jax.Array, cutoff: float, k: int,
    ncells_pad: int, cell_cap: int, with_d2: bool = False,
    table_layout: str = "slices", count_only: bool = False,
    row_chunk: int = 0,
):
    """Cell-list neighbor selection: same ``(idx, nbr_mask[, d2])`` contract
    as :func:`build_neighbors`, built from a spatial grid instead of an
    O(N²) score matrix — the standard MD answer to top_k being ~40% of
    cold large-N latency (benchmarks/RESULTS.md).

    Atoms are binned into cutoff-sided cells laid out as a padded
    ``(ncells_pad+1, cell_cap)`` table (sort by cell id + rank-in-cell
    scatter); each atom's candidates are the 27 neighboring cells' rows —
    27 row-gathers per atom instead of an N-wide score row, then one
    top_k over 27·cell_cap candidates.  Exactness: a true neighbor is
    within ±1 cell on every axis (cell side = cutoff) and within its
    cell's first ``cell_cap`` slots, so the candidate set is a strict
    superset of {d < cutoff}; the same top_k + d²-score tail as
    :func:`block_neighbor_select` keeps the output contract identical.

    ``ncells_pad``/``cell_cap`` are STATIC (get them from
    :func:`cell_grid_params`); like ``k``, undersizing ``cell_cap``
    silently drops pairs — honor the contract.

    ``count_only=True`` returns just the scalar max per-row candidate
    count from the same predicate (``k`` unused) — the exact safe ``k``
    for a subsequent full build, computed on device in O(N·27·cap).

    ``table_layout`` selects the device layout of the cell table and the
    candidate fetch (identical outputs bit-for-bit — the candidate
    enumeration order is the same (cell-major, slot-minor) in all three):

    * ``"slices"`` — DEFAULT: channel-blocked flat table rows
      (ncells+1, 5·cap) — one gathered row per neighbor cell is a
      single 5·cap-lane vector [x·cap | y·cap | z·cap | mask·cap |
      id·cap] instead of a (cap, 5) slab of lane-padded 5-wide
      sublanes — and downstream consumes lane SLICES of the
      (N, 27, 5·cap) gather directly (no channel transpose at all);
      only the final top_k score/cand pair is reshaped.  Measured
      (r5 battery, v5e): builder 19.4 → 11.8 ms at N=17,760
      (cold forward 124.7 → 117.2), 5.1 → 4.0 ms at N=2,220.
    * ``"flat"`` — same flat table, but a channel-major transpose after
      the gather (between rows and slices at both sizes).
    * ``"rows"`` — (ncells+1, cap, 5) slot-major rows (the r4 layout).

    ``row_chunk`` (static, ``"slices"`` layout only) — process the
    per-row candidate scoring/sort in ``lax.map`` chunks of this many
    atoms.  The full-width gather materializes (N, 27, 5·cap) — tile-
    padded ~16 GB at N=568,320, cap=16, which OOMs one v5e (r10
    battery); chunking bounds peak memory at O(row_chunk·27·cap) with
    bitwise-identical outputs (every op in the scoring pipeline is
    row-independent, including the per-row stable sort).  0 = off.
    """
    n = xyz.shape[0]
    xyz = xyz.astype(jnp.float32)
    real = node_mask > 0
    big = jnp.float32(3e38)
    origin = jnp.min(jnp.where(real[:, None], xyz, big), axis=0)
    c3 = jnp.floor((xyz - origin) * np.float32(_CELL_INV(cutoff))
                   ).astype(jnp.int32)
    c3 = jnp.clip(c3, 0, jnp.int32(2**30))
    dims = jnp.max(jnp.where(real[:, None], c3, 0), axis=0) + 1
    lid = c3[:, 0] + dims[0] * (c3[:, 1] + dims[1] * c3[:, 2])
    lid = jnp.where(real, jnp.minimum(lid, ncells_pad - 1), ncells_pad)

    # Slot assignment within each cell: sort by cell id + segment rank.
    # argsort is stable, so within a cell ranks run in ascending atom
    # index — the same slot order the r4 scatter-min claim loop produced
    # (bit-identical tables).  The claim loop was DELETED in r5: its cost
    # grows with cell_cap (cap scatter-min rounds ≈ 5.8 ms at N=17,760 on
    # v5e) while the one sort costs ~0.1 ms at every measured size
    # (scripts/tpu_profile_r5b.py; the earlier "identical on v5e" r4
    # reading was scan-harness floor).
    pos = jnp.arange(n, dtype=jnp.int32)
    tbl_len = (ncells_pad + 1) * cell_cap
    order = jnp.argsort(lid)                     # (N,) sorted-pos -> orig
    s_lid = lid[order]
    head = jnp.concatenate([jnp.ones((1,), bool),
                            s_lid[1:] != s_lid[:-1]])
    first = jax.lax.cummax(jnp.where(head, pos, 0))
    rank = pos - first
    slot = jnp.where(rank < cell_cap, s_lid * cell_cap + rank, tbl_len)
    tbl_ids = jnp.full((tbl_len,), n, jnp.int32)
    tbl_ids = tbl_ids.at[slot].set(order.astype(jnp.int32), mode="drop")

    # ONE 5-channel f32 table [x, y, z, mask, orig_id] in (cell, slot)
    # layout, so the per-atom candidate fetch is a single 27-row gather
    # (ids ride as f32 — exact to 2^24 >> any N); unfilled slots map to
    # the sentinel row of xyzmi_ext (mask 0, id n)
    xyzmi = jnp.concatenate(
        [xyz, node_mask.astype(jnp.float32)[:, None],
         pos.astype(jnp.float32)[:, None]], axis=1)  # (N, 5) by orig id
    xyzmi_ext = jnp.concatenate(
        [xyzmi, jnp.asarray([[0.0, 0.0, 0.0, 0.0, float(n)]], jnp.float32)],
        axis=0)
    tblx = xyzmi_ext[jnp.minimum(tbl_ids, n)].reshape(
        ncells_pad + 1, cell_cap, 5)

    # 27 neighbor-cell ids per atom (invalid/off-grid -> sentinel row)
    offs = jnp.asarray(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         for dz in (-1, 0, 1)], jnp.int32)       # (27, 3)
    nc = c3[:, None, :] + offs[None, :, :]       # (N, 27, 3)
    ok = jnp.all((nc >= 0) & (nc < dims[None, None, :]), axis=-1)
    nlid = nc[..., 0] + dims[0] * (nc[..., 1] + dims[1] * nc[..., 2])
    nlid = jnp.where(ok & real[:, None], jnp.minimum(nlid, ncells_pad - 1),
                     ncells_pad)

    cut2 = cutoff * cutoff
    self_id = jnp.arange(n, dtype=jnp.int32)
    if row_chunk and table_layout != "slices":
        raise ValueError("row_chunk is supported for the 'slices' layout "
                         "only (the default)")
    if table_layout in ("flat", "slices"):
        # channel-blocked flat rows: one gathered row per neighbor cell
        # is a single 5·cap-lane vector [x·cap | y·cap | z·cap |
        # mask·cap | id·cap] — the gather fetches 27 wide rows per atom
        # instead of 27 (cap, 5) slabs of 5-lane (→128-pad) sublanes
        tblf = jnp.transpose(tblx, (0, 2, 1)).reshape(
            ncells_pad + 1, 5 * cell_cap)

        def _score_rows(xyz_r, real_r, nlid_r, self_r):
            """dkey/cand for a set of rows — every op is row-independent,
            so the chunked path below maps this bitwise-identically."""
            m = xyz_r.shape[0]
            cxf = tblf[nlid_r]                    # (m, 27, 5·cap)
            cc = cell_cap
            xs, ys, zs = (cxf[:, :, i * cc:(i + 1) * cc] for i in range(3))
            ms_, ids = cxf[:, :, 3 * cc:4 * cc], cxf[:, :, 4 * cc:5 * cc]
            d2_3 = ((xyz_r[:, 0:1, None] - xs) ** 2
                    + (xyz_r[:, 1:2, None] - ys) ** 2
                    + (xyz_r[:, 2:3, None] - zs) ** 2)
            cand3 = ids.astype(jnp.int32)
            valid3 = ((cand3 < n) & (cand3 != self_r[:, None, None])
                      & (ms_ > 0) & real_r[:, None, None] & (d2_3 < cut2))
            dkey = jnp.where(valid3, d2_3, jnp.inf).reshape(
                m, 27 * cell_cap)
            return dkey, cand3.reshape(m, 27 * cell_cap)

        if row_chunk:
            npad = -(-n // row_chunk) * row_chunk
            nch = npad // row_chunk

            def pad_rows(a, fill):
                return jnp.pad(a, [(0, npad - n)] + [(0, 0)] * (a.ndim - 1),
                               constant_values=fill)

            def rs(a):
                return a.reshape(nch, row_chunk, *a.shape[1:])

            ops = (rs(pad_rows(xyz, 0.0)), rs(pad_rows(real, False)),
                   rs(pad_rows(nlid, ncells_pad)),
                   rs(jnp.arange(npad, dtype=jnp.int32)))

            if count_only:
                counts = jax.lax.map(
                    lambda a: jnp.max(jnp.sum(
                        (_score_rows(*a)[0] < jnp.inf).astype(jnp.int32),
                        axis=1)), ops)
                return jnp.max(counts)

            def chunk(a):
                dkey_c, cand_c = _score_rows(*a)
                ds, cs = jax.lax.sort((dkey_c, cand_c), dimension=1,
                                      is_stable=True, num_keys=1)
                return ds[:, :k], cs[:, :k]

            dss, css = jax.lax.map(chunk, ops)
            dk = dss.reshape(npad, k)[:n]
            idx = jnp.clip(css.reshape(npad, k)[:n], 0, n - 1)
            nbr_mask = (dk < jnp.inf).astype(xyz.dtype)
            if with_d2:
                return idx, nbr_mask, jnp.where(dk < jnp.inf, dk, 0.0)
            return idx, nbr_mask

        if table_layout == "flat":
            cxf = tblf[nlid]                      # (N, 27, 5·cap)
            cx4 = cxf.reshape(n, 27, 5, cell_cap)
            cxT = jnp.transpose(cx4, (2, 0, 1, 3)).reshape(
                5, n, 27 * cell_cap)
        else:
            dkey, cand = _score_rows(xyz, real, nlid, self_id)
    else:
        cx = tblx[nlid].reshape(n, 27 * cell_cap, 5)
        # channel-major relayout: the gathered (N, C, 5) array has a
        # 5-wide minor dim (lane-padded ~25× on TPU — its slices/fusions
        # were ~1.6 ms/inference at protein scale in the r4 cold trace);
        # one explicit transpose makes every downstream elementwise op
        # run over the lane-aligned C axis
        cxT = jnp.transpose(cx, (2, 0, 1))       # (5, N, C)
    if table_layout != "slices":
        cand = cxT[4].astype(jnp.int32)          # (N, C) original ids
        d2 = ((xyz[:, 0:1] - cxT[0]) ** 2 + (xyz[:, 1:2] - cxT[1]) ** 2
              + (xyz[:, 2:3] - cxT[2]) ** 2)
        valid = ((cand < n)
                 & (cand != self_id[:, None])
                 & (cxT[3] > 0) & real[:, None]
                 & (d2 < cut2))
        dkey = jnp.where(valid, d2, jnp.inf)
    if count_only:
        # exact max per-row neighbor count from the SAME f32 candidate
        # predicate the full build applies — the safe-k the subsequent
        # build needs by construction (self-consistent, no f64-vs-f32
        # borderline risk); k is unused in this mode
        return jnp.max(jnp.sum((dkey < jnp.inf).astype(jnp.int32), axis=1))
    # top_k over −d² == one ascending stable sort by d² CARRYING the
    # candidate ids as payload.  XLA lowers top_k to exactly this sort
    # (iota payload) plus a take_along element gather that cost 5.8 ms at
    # N=17,760 (r5b trace fusion.246); sorting the payload directly keeps
    # the sort cost identical (same operand count/types) and deletes the
    # gather.  Outputs are bitwise identical: both sorts are stable, so
    # equal-d² ties keep candidate order — top_k's lowest-index-first rule.
    dsort, csort = jax.lax.sort((dkey, cand), dimension=1, is_stable=True,
                                num_keys=1)
    dk = dsort[:, :k]
    idx = jnp.clip(csort[:, :k], 0, n - 1)
    nbr_mask = (dk < jnp.inf).astype(xyz.dtype)
    if with_d2:
        return idx, nbr_mask, jnp.where(dk < jnp.inf, dk, 0.0)
    return idx, nbr_mask


def _rbf_gathered(xyz_i, xyz_nbr, nbr_mask, cfg: EPNNConfig,
                  dtype=jnp.float32):
    """RBF + gate for gathered neighbor pairs. xyz_i: (N,3), xyz_nbr: (N,K,3)."""
    d2 = jnp.sum((xyz_i[:, None, :] - xyz_nbr) ** 2, axis=-1)
    return rbf_and_gate(d2, nbr_mask, cfg, dtype)


def _forward_single_nbr(
    fused: FusedParams,
    x: jax.Array,
    q0: jax.Array,
    xyz: jax.Array,
    node_mask: jax.Array,
    cfg: EPNNConfig,
    block: int,
    k: int,
    use_pallas: bool = False,
    pack_to: int = 1,
    remat: bool = False,
    neighbors: Tuple[jax.Array, jax.Array] | None = None,
    neighbor_grid: Tuple[int, int] | None = None,
    compat_width: int | None = None,
    uniform_q0: bool = False,
    far_cluster: int = 0,
    far_diag: bool = False,
    far_cluster_grad: bool = False,
    near_row_chunk: int = 0,
    near_window: int = 0,
) -> jax.Array:
    """Neighbor-split forward: exact same math as :func:`_forward_single`
    (up to fp summation order) at O(N·k) edge work instead of O(N²).

    ``near_row_chunk`` (static) — huge-N memory mode: when > 0, the
    (N, k, ·) near-field activations (gathered projections, RBF features,
    both pass-round MLP chains) never materialize full-width — each round
    runs them in ``lax.map`` chunks of this many rows, recomputing the
    chunk's RBF/gate from the resident (N, k) d² plane.  Outputs are
    BITWISE identical (every near op is row-independent, including the
    per-row j-sums, and both orderings of a pair still read the same
    full-width projections — conservation's antisymmetry argument is
    unchanged).  The full-width pass-round gather alone asked 16 GB of
    HBM at N=568,320, k=40 (r10 battery OOM); chunks bound it at
    O(chunk·k·h).  0 = off (the measured-fastest mode at benchmark
    sizes).

    ``near_window`` (static, requires ``near_row_chunk``) — windowed
    gathers for huge N: v5e gathers run at ~2.8 ns/row while the source
    table fits XLA's on-chip staging (< ~56 MB) and fall off a cliff to
    ~10.9 ns/row past it (r11 gatherbench/gathercliff; locality and
    index order are NEUTRAL — the unit is a row dispatch).  When > 0,
    each chunk's per-round pj/pp gathers read from a
    ``dynamic_slice(table, (start_c, 0), (near_window, width))`` window
    at window-relative indices, where ``start_c`` is the chunk's min
    valid neighbor index (computed in-graph) clipped to keep the slice
    in bounds.  Values are BITWISE identical to the unwindowed gather
    PROVIDED every chunk's neighbor-index spread fits the window —
    true when atoms are spatially ordered (cell-sorted) and
    ``near_window`` ≥ :func:`neighbor_window_width`; out-of-window
    entries are deterministically mask-dropped (never garbage reads),
    which surfaces a misconfigured width as a conservation error
    rather than noise.  Measured 4.1× on the gather bill at 568k
    (58.6 vs 242.2 ms for 22.8M rows).  0 = off; ignored when ≥ n.

    ``far_cluster`` (static) — opt-in APPROXIMATE serving tier: when > 0,
    every non-collapsed message round replaces the O(N²) no-feature dense
    reduction with a count-weighted O(N·C) grid over C weighted-k-means
    centroids of the ``pj`` rows (``ops/cluster.py``).  The near
    correction and ALL electron-passing rounds stay exact, so charge
    conservation is untouched (charges only move in the pass rounds); the
    error enters through h only and is bounded per round by
    ``Σ_j jvec_j · L(mids∘w_out) · max_radius`` (see
    :func:`epnn_tpu.ops.cluster.mids_lipschitz_bound`).  ``far_diag``
    (static) additionally returns the max intra-cluster radius over rounds
    — the measured factor in that bound.

    ``uniform_q0`` (static) asserts the caller's contract that every valid
    atom carries the same initial charge (the ``pad_molecules`` convention
    ``q0 = Q/n``, zeros on padding) and that x rows follow the
    ``ElementTable.feature_row`` layout ``[Z, onehot]`` (zeros on padding)
    — then message round 1 is special: h is still zero and q is still q0,
    so the j-side projection ``a_j @ w1_j`` (no bias) takes at most
    ``n_elems`` distinct values — one per element plus the all-zero
    padding row.  The O(N²) no-feature dense reduction of round 1
    collapses exactly to a count-weighted (N, E+1) grid; the only fp
    difference vs the dense sum is summation association.  Rounds 2+
    (h ≠ 0) run unchanged.

    Key identity: beyond the cutoff the RBF features are exactly zero, so a
    far pair's first-layer activation is ``relu(pi_i + pj_j + b1)`` — no
    featurization, no epart matmul.  Each message round therefore splits:

      Σ_j hid(full)_ij = Σ_j hid(nofeat)_ij                (dense, cheap)
                       − Σ_{near j} hid(nofeat)_ij         (gathered, O(Nk))
                       + Σ_{near j} hid(full)_ij           (gathered, O(Nk))

    and the electron-passing rounds are gate-limited to near pairs, so they
    run entirely on the gathered O(N·k) set.  Antisymmetry stays bitwise
    (both orderings of a near pair are evaluated from identical projections
    on both rows), so conservation is unaffected.
    """
    # With the Pallas far-field kernel, pad the ATOM AXIS once at entry to
    # the kernel's tile lcm instead of padding pi/pj per message round: the
    # projections then come out of their producing matmuls already at the
    # padded width, and the per-round pad copies (0.21 ms/inference of
    # device time at protein scale, parsed trace r4 — the residue of the
    # r3 "0.22 ms of copies" after the in-tile lane spread) never exist.
    # Padded rows carry node_mask 0, so every other term is unchanged.
    # COMPAT NOTE: with mask_messages=False the Q10 semantics count ALL
    # columns of the caller's padded width — growing that width naively
    # would add the new zero rows to every message sum and inflate
    # msg_count (hidden on the trained reference checkpoints only because
    # their update MLP saturates; garbage with random weights — see
    # tests/test_fused.py::test_entry_padding_compat_mode_unchanged).
    # The recursion therefore pins ``compat_width`` to the ORIGINAL width
    # so the compat sums run over exactly the caller's columns.
    if far_diag and far_cluster <= 0:
        raise ValueError("far_diag requires far_cluster > 0")
    dense_name_pre = getattr(cfg, "dense_matmul_precision", "")
    if (use_pallas and dense_name_pre != "bf16x3" and x.shape[0] >= 128
            and compat_width is None):
        from epnn_tpu.ops.pallas_kernels import dense_message_pad

        h1_pre = int(fused.messages.b1.shape[-1])
        lcm = dense_message_pad(128, 64, h1_pre)
        n0 = x.shape[0]
        n_pad0 = int(-(-n0 // lcm) * lcm)
        if n_pad0 != n0:
            pad_n = n_pad0 - n0

            def _pad0(a):
                return jnp.pad(a, [(0, pad_n)] + [(0, 0)] * (a.ndim - 1))

            if neighbors is not None:
                # pad neighbor rows with idx 0 / mask 0 (d2 0 if present)
                neighbors = tuple(_pad0(a) for a in neighbors)
            out = _forward_single_nbr(
                fused, _pad0(x), _pad0(q0), _pad0(xyz), _pad0(node_mask),
                cfg, block=block, k=k, use_pallas=use_pallas,
                pack_to=pack_to, remat=remat, neighbors=neighbors,
                neighbor_grid=neighbor_grid,
                compat_width=None if cfg.mask_messages else n0,
                uniform_q0=uniform_q0, far_cluster=far_cluster,
                far_diag=far_diag, far_cluster_grad=far_cluster_grad,
                near_row_chunk=near_row_chunk, near_window=near_window,
            )
            if far_diag:
                return out[0][:n0], out[1]
            return out[:n0]

    n = x.shape[0]
    nb = -(-n // block)
    prec = _resolve_precision(cfg)

    # NOTE: neighbor selection stays on XLA top_k.  The Pallas alternative
    # (pallas_kernels.neighbor_compact, same candidate set built in one pass
    # over the pair grid) measured 10× SLOWER on v5e (396 vs 41 ms at
    # N=17,760) — the (BI, BJ, k) one-hot emit dominates; kept as a tested
    # option for hardware/shapes where top_k is the pathology.
    # ``neighbors`` (from :func:`build_neighbors`, shape-(N, k)) skips the
    # selection entirely — repeated inference on a fixed geometry (the
    # reference infer.py's own loop shape) saves its full cost per call.
    # A 3-tuple additionally carries the selected pairs' d² (free from the
    # top_k scores), which also skips the (N, k, 3) coordinate gather and
    # the distance recomputation — bitwise-identical featurization.
    d2_nbr = None
    if neighbors is not None:
        if len(neighbors) == 3:
            idx, nbr_mask, d2_nbr = neighbors
        else:
            idx, nbr_mask = neighbors
    elif neighbor_grid is not None:
        # static tuple: (ncells_pad, cell_cap[, table_layout[, row_chunk]])
        # — row_chunk bounds the in-forward builder's peak memory at huge
        # N (the full-width candidate gather OOMs one chip near 500k atoms)
        idx, nbr_mask, d2_nbr = build_neighbors_cell(
            xyz, node_mask, cfg.cutoff, k, neighbor_grid[0],
            neighbor_grid[1], with_d2=True,
            table_layout=(neighbor_grid[2] if len(neighbor_grid) > 2
                          else "slices"),
            row_chunk=(neighbor_grid[3] if len(neighbor_grid) > 3 else 0))
    else:
        idx, nbr_mask, d2_nbr = build_neighbors(xyz, node_mask, cfg.cutoff,
                                                k, with_d2=True)
    nbr_mask = nbr_mask.astype(x.dtype)  # selection runs on fp32 coords
    if near_row_chunk:
        # huge-N memory mode (see docstring): only the (N, k) selection
        # tables stay resident; RBF/gate and every gathered MLP chain run
        # per chunk inside the rounds.  Chunk operands are built once.
        nck = -(-n // near_row_chunk) * near_row_chunk
        _nch = nck // near_row_chunk

        def _crs(a, fill=0):
            ap = jnp.pad(a, [(0, nck - n)] + [(0, 0)] * (a.ndim - 1),
                         constant_values=fill)
            return ap.reshape(_nch, near_row_chunk, *a.shape[1:])

        idx_ck = _crs(idx)
        mask_ck = _crs(nbr_mask)
        # aux carries the chunk's distance source: the d² plane when the
        # selection provided one.  Without one (the skin-MD 2-tuple), the
        # plane is computed from the CURRENT coordinates here, ONCE per
        # step — letting the rounds recompute it per chunk would pay the
        # xyz gather + d² arithmetic 2·T times (r12 battery at 568k:
        # 2,546 ms/step vs ~1.1 s fixed-geometry).  The xyz table is tiny
        # (N·3·4 B — always sub-cliff), so a plain gather is right, and
        # the expression matches _rbf_gathered's d² bitwise.
        d2_from_sel = d2_nbr is not None
        if d2_from_sel:
            aux_ck = _crs(d2_nbr)
        else:
            aux_ck = jax.lax.map(
                lambda oc: jnp.sum(
                    (oc[0][:, None, :] - xyz[oc[1]]) ** 2, axis=-1),
                (_crs(xyz), idx_ck))
            d2_from_sel = True
        rbf_nbr = gate_nbr = None

        def _chunk_rbf(aux_c, idx_c, mask_c):
            if d2_from_sel:
                return rbf_and_gate(aux_c, mask_c, cfg, dtype=x.dtype)
            return _rbf_gathered(aux_c, xyz[idx_c], mask_c, cfg,
                                 dtype=x.dtype)

        # windowed-gather metadata (see the docstring): per-chunk window
        # start = min VALID neighbor index, clipped so the static-width
        # slice stays in bounds.  One O(N·k) reduce, computed once.
        nwin = near_window if 0 < near_window < n else 0
        if nwin:
            idx_valid = jnp.where(mask_ck > 0, idx_ck, jnp.int32(n - 1))
            win_starts = jnp.clip(
                jnp.min(idx_valid.reshape(_nch, -1), axis=1),
                0, n - nwin).astype(jnp.int32)
        else:
            win_starts = jnp.zeros((_nch,), jnp.int32)

        def _wgather(tbl, idx_c, mask_c, start_c):
            """tbl[idx_c] through a (nwin, width) dynamic-slice window —
            bitwise-identical values at the sub-cliff gather rate; rows
            outside the window are mask-dropped (misconfigured nwin shows
            up as a deterministic conservation error, never as garbage)."""
            if not nwin:
                return tbl[idx_c], mask_c
            win = jax.lax.dynamic_slice(
                tbl, (start_c, jnp.int32(0)), (nwin, tbl.shape[1]))
            rel = idx_c - start_c
            ok = (rel >= 0) & (rel < nwin)
            rel = jnp.clip(rel, 0, nwin - 1)
            return win[rel], mask_c * ok.astype(mask_c.dtype)
    elif d2_nbr is None:
        rbf_nbr, gate_nbr = _rbf_gathered(xyz, xyz[idx], nbr_mask, cfg,
                                          dtype=x.dtype)
        gate_nbr = gate_nbr * nbr_mask
    else:
        rbf_nbr, gate_nbr = rbf_and_gate(d2_nbr, nbr_mask, cfg,
                                         dtype=x.dtype)
        gate_nbr = gate_nbr * nbr_mask

    pairm = node_mask[:, None] * node_mask[None, :]
    # Q10 compat width: the caller's ORIGINAL padded width (entry padding
    # pins it via compat_width so added kernel-pad columns never count)
    n_compat = compat_width if compat_width is not None else n
    if cfg.mask_messages:
        msg_count = jnp.sum(pairm, axis=1)
    else:
        msg_count = jnp.full((n,), float(n_compat), x.dtype)

    h = jnp.zeros((n, cfg.h_dim), x.dtype)
    q = q0
    nm = node_mask[:, None]

    def atom_inputs(h, q):
        return jnp.concatenate([x, h, q[:, None].astype(x.dtype)], axis=-1)

    def to_blocks(arr):
        return _pad_rows(arr, block).reshape(nb, block, -1)

    # Mixed-precision policy: the far-field (no-feature) dense reduction may
    # run at a cheaper precision than the near-field/pass math (the config's
    # dense_matmul_precision), including the manual bf16x3 split-float tier.
    dense_name = getattr(cfg, "dense_matmul_precision", "")
    if dense_name == "bf16x3":
        prec_dense = "bf16x3"
    elif dense_name == "int8":
        # int8 lives in the packed Pallas kernel only; the XLA fallback for
        # this config runs the dense term at default (bf16-pass) precision
        prec_dense = None
    elif dense_name:
        prec_dense = {"default": None, "high": jax.lax.Precision.HIGH,
                      "highest": jax.lax.Precision.HIGHEST}[dense_name]
    else:
        prec_dense = prec

    # Pallas path for the dense no-feature reduction: pad the atom axis to
    # the kernel tile lcm; the pair mask vector is node_mask in clean mode
    # and a "row is one of the original N" indicator in reference-compat
    # mode (the compat sum runs over the original padded width, SURVEY §8
    # Q10 — never over kernel padding).
    pallas_ok = use_pallas and prec_dense != "bf16x3"
    if pallas_ok:
        from epnn_tpu.ops.pallas_kernels import (
            dense_message_pad,
            dense_message_rowsum,
        )

        h1 = int(fused.messages.b1.shape[-1])
        bi, bjp = (128, 64) if n >= 128 else (8, 8)
        lcm = dense_message_pad(bi, bjp, h1)
        n_pad = int(-(-n // lcm) * lcm)
        if cfg.mask_messages:
            col_vec = jnp.pad(node_mask, (0, n_pad - n))
        else:
            col_vec = jnp.pad(jnp.ones((n_compat,), x.dtype),
                              (0, n_pad - n_compat))
        mid_dtype = "int8" if dense_name == "int8" else "float32"
        prec_name = ("default" if dense_name == "int8" else dense_name) or \
            getattr(cfg, "matmul_precision", "") or (
            "highest" if cfg.highest_precision else "default"
        )

    # j-reduction vector: rides the MXU as a matvec instead of a VPU
    # reduce; in clean mode it carries the column mask (row mask is applied
    # downstream by the node-masked update), in compat mode all original
    # columns count (SURVEY §8 Q10)
    jvec = node_mask if cfg.mask_messages else jnp.pad(
        jnp.ones((n_compat,), x.dtype), (0, n - n_compat))

    # Fused near-field Pallas kernels (r5f): the gathered O(N·k) message
    # correction and pass reduction run in-tile from pre-gathered FLAT
    # arrays (near_message_corr / near_pass_rowsum; the row gathers stay
    # in XLA where they belong).  MEASURED NEUTRAL on v5e — bitwise
    # identical outputs at every size/mode, and within noise end-to-end
    # (17,760 cold 108.6 vs 108.8 ms, reuse 103.4 vs 103.2; protein 6.48
    # vs 6.50; parity 7.07 vs 6.99; train step 26.5 vs 26.8 ms/step —
    # scripts/tpu_profile_r5f.py): the (N, k, H) layout copies the r5b
    # trace attributed to the XLA chain overlap with the far-field kernel
    # in context.  Kept as a tested option (EPNN_NEAR_KERNEL=1), default
    # off per the measured-win-or-off convention; conditions mirror the
    # far-field kernel plus f32 compute and single-mid weights.
    near_kernel = (pallas_ok and pack_to == 1
                   and x.dtype == jnp.float32
                   and near_row_chunk == 0
                   and os.environ.get("EPNN_NEAR_KERNEL", "0") == "1")
    if near_kernel:
        from epnn_tpu.ops.pallas_kernels import (
            near_message_corr,
            near_pass_rowsum,
        )

        k_eff = idx.shape[1]
        idx_flat = idx.reshape(-1)
        rbf_flat = rbf_nbr.reshape(n * k_eff, -1)
        gh_pass = (0.5 * gate_nbr).astype(jnp.float32)
        near_prec = (getattr(cfg, "matmul_precision", "")
                     or ("highest" if cfg.highest_precision else "default"))

    far_iters = int(os.environ.get("EPNN_FAR_CLUSTER_ITERS", "8"))
    far_fit_kw = {}
    if far_cluster > 0:
        # audit/tuning knobs for the fit (read at trace time — static);
        # defaults per the r7c battery in benchmarks/RESULTS.md
        _fp = os.environ.get("EPNN_FAR_CLUSTER_FIT_PREC", "highest")
        far_fit_kw = dict(
            fit_precision=(jax.lax.Precision.HIGHEST if _fp == "highest"
                           else jax.lax.Precision.DEFAULT),
            fit_rows=int(os.environ.get("EPNN_FAR_CLUSTER_FIT_ROWS", "0")),
            seed=os.environ.get("EPNN_FAR_CLUSTER_SEED", "norm"),
        )

    def _message_round(carry, w: PairMLPWeights, collapse: bool):
        if far_cluster > 0:
            h, q, rad = carry
        else:
            h, q = carry
        a = atom_inputs(h, q)
        pi = jnp.dot(a, w.w1_i, precision=prec) + w.b1  # b1 folded once/atom
        pj = jnp.dot(a, w.w1_j, precision=prec)

        if collapse:
            # uniform_q0 round-1 collapse: a valid atom's input row is
            # [Z_e, onehot_e | 0_h | q0] — fully determined by its element
            # (``ElementTable.feature_row``) — and padding rows are all
            # zero, so Σ_j jvec_j · mids(relu(pi_i + pj_j)) becomes a
            # count-weighted reduction over an (E+1)-row grid rebuilt from
            # x itself: counts from the exact one-hot slots 1.., Z per
            # element as max_j x[j,0]·x[j,1+e] (exact — absent elements get
            # Z 0 but also count 0).  Counts and the weighted reduce run in
            # f32 at HIGHEST (default-precision dots would round integer
            # counts through bf16 — 17,760 is not representable);
            # everything here is O(N·E), so precision is free.
            oh = x[:, 1:]                                       # (N, E)
            e_cnt = oh.shape[1]
            zvec = jnp.max(x[:, :1] * oh, axis=0)               # (E,)
            grid_in = jnp.concatenate([
                zvec[:, None],
                jnp.eye(e_cnt, dtype=x.dtype),
                jnp.zeros((e_cnt, cfg.h_dim), x.dtype),
                jnp.full((e_cnt, 1), q[0].astype(x.dtype)),
            ], axis=1)
            grid_in = jnp.concatenate(
                [grid_in, jnp.zeros((1, grid_in.shape[1]), x.dtype)], axis=0)
            pj_grid = jnp.dot(grid_in, w.w1_j, precision=prec)
            jvec32 = jvec.astype(jnp.float32)
            counts = jnp.einsum("n,ne->e", jvec32, oh.astype(jnp.float32),
                                precision=jax.lax.Precision.HIGHEST)
            counts = jnp.concatenate(
                [counts, (jnp.sum(jvec32) - jnp.sum(counts))[None]])
            hid_g = _packed_mids(
                jax.nn.relu(pi[:, None, :] + pj_grid[None, :, :]),
                w, prec, pack_to)
            dense_sum = jnp.einsum(
                "e,neh->nh", counts, hid_g.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST).astype(x.dtype)
        elif far_cluster > 0:
            # clustered far-field tier (opt-in approximation): quantize the
            # pj rows to C weighted centroids, then the dense no-feature
            # reduction becomes the SAME count-weighted grid shape as the
            # exact round-1 collapse — O(N·C) instead of O(N²).  The near
            # correction below and every pass round stay exact; conservation
            # is untouched (charges only move in the pass rounds).  The max
            # intra-cluster radius is the measured factor in the error bound
            # (``ops/cluster.py``) and rides the carry for ``far_diag``.
            from epnn_tpu.ops.cluster import weighted_kmeans

            cent, wts, r_round = weighted_kmeans(
                pj, jvec, far_cluster, iters=far_iters,
                differentiable=far_cluster_grad, **far_fit_kw)
            rad = jnp.maximum(rad, r_round)
            if pallas_ok and len(w.mids) == 1:
                (w2, b2), = w.mids
                # pad the centroid rows to the kernel's packed-row contract:
                # C/P rows must divide block_jp (≤64) exactly; zero-weight
                # padding rows contribute exactly nothing (mjp = 0)
                packc = max(1, 128 // h1) if 128 % h1 == 0 else 1
                npr = -(-far_cluster // packc)
                npr_p = npr if npr <= 64 else int(-(-npr // 64) * 64)
                cpad = npr_p * packc
                cent_p = jnp.pad(cent, ((0, cpad - far_cluster), (0, 0)))
                wts_p = jnp.pad(wts, (0, cpad - far_cluster))
                dense_sum = dense_message_rowsum(
                    jnp.pad(pi, ((0, n_pad - n), (0, 0))),
                    cent_p.astype(pi.dtype), wts_p, w2, b2,
                    block_i=bi, block_jp=min(64, npr_p),
                    precision=prec_name, mid_dtype=mid_dtype,
                )[:n]
            else:
                cent_x = cent.astype(x.dtype)

                def grid_scan(carry2, pi_blk):
                    hid = jax.nn.relu(pi_blk[:, None, :] + cent_x[None, :, :])
                    hid = _packed_mids(hid, w, prec, pack_to)
                    # f32 HIGHEST for the count weighting (counts are exact
                    # integers in f32; default-precision dots would round
                    # them through bf16)
                    red = jnp.einsum(
                        "c,bch->bh", wts, hid.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
                    return carry2, red

                _, dsum = jax.lax.scan(grid_scan, None, to_blocks(pi))
                dense_sum = dsum.reshape(nb * block, -1)[:n].astype(x.dtype)
        elif pallas_ok and len(w.mids) == 1:
            (w2, b2), = w.mids
            # pi already carries b1 (folded once per atom above) — the
            # kernel's first layer is bias-free by contract
            dense_sum = dense_message_rowsum(
                jnp.pad(pi, ((0, n_pad - n), (0, 0))),
                jnp.pad(pj, ((0, n_pad - n), (0, 0))),
                col_vec, w2, b2,
                block_i=bi, block_jp=bjp, precision=prec_name,
                mid_dtype=mid_dtype,
            )[:n]
        else:
            # dense no-feature part: Σ_j over ALL pairs with e = 0
            def dense_scan(carry2, pi_i):
                hid = jax.nn.relu(pi_i[:, None, :] + pj[None, :, :])
                if prec_dense == "bf16x3":
                    for wm, bm in w.mids:
                        hid = jax.nn.relu(_split_dot(hid, wm) + bm)
                    red = _split_dot(jvec, hid,
                                     dims=(((0,), (1,)), ((), ())))
                else:
                    hid = _packed_mids(hid, w, prec_dense, pack_to)
                    red = jnp.einsum("n,bnh->bh", jvec, hid,
                                     precision=prec_dense)
                return carry2, red

            _, dsum = jax.lax.scan(dense_scan, None, to_blocks(pi))
            dense_sum = dsum.reshape(nb * block, -1)[:n]

        # gathered near part: with features, minus the no-feature double count
        if near_row_chunk:
            def _near_chunk(ops_c):
                pi_c, idx_c, mask_c, aux_c, start_c = ops_c
                rbf_c, _ = _chunk_rbf(aux_c, idx_c, mask_c)
                pj_nbr, mask_c = _wgather(pj, idx_c, mask_c, start_c)
                epart = jnp.dot(rbf_c, w.w1_e, precision=prec)
                base = pi_c[:, None, :] + pj_nbr
                hid_full = _packed_mids(jax.nn.relu(base + epart), w, prec,
                                        pack_to)
                hid_nofeat = _packed_mids(jax.nn.relu(base), w, prec,
                                          pack_to)
                return jnp.sum((hid_full - hid_nofeat) * mask_c[:, :, None],
                               axis=1)

            # under remat, checkpoint the chunk BODY too: lax.map's scan
            # linearization otherwise keeps every chunk's (chunk, k, H1)
            # residuals alive at once during the (already-checkpointed)
            # round backward — the full-width residual footprint the
            # chunking exists to avoid.  With the inner checkpoint the
            # backward recomputes chunk-by-chunk: peak = ONE chunk's
            # residuals (this is what makes 568k-atom training fit)
            _near_body = jax.checkpoint(_near_chunk) if remat \
                else _near_chunk
            near_corr = jax.lax.map(
                _near_body, (_crs(pi), idx_ck, mask_ck, aux_ck, win_starts)
            ).reshape(nck, -1)[:n]
        elif near_kernel and len(w.mids) == 1:
            (w2m, b2m), = w.mids
            near_corr = near_message_corr(
                pi, pj[idx_flat], rbf_flat, nbr_mask, w.w1_e, w2m, b2m,
                precision=near_prec)
        else:
            pj_nbr = pj[idx]                                  # (N, K, H1)
            epart = jnp.dot(rbf_nbr, w.w1_e, precision=prec)  # (N, K, H1)
            base = pi[:, None, :] + pj_nbr
            hid_full = _packed_mids(jax.nn.relu(base + epart), w, prec,
                                    pack_to)
            hid_nofeat = _packed_mids(jax.nn.relu(base), w, prec, pack_to)
            near_corr = jnp.sum(
                (hid_full - hid_nofeat) * nbr_mask[:, :, None], axis=1
            )

        hsum = dense_sum + near_corr
        messages = (jnp.dot(hsum, w.w_out, precision=prec)
                    + msg_count[:, None] * w.b_out)
        upd_in = jnp.concatenate([h, messages], axis=-1) * nm
        h = _apply_mlp(fused.update, upd_in, prec) * nm
        if far_cluster > 0:
            return (h, q, rad), None
        return (h, q), None

    def message_round(carry, w: PairMLPWeights):
        return _message_round(carry, w, False)

    if remat:
        message_round = jax.checkpoint(message_round)
    carry0 = ((h, q, jnp.zeros((), jnp.float32)) if far_cluster > 0
              else (h, q))
    if uniform_q0:
        round1 = lambda carry, w: _message_round(carry, w, True)  # noqa: E731
        if remat:
            round1 = jax.checkpoint(round1)
        w_first = jax.tree_util.tree_map(lambda a: a[0], fused.messages)
        w_rest = jax.tree_util.tree_map(lambda a: a[1:], fused.messages)
        carry, _ = round1(carry0, w_first)
        carry, _ = jax.lax.scan(message_round, carry, w_rest)
    else:
        carry, _ = jax.lax.scan(message_round, carry0, fused.messages)
    if far_cluster > 0:
        h, q, rad_max = carry
    else:
        h, q = carry

    # electron passing: gathered pairs only (the gate is zero off the near set)
    def pass_round(q, w: PairMLPWeights):
        # runs at the pass weights' dtype (f32 under bf16 compute — see the
        # conservation note in forward_blocked's bfloat16 branch)
        a = atom_inputs(h, q).astype(w.w1_i.dtype)
        pi = jnp.dot(a, w.w1_i, precision=prec) + w.b1
        pj = jnp.dot(a, w.w1_j, precision=prec)
        h1 = pi.shape[-1]
        if near_kernel and len(w.mids) == 1:
            (w2m, b2m), = w.mids
            rs = jnp.concatenate([pi, pj], axis=-1)
            dsum = near_pass_rowsum(
                rs, rs[idx_flat], rbf_flat, gh_pass, w.w1_e, w2m, b2m,
                precision=near_prec)
            dq = jnp.dot(dsum, w.w_out.astype(jnp.float32),
                         precision=prec)[:, 0]
            return q + dq, None
        if near_row_chunk:
            pp = jnp.concatenate([pi, pj], axis=-1)

            def _pass_chunk(ops_c):
                pi_c, pj_c, idx_c, mask_c, aux_c, start_c = ops_c
                rbf_c, gate_c = _chunk_rbf(aux_c, idx_c, mask_c)
                pp_c, mask_c = _wgather(pp, idx_c, mask_c, start_c)
                gate_c = gate_c * mask_c
                pi_nbr = pp_c[..., :h1]
                pj_nbr = pp_c[..., h1:]
                epart = jnp.dot(rbf_c.astype(w.w1_e.dtype), w.w1_e,
                                precision=prec)
                hid_n = jax.nn.relu((pi_c[:, None, :] + pj_nbr) + epart)
                hid_t = jax.nn.relu((pi_nbr + pj_c[:, None, :]) + epart)
                hid_n = _packed_mids(hid_n, w, prec, pack_to)
                hid_t = _packed_mids(hid_t, w, prec, pack_to)
                # both orderings of a pair read the same full-width pp
                # rows, so the pairwise antisymmetry stays bitwise under
                # chunking — conservation is unchanged
                diff = (hid_n - hid_t).astype(jnp.float32)
                gate32 = gate_c.astype(jnp.float32)
                return jnp.sum(0.5 * gate32[:, :, None] * diff, axis=1)

            # inner checkpoint under remat — see the message round's note
            _pass_body = jax.checkpoint(_pass_chunk) if remat \
                else _pass_chunk
            dsum = jax.lax.map(
                _pass_body,
                (_crs(pi), _crs(pj), idx_ck, mask_ck, aux_ck, win_starts)
            ).reshape(nck, -1)[:n]
            dq = jnp.dot(dsum, w.w_out.astype(jnp.float32),
                         precision=prec)[:, 0]
            return q + dq, None
        # ONE row gather of the concatenated projections: gather cost is
        # per-row, not per-byte (scan-timed r3c: a 32-wide and a 3-wide
        # (N,k) gather both cost ~2.6 ms at N=17,760), so fusing the two
        # halves the pass round's gather bill; values are bitwise identical
        pp_nbr = jnp.concatenate([pi, pj], axis=-1)[idx]
        pi_nbr = pp_nbr[..., :h1]
        pj_nbr = pp_nbr[..., h1:]
        epart = jnp.dot(rbf_nbr.astype(w.w1_e.dtype), w.w1_e, precision=prec)
        hid_n = jax.nn.relu((pi[:, None, :] + pj_nbr) + epart)
        hid_t = jax.nn.relu((pi_nbr + pj[:, None, :]) + epart)
        hid_n = _packed_mids(hid_n, w, prec, pack_to)
        hid_t = _packed_mids(hid_t, w, prec, pack_to)
        # difference in the compute dtype (bitwise antisymmetric), then f32
        # accumulation — conservation stays f32-grade under bf16 compute
        diff = (hid_n - hid_t).astype(jnp.float32)
        gate32 = gate_nbr.astype(jnp.float32)
        dsum = jnp.sum(0.5 * gate32[:, :, None] * diff, axis=1)
        dq = jnp.dot(dsum, w.w_out.astype(jnp.float32), precision=prec)[:, 0]
        return q + dq, None

    q, _ = jax.lax.scan(pass_round, q, fused.passes)
    if far_diag:
        return q * node_mask, rad_max
    return q * node_mask


def _forward_single_pallas(
    fused: FusedParams,
    x: jax.Array,          # (N, n_elems)
    q0: jax.Array,         # (N,)
    xyz: jax.Array,        # (N, 3)
    node_mask: jax.Array,  # (N,)
    cfg: EPNNConfig,
    block: int = 64,
    remat: bool = False,
    rbf_method: str = "direct",
) -> jax.Array:
    """Dense forward where every O(N²) op runs in the fused Pallas pair
    kernels: RBF featurization, first layer, mid layer, gate, and (for
    electron passing) BOTH orderings + the antisymmetric reduction happen
    in-tile (SURVEY §7 stage 5; reference hot ops charge_gn.py:62-70 and
    101-118).  Only (N, ·) arrays ever touch HBM.
    """
    from epnn_tpu.ops.pallas_kernels import (
        fused_epn_rowsum,
        fused_message_rowsum,
    )

    n = x.shape[0]
    prec = _resolve_precision(cfg)
    prec_name = getattr(cfg, "matmul_precision", "") or (
        "highest" if cfg.highest_precision else "default"
    )
    # Mosaic block rules: the pre-transposed (3, N)/(1, N) column inputs are
    # blocked (·, BJ), so BJ must be a multiple of 128; BI bounds the in-tile
    # (BI·BJ, e_dim→128-lane) RBF buffer (BI=32, BJ=128 → 2 MB)
    if n < 128:
        bi = bj = 8  # interpret mode (CPU tests); no lane constraint
    else:
        bi, bj = max(8, min(block, 64)), 128
    lcm = int(np.lcm(bi, bj))
    n_pad = int(-(-n // lcm) * lcm)

    def pad_rows(a):
        return jnp.pad(a, [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1))

    xyz_p = pad_rows(xyz)
    mask_p = pad_rows(node_mask)
    col_vec = pad_rows(jnp.ones((n,), x.dtype))  # compat: original width only

    pairm = node_mask[:, None] * node_mask[None, :]
    if cfg.mask_messages:
        msg_count = jnp.sum(pairm, axis=1)
    else:
        msg_count = jnp.full((n,), float(n), x.dtype)

    soft = cfg.pass_weighting == "soft_envelope"
    h = jnp.zeros((n, cfg.h_dim), x.dtype)
    q = q0
    nm = node_mask[:, None]

    def atom_inputs(h, q):
        return jnp.concatenate([x, h, q[:, None].astype(x.dtype)], axis=-1)

    def message_round(carry, w: PairMLPWeights):
        h, q = carry
        a = atom_inputs(h, q)
        pi = jnp.dot(a, w.w1_i, precision=prec) + w.b1  # b1 folded per atom
        pj = jnp.dot(a, w.w1_j, precision=prec)
        (w2, b2), = w.mids
        hsum = fused_message_rowsum(
            pad_rows(pi), pad_rows(pj), xyz_p, mask_p, col_vec,
            w.w1_e, w2, b2, cutoff=cfg.cutoff, eta=cfg.eta,
            tol=cfg.is_near_tol, masked=cfg.mask_messages,
            block_i=bi, block_j=bj, precision=prec_name,
            rbf_method=rbf_method,
        )[:n]
        messages = (jnp.dot(hsum, w.w_out, precision=prec)
                    + msg_count[:, None] * w.b_out)
        upd_in = jnp.concatenate([h, messages], axis=-1) * nm
        h = _apply_mlp(fused.update, upd_in, prec) * nm
        return (h, q), None

    if remat:
        message_round = jax.checkpoint(message_round)
    (h, q), _ = jax.lax.scan(message_round, (h, q), fused.messages)

    def pass_round(q, w: PairMLPWeights):
        a = atom_inputs(h, q)
        pi = jnp.dot(a, w.w1_i, precision=prec) + w.b1
        pj = jnp.dot(a, w.w1_j, precision=prec)
        (w2, b2), = w.mids
        dsum = fused_epn_rowsum(
            pad_rows(pi), pad_rows(pj), xyz_p, mask_p,
            w.w1_e, w2, b2, cutoff=cfg.cutoff, eta=cfg.eta,
            tol=cfg.is_near_tol, soft_gate=soft,
            block_i=bi, block_j=bj, precision=prec_name,
            rbf_method=rbf_method,
        )[:n]
        dq = jnp.dot(dsum, w.w_out, precision=prec)[:, 0]  # b_out cancels
        return q + dq, None

    if remat:
        pass_round = jax.checkpoint(pass_round)
    q, _ = jax.lax.scan(pass_round, q, fused.passes)
    return q * node_mask


def _forward_single(
    fused: FusedParams,
    x: jax.Array,          # (N, n_elems)
    q0: jax.Array,         # (N,)
    xyz: jax.Array,        # (N, 3)
    node_mask: jax.Array,  # (N,)
    cfg: EPNNConfig,
    block: int,
    remat: bool = False,
) -> jax.Array:
    n = x.shape[0]
    nb = -(-n // block)
    prec = _resolve_precision(cfg)

    eye = jnp.eye(n, dtype=x.dtype)
    pairm = node_mask[:, None] * node_mask[None, :]   # message mask (diag kept,
    # matching the dense model's pair_mask — self-messages flow there too)
    valid = pairm * (1.0 - eye)                       # RBF validity (diag zero)

    xyz_blocks = _pad_rows(xyz, block).reshape(nb, block, 3)
    valid_blocks = _pad_rows(valid, block).reshape(nb, block, n)
    pairm_blocks = _pad_rows(pairm, block).reshape(nb, block, n)

    h = jnp.zeros((n, cfg.h_dim), x.dtype)
    q = q0
    nm = node_mask[:, None]

    def atom_inputs(h, q):
        return jnp.concatenate([x, h, q[:, None].astype(x.dtype)], axis=-1)

    def to_blocks(arr):
        return _pad_rows(arr, block).reshape(nb, block, -1)

    # The output layer commutes with the j-reduction (it is affine):
    #   Σ_j mask_ij · (hid_ij @ W_out + b_out)
    #     = (Σ_j mask_ij · hid_ij) @ W_out + (Σ_j mask_ij) · b_out
    # so the per-pair (·, 32) @ (32, out) matmuls — catastrophically
    # MXU-padded at out=1 — collapse to one post-reduction matmul per round.
    if cfg.mask_messages:
        msg_count = jnp.sum(pairm, axis=1)            # Σ_j mask_ij per atom
    else:
        msg_count = jnp.full((n,), float(n), x.dtype)  # reference Q10: all N

    # ---- message rounds (scan over the round-stacked untied MLPs) ----
    def message_round(carry, w: PairMLPWeights):
        h, q = carry
        a = atom_inputs(h, q)
        pi = jnp.dot(a, w.w1_i, precision=prec)   # (N, H1)
        pj = jnp.dot(a, w.w1_j, precision=prec)

        def msg_scan(carry2, inp):
            xyz_i, valid_i, pairm_i, pi_i = inp
            rbf, _ = _rbf_block(xyz_i, xyz, valid_i, cfg, dtype=x.dtype)
            epart = jnp.dot(rbf, w.w1_e, precision=prec)      # (B, N, H1)
            hid = jax.nn.relu((pi_i[:, None, :] + pj[None, :, :]) + epart + w.b1)
            for wm, bm in w.mids:
                hid = jax.nn.relu(jnp.dot(hid, wm, precision=prec) + bm)
            if cfg.mask_messages:
                hid = hid * pairm_i[:, :, None]
            return carry2, jnp.sum(hid, axis=1)               # Σ_j pre-W_out

        _, hsum = jax.lax.scan(
            msg_scan, None, (xyz_blocks, valid_blocks, pairm_blocks, to_blocks(pi))
        )
        hsum = hsum.reshape(nb * block, -1)[:n]
        messages = (jnp.dot(hsum, w.w_out, precision=prec)
                    + msg_count[:, None] * w.b_out)
        upd_in = jnp.concatenate([h, messages], axis=-1) * nm
        h = _apply_mlp(fused.update, upd_in, prec) * nm
        return (h, q), None

    if remat:
        message_round = jax.checkpoint(message_round)
    (h, q), _ = jax.lax.scan(message_round, (h, q), fused.messages)

    # ---- electron passing rounds ----
    # b_out cancels in f_ij − f_ji, so the transfer is a pure W_out
    # contraction of the weighted hidden difference.
    def pass_round(q, w: PairMLPWeights):
        # f32 under bf16 compute — see forward_blocked's bfloat16 branch
        a = atom_inputs(h, q).astype(w.w1_i.dtype)
        pi = jnp.dot(a, w.w1_i, precision=prec)
        pj = jnp.dot(a, w.w1_j, precision=prec)

        def pass_scan(carry2, inp):
            xyz_i, valid_i, pi_i, pj_i = inp
            rbf, gate = _rbf_block(xyz_i, xyz, valid_i, cfg,
                                   dtype=w.w1_e.dtype)
            epart = jnp.dot(rbf, w.w1_e, precision=prec)
            # f_ij: i from the row block, j over all atoms
            hid_n = jax.nn.relu((pi_i[:, None, :] + pj[None, :, :]) + epart + w.b1)
            # f_ji: swapped orderings, same epart (bitwise-symmetric)
            hid_t = jax.nn.relu((pi[None, :, :] + pj_i[:, None, :]) + epart + w.b1)
            for wm, bm in w.mids:
                hid_n = jax.nn.relu(jnp.dot(hid_n, wm, precision=prec) + bm)
                hid_t = jax.nn.relu(jnp.dot(hid_t, wm, precision=prec) + bm)
            weight = (valid_i * gate).astype(jnp.float32)[:, :, None]
            d32 = (hid_n - hid_t).astype(jnp.float32)
            diff = jnp.sum(0.5 * weight * d32, axis=1)  # (B, H) f32-summed
            return carry2, diff

        _, dsum = jax.lax.scan(
            pass_scan, None,
            (xyz_blocks, valid_blocks, to_blocks(pi), to_blocks(pj)),
        )
        dsum = dsum.reshape(nb * block, -1)[:n]
        dq = jnp.dot(dsum, w.w_out.astype(jnp.float32), precision=prec)[:, 0]
        return q + dq, None

    if remat:
        pass_round = jax.checkpoint(pass_round)
    q, _ = jax.lax.scan(pass_round, q, fused.passes)

    return q * node_mask


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block", "neighbor_k", "use_pallas", "pack_to",
                     "remat", "neighbor_grid", "uniform_q0", "far_cluster",
                     "far_diag", "far_cluster_grad", "near_row_chunk",
                     "near_window"),
)
def forward_blocked(
    fused: FusedParams,
    x: jax.Array,          # (B, N, n_elems)
    q0: jax.Array,         # (B, N)
    xyz: jax.Array,        # (B, N, 3)
    node_mask: jax.Array,  # (B, N)
    cfg: EPNNConfig,
    block: int = 128,
    neighbor_k: int | None = None,
    use_pallas: bool = False,
    pack_to: int = 1,
    remat: bool = False,
    neighbors: Tuple[jax.Array, jax.Array] | None = None,
    neighbor_grid: Tuple[int, int] | None = None,
    uniform_q0: bool = False,
    far_cluster: int = 0,
    far_diag: bool = False,
    far_cluster_grad: bool = False,
    near_row_chunk: int = 0,
    near_window: int = 0,
) -> jax.Array:
    """Batched blockwise forward from raw coordinates (featurization fused).

    ``near_row_chunk`` (static) — huge-N memory mode: run each round's
    (N, k, ·) near-field activations in lax.map chunks of this many rows
    (bitwise-identical outputs; see :func:`_forward_single_nbr`).  Pair
    with a 4-tuple ``neighbor_grid`` (..., row_chunk) so the in-forward
    cell builder is bounded too.  Needed past ~0.5M atoms on one v5e.

    ``near_window`` (static, requires ``near_row_chunk``) — windowed
    huge-N gathers: each chunk's per-round pj/pp gathers read from a
    contiguous dynamic-slice window of this many rows at the sub-cliff
    gather rate (4.1× on the gather bill at 568k).  Bitwise-identical
    when atoms are spatially ordered and the width covers every chunk's
    neighbor-index spread (:func:`neighbor_window_width`); see
    :func:`_forward_single_nbr`.

    ``far_cluster`` (static) — opt-in APPROXIMATE far-field serving tier
    (requires ``neighbor_k``): non-collapsed message rounds quantize the
    O(N²) no-feature dense reduction to C weighted-k-means centroids
    (O(N·C)); near corrections and pass rounds stay exact, so charge
    conservation is untouched.  ``far_diag`` additionally returns the max
    intra-cluster radius (B,) — the measured factor of the error bound
    (:func:`epnn_tpu.ops.cluster.mids_lipschitz_bound`).  The default
    fit is fully stop-gradient (bitwise-stable serving); training paths
    set ``far_cluster_grad=True`` for exact-VJP-of-the-approximation
    gradients (differentiable final centroids — see
    :func:`epnn_tpu.ops.cluster.weighted_kmeans`; forward values shift
    by one extra half Lloyd step, a strictly tighter fit).

    ``uniform_q0`` (static) — caller asserts every graph's valid atoms all
    carry the same initial charge with valid rows first (the
    ``pad_molecules`` layout ``q0 = Q/n``) and ``[Z, onehot]`` element
    features; the neighbor-split path then collapses message round 1's
    O(N²) far-field reduction to a count-weighted per-element grid (see
    :func:`_forward_single_nbr`).  Association-level fp change only;
    ignored by the dense paths.

    ``neighbor_grid`` — optional STATIC ``(ncells_pad, cell_cap)`` from
    :func:`cell_grid_params`: in-forward neighbor selection then uses the
    cell-list builder (:func:`build_neighbors_cell`, one top_k over
    27·cell_cap candidates) instead of the O(N²)-scored top_k — the cold
    single-shot win at large N.  Ignored when ``neighbors`` is given.

    ``neighbors`` — optional precomputed ``(idx, nbr_mask[, d2])`` batch
    arrays, each (B, N, neighbor_k), as built by
    :func:`build_neighbors_batch`.  Skips in-forward neighbor selection —
    for repeated inference on a fixed geometry (serving loops, the
    reference infer.py's own shape) this saves the full top_k cost per
    call; with the d² plane the coordinate gather and distance
    recomputation are skipped too.  Requires ``neighbor_k``.

    Equivalent to ``EPNN(cfg).apply(params, x, q0, rbf_edges(xyz, mask), mask)``
    up to fp32 association noise, but with O(B·block·N) peak memory instead
    of O(B·N²·(2F+E)).

    With ``neighbor_k`` set (must be ≥ the true max neighbor count within the
    cutoff — see :func:`max_neighbor_count`), edge featurization and electron
    passing run on gathered O(N·k) near pairs only; identical results, much
    less work on spatially sparse systems (proteins: k≈32 vs N=2220).

    ``use_pallas`` without ``neighbor_k`` selects the fully fused Pallas
    dense path (RBF + pair MLPs + antisymmetric reduction in-tile,
    :func:`_forward_single_pallas`) — inference-only (the grid-accumulator
    kernels have no VJP; training uses the differentiable neighbor/remat
    path).  With ``neighbor_k`` it switches the dense no-feature message
    reduction to the Pallas kernel.
    """
    if cfg.compute_dtype == "bfloat16":
        # bf16 end-to-end in the MLP pipeline: inputs, projections, hidden
        # activations, and weights are bf16 (halving activation HBM/VMEM);
        # featurization stays fp32 internally (rbf_and_gate) and casts its
        # outputs, coordinates stay fp32 for distances/neighbor selection,
        # and the result returns as fp32.  Conservation is unaffected: the
        # antisymmetric cancellation is bitwise in any dtype.
        bf = jnp.bfloat16
        # electron-passing weights STAY f32: XLA:TPU evaluates bf16
        # elementwise chains in f32 registers and rounds at materialization
        # points, which differ between the f_ij and f_ji fusion graphs —
        # breaking the bitwise antisymmetry conservation rests on (verified
        # on hardware; CPU bf16 conserves, TPU bf16 did not).  The pass
        # rounds are O(N·k) — the bf16 win is the message pipeline.
        fused = FusedParams(
            messages=jax.tree_util.tree_map(lambda a: a.astype(bf),
                                            fused.messages),
            passes=fused.passes,
            update=jax.tree_util.tree_map(lambda a: a.astype(bf),
                                          fused.update),
        )
        x = x.astype(bf)
        # q0 stays f32: the charge accumulator must not round per round, or
        # conservation degrades to bf16 noise × N (atom_inputs casts per use)
        node_mask_c = node_mask.astype(bf)
        out = forward_blocked(
            fused, x, q0, xyz, node_mask_c,
            cfg.replace(compute_dtype="float32", matmul_precision="default",
                        highest_precision=False),
            block=block, neighbor_k=neighbor_k, use_pallas=False,
            pack_to=pack_to, remat=remat, neighbors=neighbors,
            neighbor_grid=neighbor_grid, uniform_q0=uniform_q0,
            far_cluster=far_cluster, far_diag=far_diag,
            far_cluster_grad=far_cluster_grad,
            near_row_chunk=near_row_chunk, near_window=near_window,
        )
        if far_diag:
            return out[0].astype(jnp.float32) * node_mask, out[1]
        return out.astype(jnp.float32) * node_mask

    if neighbors is not None and neighbor_k is None:
        raise ValueError("neighbors requires neighbor_k")
    if far_cluster > 0 and neighbor_k is None:
        raise ValueError("far_cluster requires neighbor_k (the clustered "
                         "far-field tier lives on the neighbor-split path)")
    if near_row_chunk and neighbor_k is None:
        raise ValueError("near_row_chunk requires neighbor_k (the huge-N "
                         "memory mode lives on the neighbor-split path)")
    if near_window and not near_row_chunk:
        raise ValueError("near_window requires near_row_chunk (windowed "
                         "gathers live on the chunked huge-N path)")

    if neighbor_k is not None:
        single = functools.partial(
            _forward_single_nbr, cfg=cfg, block=block, k=neighbor_k,
            use_pallas=use_pallas, pack_to=pack_to, remat=remat,
            neighbor_grid=neighbor_grid, uniform_q0=uniform_q0,
            far_cluster=far_cluster, far_diag=far_diag,
            far_cluster_grad=far_cluster_grad,
            near_row_chunk=near_row_chunk, near_window=near_window,
        )
    elif use_pallas and len(fused.messages.mids) == 1:
        # fully fused dense path: RBF + pair MLPs + antisymmetric reduction
        # all in the Pallas kernels (mids stacking gives (T, 1) layers —
        # exactly one mid layer is what the kernels implement)
        single = functools.partial(_forward_single_pallas, cfg=cfg,
                                   block=min(block, 128), remat=remat)
    else:
        single = functools.partial(
            _forward_single, cfg=cfg, block=block, remat=remat
        )
    # vmap is catastrophic for big single graphs on TPU: XLA lowers BATCHED
    # top_k ~9× slower (378 vs 42 ms for build_neighbors at N=17,760, B=1),
    # turning a 147 ms forward into 508 ms.  B=1 calls the single-graph
    # program directly; batches of large graphs map sequentially (each at
    # full speed — they don't fit side-by-side in VMEM anyway); small-graph
    # batches keep vmap (the bulk-throughput path, where it wins).
    # Exception: the TRANSPOSE of the unbatched XLA dense scan is ~2× slower
    # than its batched form (70 vs 36 ms/step protein fine-tune), so the
    # remat'd-training XLA fallback keeps vmap; the packed-kernel trainer
    # path (use_pallas, a custom-VJP kernel) measured identical either way.
    bypass_b1 = not (remat and neighbor_k is not None and not use_pallas)
    if x.shape[0] == 1 and bypass_b1:
        if neighbor_k is not None and neighbors is not None:
            single = functools.partial(
                single, neighbors=tuple(a[0] for a in neighbors))
        out = single(fused, x[0], q0[0], xyz[0], node_mask[0])
        if far_diag:
            return out[0][None], out[1][None]
        return out[None]
    if (neighbor_k is not None and bypass_b1
            and x.shape[1] >= _NEIGHBOR_BLOCK_THRESHOLD):
        if neighbors is not None:
            return jax.lax.map(
                lambda args: single(fused, *args[:4], neighbors=args[4]),
                (x, q0, xyz, node_mask, neighbors),
            )
        return jax.lax.map(
            lambda args: single(fused, *args), (x, q0, xyz, node_mask)
        )
    if neighbor_k is not None and neighbors is not None:
        return jax.vmap(
            lambda xx, qq, zz, mm, nb: single(fused, xx, qq, zz, mm,
                                              neighbors=nb),
            in_axes=(0, 0, 0, 0, 0),
        )(x, q0, xyz, node_mask, neighbors)
    return jax.vmap(single, in_axes=(None, 0, 0, 0, 0))(
        fused, x, q0, xyz, node_mask
    )
