"""Pallas (Mosaic) TPU kernels for the hot dense pair loop.

After the neighbor split (epnn_tpu.ops.fused), the one remaining O(N²) hot
op is the featureless message reduction of each GNN round:

    out_i = Σ_j mask_ij · relu(relu(pi_i + pj_j) @ W2 + b2)

(``pi`` carries the first-layer bias folded in by the caller — the kernel
adds nothing to the first layer, which keeps its contract independent of
the caller's bias convention.)

This kernel tiles the (N × N) pair grid onto a (row-block × col-block) grid,
builds the first-layer activations for one tile directly in VMEM from the
per-atom projections (the (N², H) tensor never exists in HBM), runs the mid
matmul on the MXU, and accumulates the j-partial sums into a VMEM-resident
output block (revisited across the j grid dimension, which Mosaic iterates
fastest).  HBM traffic is O(N·H) per row block instead of O(N²·H).

The kernel runs in interpret mode off-TPU so the CPU test suite exercises it
(tests/test_pallas.py); `use_pallas=True` on forward_blocked switches the
dense message loop to this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _msg_kernel(pi_ref, pjp_ref, mjp_ref, w2p_ref, b2p_ref,
                out_ref, *, prec, pack, mid_dtype="float32"):
    j = pl.program_id(1)
    pi = pi_ref[:]            # (BI, H) raw row projections
    pjp = pjp_ref[:]          # (BJP, P*H) — P consecutive pj rows per row
    bi = pi.shape[0]
    bjp, ph = pjp.shape
    # spread pi across the P lane groups IN-TILE: pltpu.repeat is a
    # concat-style lane copy (exact, VPU) — the (N, P·H) tile(pi, (1, P))
    # HBM materialization XLA used to emit per round (0.22 ms/inference of
    # pure copies at protein scale, parsed-trace r3) never exists
    pit = pltpu.repeat(pi, pack, axis=1) if pack > 1 else pi
    # one packed row = P pairs; the mid matmul runs at full 128-lane width
    # against kron(I_P, W2) — per-element identical math, ~P·(128/H)× better
    # MXU utilization than the (·, H) layout
    base = (pit[:, None, :] + pjp[None, :, :]).reshape(bi * bjp, ph)
    hid = jax.nn.relu(base)
    if mid_dtype == "int8":
        # fast-mode tier: per-tensor int8 activations × per-column int8
        # weights.  v5e's int8 MXU rate is 2× bf16, halving the matmul
        # time the kron packing wastes 4× of.  The activation scale is a
        # PRECOMPUTED bound (outside the kernel, from max(pi)+max(pj)) so
        # the in-tile cost is one multiply + round + cast — a per-row
        # max/divide variant measured SLOWER than f32 (r4 battery: the
        # quant VPU ops swamped the MXU saving).  baux rows: [b2; dequant
        # scale s_in·sw per column; quant scale 127/s_in broadcast].
        qz = jnp.clip(hid * b2p_ref[:][2:3, :], 0.0, 127.0)
        qz = (qz + 0.5).astype(jnp.int8)                 # round-half-up ≥ 0
        acc = jax.lax.dot_general(
            qz, w2p_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        hid = jax.nn.relu(
            acc.astype(jnp.float32) * b2p_ref[:][1:2, :]
            + b2p_ref[:][0:1, :])
    else:
        hid = jax.nn.relu(
            jnp.dot(hid, w2p_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
            + b2p_ref[:]
        )
    hid = hid.reshape(bi, bjp, ph) * mjp_ref[:][None, :, :]
    partial = jnp.sum(hid, axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


@functools.partial(
    jax.jit, static_argnames=("block_i", "block_jp", "precision", "interpret",
                              "mid_dtype")
)
def dense_message_rowsum(
    pi: jax.Array,           # (R, H) row projections, first-layer bias folded
    #                          in; R == N single-chip, N/D per atom shard
    pj: jax.Array,           # (N, H) col projections
    col_vec: jax.Array,      # (N,) j-sum weights (node mask, or compat ones)
    w2: jax.Array,           # (H, H)
    b2: jax.Array,           # (H,)
    block_i: int = 128,
    block_jp: int = 64,
    precision: str = "default",
    interpret: bool | None = None,
    mid_dtype: str = "float32",
) -> jax.Array:
    """Σ_j col_vec_j · relu(relu(pi_i + pj_j) @ W2 + b2) as (N, H).

    ``pi`` must already include the first-layer bias (fold it once per atom —
    the kernel adds no bias to the first layer).  Pass ``col_vec=node_mask``
    for pairwise-masked (clean) mode or all-ones over the original padded
    width for reference-compat mode (SURVEY §8 Q10) — kernel padding columns
    must be zero either way.

    Layout: P = 128//H column pairs are packed per 128-lane row, so the mid
    matmul runs against kron(I_P, W2) at full MXU width instead of an
    H-wide (4×-padded) contraction.  N must be divisible by
    lcm(block_i, P·block_jp) — see :func:`dense_message_pad`.

    Differentiable: a custom VJP recomputes the two-layer activations
    in-tile (no residuals) and emits dpi/dpj/dW2/db2 in one backward pass
    over the pair grid, so training can use this kernel too.

    ``mid_dtype='int8'`` quantizes the mid matmul (per-row activation /
    per-column weight scales) — the fast-mode serving tier; the custom VJP
    backward recomputes in f32 regardless (a straight-through gradient —
    training configs should keep the default).
    """
    return _dense_message_rowsum_cvjp(pi, pj, col_vec, w2, b2, block_i,
                                      block_jp, precision, interpret,
                                      mid_dtype)


def dense_message_pad(block_i: int = 128, block_jp: int = 64,
                      h: int = 32) -> int:
    """The atom-count multiple dense_message_rowsum requires."""
    pack = max(1, 128 // h) if 128 % h == 0 else 1
    return int(np.lcm(block_i, pack * block_jp))


def dense_message_rowsum_reference(pi, pj, col_vec, w2, b2):
    """NumPy-oracle for the kernel (used by tests).  Note: intentionally
    independent of any bias convention — ``pi`` carries the folded b1."""
    hid1 = np.maximum(pi[:, None, :] + pj[None, :, :], 0.0)
    hid2 = np.maximum(hid1 @ w2 + b2, 0.0)
    return (hid2 * col_vec[None, :, None]).sum(axis=1)


# ---------------------------------------------------------------------------
# Fused pair kernels with in-tile RBF featurization — the SURVEY §7 stage-5
# flagship.  For one (row-block × col-block) tile of the dense pair grid
# (reference hot ops: messages charge_gn.py:62-70, electron passing
# charge_gn.py:101-118) the kernel:
#
#   1. rebuilds squared distances from coordinates (per-axis broadcast
#      subtraction — no cancellation-prone |x|²+|y|²−2xy),
#   2. applies the cosine envelope + Gaussian RBF + is-near gate
#      (epnn_tpu.ops.fused.rbf_and_gate semantics) entirely in VMEM,
#   3. contracts the RBF channels against the first-layer e-slice (MXU),
#   4. builds the first-layer activations from the per-atom projections,
#      for the EPN kernel in BOTH pair orderings,
#   5. runs the mid layer (MXU), and
#   6. accumulates row sums — for EPN the antisymmetric transfer
#      0.5·gate·(f_ij − f_ji), whose in-tile cancellation keeps the global
#      transfer matrix exactly antisymmetric under any block schedule.
#
# The (N², e_dim) edge tensor and (N², H) activations never exist in HBM:
# per-tile HBM traffic is O(block·(H + 3)) reads + O(block_i·H) writes.
# The final linear head commutes with the j-sum (affine), so W_out/b_out
# are applied by the caller on the (N, H) row sums.
# ---------------------------------------------------------------------------


def _tile_rbf_flat(xr, xcT, mi, mj, ri0, rj0, *, cutoff, eta, e_dim,
                   tol, method="direct"):
    """Shared in-tile featurization.  Returns (rbf_flat (BI·BJ, e_dim),
    c (BI, BJ) masked envelope, pairm (BI, BJ), gate (BI, BJ) hard is-near
    gate) for one pair tile.

    xr: (BI, 3) row coords; xcT: (3, BJ) col coords (pre-transposed so the
    kernel never transposes); mi/mj: (BI, 1)/(1, BJ) node masks; ri0/rj0:
    global offsets of the tile for the self-pair exclusion.

    ``method`` selects how the e_dim RBF channels are built:

    * ``"direct"`` — one exp per (pair, channel) element, the textbook form.
    * ``"doubling"`` — the uniform mu grid makes consecutive channels a
      geometric recurrence, rbf_ch = env · R0 · u^ch · g_ch with
      u = exp(2ηΔ(d−mu0)), R0 = exp(−η(d−mu0)²), g_ch = exp(−ηΔ²ch²):
      only TWO exps per pair, with the Vandermonde term u^ch assembled
      across the channel lanes by log₂(e_dim) masked squarings (Mosaic-safe:
      2-D u, 3-D broadcasts only).  Distances are clamped to the cutoff
      first — beyond it the envelope is exactly 0, and unclamped u^ch would
      overflow for far padded atoms.  Agreement with "direct" is ~1e-6
      relative (exponent-domain rounding amplified by ch ≤ e_dim−1).

      NOT PARITY-GRADE: the ~1e-6 rounding can flip the hard is-near gate
      (the clip-vs-tol threshold below) for a pair channel sitting exactly
      at the tolerance boundary, changing the electron-pass candidate set
      relative to "direct".  The flip is pair-symmetric, so conservation
      holds either way — but golden-artifact parity is only guaranteed
      with the default "direct" method.

      MEASURED AND REJECTED as the default (round 3, v5e): exp is cheap on
      the TPU transcendental unit, so trading 1 exp/element for ~12
      select/multiply ops/element runs ~2.2× SLOWER (26 vs 12 ms at
      N=2304), and the unrolled masked-squaring chain raises scoped-VMEM
      pressure (OOMs at block_i=64; needs ≤32).  Kept as a verified option
      because the tradeoff may flip on hardware with slower transcendentals.
    """
    bi = xr.shape[0]
    bj = xcT.shape[1]
    d2 = jnp.zeros((bi, bj), jnp.float32)
    for k in range(3):
        diff = xr[:, k:k + 1] - xcT[k:k + 1, :]
        d2 = d2 + diff * diff
    d = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
    d = jnp.where(d2 > 0.0, d, 0.0)

    c = (jnp.cos(jnp.pi * d / cutoff) + 1.0) * 0.5
    c = jnp.where(d >= cutoff, 0.0, c)
    c = jnp.where(d <= 0.0, 1.0, c)
    rows = ri0 + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 0)
    cols = rj0 + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1)
    pairm = mi * mj                                   # (BI, BJ)
    cmask = pairm * (rows != cols).astype(jnp.float32)
    c = c * cmask

    # mu grid from int iota (float/1-D iota is unsupported in Mosaic)
    mu0 = 0.1
    ch3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e_dim), 2)
    chf3 = ch3.astype(jnp.float32)

    if method == "doubling":
        delta = (cutoff - mu0) / (e_dim - 1)
        dc = jnp.minimum(d, cutoff) - mu0             # (BI, BJ), bounded
        env_r0 = c * jnp.exp(-eta * dc * dc)          # env · R0, one exp
        u = jnp.exp((2.0 * eta * delta) * dc)         # one exp
        rbf3 = env_r0[:, :, None] * jnp.exp(
            (-eta * delta * delta) * chf3 * chf3)     # (BI, BJ, E)
        up = u
        nbits = max(1, int(e_dim - 1).bit_length())
        for b in range(nbits):
            hit = ((ch3 >> b) & 1) == 1               # (1, 1, E) bool
            rbf3 = jnp.where(hit, rbf3 * up[:, :, None], rbf3)
            if b + 1 < nbits:
                up = up * up
    else:
        mu = mu0 + (cutoff - mu0) * chf3 / (e_dim - 1)
        c3 = c[:, :, None]
        d3 = d[:, :, None]
        rbf3 = c3 * jnp.exp(-eta * (d3 - mu) ** 2)
    # hard is-near gate (charge_gn.py:90-94), reduced from the 3-D rbf so it
    # lands directly in (BI, BJ)
    gate = (jnp.max(jnp.clip(rbf3, tol, 1e5), axis=-1) != tol).astype(
        jnp.float32)
    # NOTE: no (BI, BJ, 1) <-> (BI·BJ, 1) reshapes anywhere — 1-lane arrays
    # are tile-padded, so those collapses are relayouts this environment's
    # Mosaic compiler crashes on.  Gates/masks stay 2-D (BI, BJ); callers
    # apply them to wide tensors in 3-D space (layout-free broadcasts).
    return rbf3.reshape(bi * bj, e_dim), c, pairm, gate


def _epn_kernel(pi_r, pj_r, pi_c, pj_c, xr, xcT, mi, mjT, w1e, w2, b2,
                out_ref, *, cutoff, eta, e_dim, tol, soft_gate, prec,
                rbf_method="direct"):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bi = pi_r.shape[0]
    bj = pi_c.shape[0]
    h = pi_r.shape[1]

    rbf, c, _, hard_gate = _tile_rbf_flat(
        xr[:], xcT[:], mi[:][:, 0:1], mjT[:][0:1, :],
        i * bi, j * bj, cutoff=cutoff, eta=eta, e_dim=e_dim, tol=tol,
        method=rbf_method,
    )
    epart = jnp.dot(rbf, w1e[:], preferred_element_type=jnp.float32,
                    precision=prec)                           # (BI·BJ, H)

    # first layer, both orderings (b1 folded into pi by the caller);
    # leading-dim collapses of (BI, BJ, H) are layout-free
    base_n = (pi_r[:][:, None, :] + pj_c[:][None, :, :]).reshape(bi * bj, h)
    base_t = (pj_r[:][:, None, :] + pi_c[:][None, :, :]).reshape(bi * bj, h)
    hid_n = jax.nn.relu(base_n + epart)
    hid_t = jax.nn.relu(base_t + epart)
    hid_n = jax.nn.relu(jnp.dot(hid_n, w2[:], preferred_element_type=jnp.float32,
                                precision=prec) + b2[:])
    hid_t = jax.nn.relu(jnp.dot(hid_t, w2[:], preferred_element_type=jnp.float32,
                                precision=prec) + b2[:])
    gate = c if soft_gate else hard_gate             # (BI, BJ)
    diff3 = (hid_n - hid_t).reshape(bi, bj, h)
    partial = jnp.sum((0.5 * gate)[:, :, None] * diff3, axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _msg_rbf_kernel(pi_r, pj_c, xr, xcT, mi, mjT, cvT, w1e, w2, b2,
                    out_ref, *, cutoff, eta, e_dim, tol, masked, prec,
                    rbf_method="direct"):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bi = pi_r.shape[0]
    bj = pj_c.shape[0]
    h = pi_r.shape[1]

    rbf, _, pairm, _ = _tile_rbf_flat(
        xr[:], xcT[:], mi[:][:, 0:1], mjT[:][0:1, :],
        i * bi, j * bj, cutoff=cutoff, eta=eta, e_dim=e_dim, tol=tol,
        method=rbf_method,
    )
    epart = jnp.dot(rbf, w1e[:], preferred_element_type=jnp.float32,
                    precision=prec)
    base = (pi_r[:][:, None, :] + pj_c[:][None, :, :]).reshape(bi * bj, h)
    hid = jax.nn.relu(base + epart)
    hid = jax.nn.relu(jnp.dot(hid, w2[:], preferred_element_type=jnp.float32,
                              precision=prec) + b2[:])
    if masked:
        # pairwise mask incl. the diagonal (self-messages flow, matching the
        # dense model's pair_mask — only the RBF excludes self pairs)
        w = pairm                                    # (BI, BJ)
    else:
        # compat mode: every column of the caller's padded width counts
        # (SURVEY §8 Q10); cvT excludes only kernel padding
        w = jnp.ones((bi, 1), jnp.float32) * cvT[:][0:1, :]
    partial = jnp.sum(hid.reshape(bi, bj, h) * w[:, :, None], axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _pair_grid_specs(n, h, e_dim, block_i, block_j, extra):
    """BlockSpecs shared by the fused pair kernels: rows of pi/pj/xyz/mask
    indexed by i, col-side data by j — pre-transposed (dim, N) arrays where
    the kernel needs (1/3, BJ) slices without an in-kernel transpose."""
    row = lambda dim: pl.BlockSpec((block_i, dim), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    col = lambda dim: pl.BlockSpec((block_j, dim), lambda i, j: (j, 0),
                                   memory_space=pltpu.VMEM)
    rowT = lambda dim: pl.BlockSpec((dim, block_j), lambda i, j: (0, j),
                                    memory_space=pltpu.VMEM)
    whole = lambda a, b: pl.BlockSpec((a, b), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    return row, col, rowT, whole


@functools.partial(
    jax.jit,
    static_argnames=("cutoff", "eta", "tol", "soft_gate", "block_i",
                     "block_j", "precision", "interpret", "packed",
                     "rbf_method"),
)
def fused_epn_rowsum(
    pi: jax.Array,           # (N, H) row projections, first-layer bias folded
    pj: jax.Array,           # (N, H) col projections
    xyz: jax.Array,          # (N, 3)
    node_mask: jax.Array,    # (N,)
    w1e: jax.Array,          # (e_dim, H) first-layer RBF slice
    w2: jax.Array,           # (H, H) mid layer
    b2: jax.Array,           # (H,)
    cutoff: float = 3.0,
    eta: float = 2.0,
    tol: float = 1e-5,
    soft_gate: bool = False,
    block_i: int = 128,
    block_j: int = 128,
    precision: str = "default",
    interpret: bool | None = None,
    packed: bool | None = None,
    rbf_method: str = "direct",
) -> jax.Array:
    """One electron-passing round's antisymmetric row sums, fully fused:

        out_i = Σ_j 0.5 · gate_ij · (hid(i,j) − hid(j,i))      as (N, H)

    with RBF features, gate, both pair orderings, and the mid layer computed
    in-tile (reference ops ``charge_gn.py:101-118``).  The caller applies
    W_out (b_out cancels in the antisymmetric difference).  N must be padded
    to lcm(block_i, block_j); padded rows carry node_mask 0.

    ``packed`` (auto when H divides 128) selects the lane-packed variant:
    P pairs per 128-lane row, kron-structured weight matmuls at full MXU
    width; bitwise antisymmetry is preserved (see the packed-section note).
    """
    n, h = pi.shape
    e_dim = w1e.shape[0]
    assert n % block_i == 0 and n % block_j == 0, (n, block_i, block_j)
    if interpret is None:
        interpret = not _on_tpu()
    prec = {"default": None, "high": jax.lax.Precision.HIGHEST,
            "highest": jax.lax.Precision.HIGHEST}[precision]
    pack = max(1, 128 // h) if 128 % h == 0 else 1
    if packed is None:
        # default OFF: these kernels are featurization-bound (N²·e_dim
        # transcendentals dominate), so MXU packing measured SLOWER here
        # (120 vs 74 ms protein) — unlike the no-featurization far-field
        # kernel where it wins.  Kept as a verified option.
        packed = False
    if packed:
        if rbf_method != "direct":
            raise NotImplementedError(
                "packed=True stores distances per lane, where the direct "
                "method is already one exp/element — rbf_method="
                f"{rbf_method!r} is not implemented for the packed kernels")
        assert pack > 1 and n % pack == 0
        npk = n // pack
        block_jp = max(8, min(block_j // pack, npk))
        while npk % block_jp:
            block_jp //= 2
        ph, pe = pack * h, pack * e_dim
        xce, mc, cid, _ = _lane_tables(xyz, node_mask, pack, e_dim)
        pit = jnp.tile(pi, (1, pack))
        pjt = jnp.tile(pj, (1, pack))
        pip = pi.reshape(npk, ph)
        pjp = pj.reshape(npk, ph)
        row = lambda d: pl.BlockSpec((block_i, d), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM)
        colp = lambda d: pl.BlockSpec((block_jp, d), lambda i, j: (j, 0),
                                      memory_space=pltpu.VMEM)
        whole = lambda a, b: pl.BlockSpec((a, b), lambda i, j: (0, 0),
                                          memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _epn_packed_kernel, cutoff=float(cutoff), eta=float(eta),
            e_dim=e_dim, pack=pack, tol=float(tol), soft_gate=soft_gate,
            prec=prec,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n // block_i, npk // block_jp),
            in_specs=[
                row(ph), row(ph), colp(ph), colp(ph),   # pit, pjt, pip, pjp
                row(3),                                 # xyz rows
                colp(pe), colp(pe), colp(pe),           # lane coords x/y/z
                colp(pe), colp(pe), row(1),             # mask, colid, mi
                whole(pe, ph), whole(ph, ph), whole(1, ph), whole(pe, ph),
            ],
            out_specs=pl.BlockSpec((block_i, ph), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, ph), jnp.float32),
            interpret=interpret,
        )(pit, pjt, pip, pjp, xyz, *xce, mc, cid, node_mask[:, None],
          _kron_eye(w1e, pack), _kron_eye(w2, pack),
          jnp.tile(b2, pack)[None, :], _group_spread(pack, e_dim, h))
        return out.reshape(n, pack, h).sum(axis=1)

    nm2 = node_mask[:, None]
    nmT = node_mask[None, :]
    row, col, rowT, whole = _pair_grid_specs(n, h, e_dim, block_i, block_j, 0)
    kernel = functools.partial(
        _epn_kernel, cutoff=float(cutoff), eta=float(eta), e_dim=e_dim,
        tol=float(tol), soft_gate=soft_gate, prec=prec,
        rbf_method=rbf_method,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // block_i, n // block_j),
        in_specs=[
            row(h), row(h), col(h), col(h),        # pi_r, pj_r, pi_c, pj_c
            row(3), rowT(3),                       # xyz rows, xyzT cols
            row(1), rowT(1),                       # mask rows, maskT cols
            whole(e_dim, h), whole(h, h), whole(1, h),
        ],
        out_specs=pl.BlockSpec((block_i, h), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        interpret=interpret,
    )(pi, pj, pi, pj, xyz, xyz.T, nm2, nmT, w1e, w2, b2[None, :])


@functools.partial(
    jax.jit,
    static_argnames=("cutoff", "eta", "tol", "masked", "block_i", "block_j",
                     "precision", "interpret", "packed", "rbf_method"),
)
def fused_message_rowsum(
    pi: jax.Array,           # (N, H) row projections, first-layer bias folded
    pj: jax.Array,           # (N, H) col projections
    xyz: jax.Array,          # (N, 3)
    node_mask: jax.Array,    # (N,)
    col_vec: jax.Array,      # (N,) j-sum weights for compat mode
    w1e: jax.Array,          # (e_dim, H)
    w2: jax.Array,           # (H, H)
    b2: jax.Array,           # (H,)
    cutoff: float = 3.0,
    eta: float = 2.0,
    tol: float = 1e-5,
    masked: bool = True,
    block_i: int = 128,
    block_j: int = 128,
    precision: str = "default",
    interpret: bool | None = None,
    packed: bool | None = None,
    rbf_method: str = "direct",
) -> jax.Array:
    """One GNN message round's row sums with featurization fused in-tile:

        out_i = Σ_j w_ij · relu(relu(pi_i + pj_j + rbf_ij @ W1e) @ W2 + b2)

    (reference ops ``charge_gn.py:62-70``).  ``masked=True`` weights by the
    pairwise node mask (clean mode); ``masked=False`` weights by ``col_vec``
    (reference-compat Q10: all original padded columns count, kernel padding
    excluded).  The caller applies W_out and the Σ_j b_out term.

    ``packed`` (auto when H divides 128) selects the lane-packed variant.
    """
    n, h = pi.shape
    e_dim = w1e.shape[0]
    assert n % block_i == 0 and n % block_j == 0, (n, block_i, block_j)
    if interpret is None:
        interpret = not _on_tpu()
    prec = {"default": None, "high": jax.lax.Precision.HIGHEST,
            "highest": jax.lax.Precision.HIGHEST}[precision]
    pack = max(1, 128 // h) if 128 % h == 0 else 1
    if packed is None:
        packed = False  # featurization-bound — see fused_epn_rowsum note
    if packed:
        if rbf_method != "direct":
            raise NotImplementedError(
                "rbf_method is direct-only for the packed kernels — see "
                "fused_epn_rowsum")
        assert pack > 1 and n % pack == 0
        npk = n // pack
        block_jp = max(8, min(block_j // pack, npk))
        while npk % block_jp:
            block_jp //= 2
        ph, pe = pack * h, pack * e_dim
        wvec = node_mask if masked else col_vec
        xce, mc, cid, wsum = _lane_tables(xyz, node_mask, pack, e_dim,
                                          extra=None)
        # j-sum weights at H lanes per group (pairm keeps the diagonal)
        wsum = jnp.broadcast_to(
            wvec.astype(jnp.float32).reshape(npk, pack, 1), (npk, pack, h)
        ).reshape(npk, ph)
        pit = jnp.tile(pi, (1, pack))
        pjp = pj.reshape(npk, ph)
        row = lambda d: pl.BlockSpec((block_i, d), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM)
        colp = lambda d: pl.BlockSpec((block_jp, d), lambda i, j: (j, 0),
                                      memory_space=pltpu.VMEM)
        whole = lambda a, b: pl.BlockSpec((a, b), lambda i, j: (0, 0),
                                          memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _msg_packed_kernel, cutoff=float(cutoff), eta=float(eta),
            e_dim=e_dim, pack=pack, prec=prec,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n // block_i, npk // block_jp),
            in_specs=[
                row(ph), colp(ph),                      # pit, pjp
                row(3),                                 # xyz rows
                colp(pe), colp(pe), colp(pe),           # lane coords x/y/z
                colp(pe), colp(pe), row(1),             # mask, colid, mi
                colp(ph),                               # j-sum weights
                whole(pe, ph), whole(ph, ph), whole(1, ph),
            ],
            out_specs=pl.BlockSpec((block_i, ph), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, ph), jnp.float32),
            interpret=interpret,
        )(pit, pjp, xyz, *xce, mc, cid, node_mask[:, None], wsum,
          _kron_eye(w1e, pack), _kron_eye(w2, pack),
          jnp.tile(b2, pack)[None, :])
        out = out.reshape(n, pack, h).sum(axis=1)
        if masked:
            out = out * node_mask[:, None]  # row factor of the pair mask
        return out

    nm2 = node_mask[:, None]
    nmT = node_mask[None, :]
    row, col, rowT, whole = _pair_grid_specs(n, h, e_dim, block_i, block_j, 0)
    kernel = functools.partial(
        _msg_rbf_kernel, cutoff=float(cutoff), eta=float(eta), e_dim=e_dim,
        tol=float(tol), masked=masked, prec=prec, rbf_method=rbf_method,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // block_i, n // block_j),
        in_specs=[
            row(h), col(h),                        # pi rows, pj cols
            row(3), rowT(3),                       # xyz rows, xyzT cols
            row(1), rowT(1),                       # mask rows, maskT cols
            rowT(1),                               # col_vec (transposed) cols
            whole(e_dim, h), whole(h, h), whole(1, h),
        ],
        out_specs=pl.BlockSpec((block_i, h), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        interpret=interpret,
    )(pi, pj, xyz, xyz.T, nm2, nmT, col_vec[None, :], w1e, w2, b2[None, :])

# ---------------------------------------------------------------------------
# Neighbor-list construction as a single pass over the pair grid.
#
# XLA's top_k — what build_neighbors uses for the within-cutoff compaction —
# costs ~42 ms at N=17,760 on v5e (and degrades another ~9× under vmap).
# But the task is not selection-of-the-k-largest: it is "emit ALL columns
# with d < cutoff" (≤ k of them by the caller's contract), which one tile
# pass can do directly:
#
#   1. d² for the (BI × BJ) tile from coords (VPU),
#   2. hit = (d² < cutoff²) · not-self · node-mask pair   (BI, BJ),
#   3. exclusive per-row prefix count inside the tile via ONE matmul with a
#      strictly-lower-triangular ones matrix (MXU — no cumsum primitive
#      needed), plus a running per-row count carried across the j grid
#      dimension in VMEM scratch (Mosaic iterates j innermost),
#   4. slot = count + prefix; emit with a (BI, BJ, k) one-hot
#      (slot == lane) · hit reduced over the column axis — the same
#      broadcast-reduce shape the fused message kernels use,
#   5. tiles with no hits skip step 3-4 entirely (pl.when) — after a
#      spatial sort, that is ~85-90%% of tiles at protein density.
#
# Counts and column ids ride as f32 (exact to 2²⁴ ≫ any N here); hits
# beyond k slots are dropped exactly like top_k would drop them (the caller
# guarantees k ≥ the true max neighbor count).  Emitted order is ascending
# column index — build_neighbors emits nearest-first; both satisfy the
# contract (an unordered candidate set), downstream sums differ only by
# fp32 association.
#
# MEASURED AND REJECTED as the default (round 3, v5e): 396 ms vs top_k's
# 41 ms at N=17,760 (10.2 vs 3.5 ms at N=2,220) — the (BI, BJ, k) one-hot
# emit costs far more per element in Mosaic than the estimate, and on
# unsorted atoms nearly every tile has a hit so the early-exit never fires.
# Kept fully tested for hardware/shapes where XLA top_k is the pathology
# (e.g. under forced vmap, where top_k degrades ~9×).
# ---------------------------------------------------------------------------


def _nbr_compact_kernel(xr, xcT, mi, mjT, lt, idx_ref, msk_ref, cnt_ref, *,
                        cutoff, k):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bi = xr.shape[0]
    bj = xcT.shape[1]

    d2 = jnp.zeros((bi, bj), jnp.float32)
    for a in range(3):
        diff = xr[:, a:a + 1] - xcT[a:a + 1, :]
        d2 = d2 + diff * diff
    rows = i * bi + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 0)
    cols = j * bj + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1)
    hit = ((d2 < cutoff * cutoff)
           & (rows != cols)).astype(jnp.float32) * (mi[:][:, 0:1] * mjT[:][0:1, :])

    @pl.when(j == 0)
    def _():
        idx_ref[:] = jnp.zeros(idx_ref.shape, idx_ref.dtype)
        msk_ref[:] = jnp.zeros(msk_ref.shape, msk_ref.dtype)
        cnt_ref[:] = jnp.zeros(cnt_ref.shape, cnt_ref.dtype)

    @pl.when(jnp.sum(hit) > 0.0)
    def _():
        # exclusive prefix within the tile (MXU), plus the carried count
        prefix = jnp.dot(hit, lt[:], preferred_element_type=jnp.float32)
        slot = cnt_ref[:][:, 0:1] + prefix                # (BI, BJ) f32
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, k), 2).astype(jnp.float32)
        onehot = (slot[:, :, None] == lane).astype(jnp.float32) \
            * hit[:, :, None]                             # (BI, BJ, k)
        colf = cols.astype(jnp.float32)
        idx_ref[:] = idx_ref[:] + jnp.sum(onehot * colf[:, :, None], axis=1)
        msk_ref[:] = msk_ref[:] + jnp.sum(onehot, axis=1)
        cnt_ref[:] = cnt_ref[:] + jnp.sum(hit, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("cutoff", "k", "block_i", "block_j",
                              "interpret"),
)
def neighbor_compact(
    xyz: jax.Array,          # (N, 3)
    node_mask: jax.Array,    # (N,)
    cutoff: float,
    k: int,
    block_i: int = 64,
    block_j: int = 128,
    interpret: bool | None = None,
):
    """(idx, nbr_mask), each (N, k): all within-cutoff pairs, kernel-built.

    Drop-in for :func:`epnn_tpu.ops.fused.build_neighbors` (same contract:
    requires k ≥ the true max neighbor count or pairs are silently dropped;
    invalid slots carry ``nbr_mask == 0`` with idx 0).  Neighbors come out
    in ascending column order rather than top_k's nearest-first — the set
    is identical.
    """
    n = xyz.shape[0]
    if interpret is None:
        interpret = not _on_tpu()
    if n < 128 and interpret:
        # small test blocks only in interpret mode — compiled Mosaic needs
        # the last block dim to be a multiple of 128 or the full axis
        block_i = block_j = 8
    lcm = int(np.lcm(block_i, block_j))
    n_pad = int(-(-n // lcm) * lcm)
    xyz_p = jnp.pad(xyz.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    mask_p = jnp.pad(node_mask.astype(jnp.float32), (0, n_pad - n))
    lt = jnp.triu(jnp.ones((block_j, block_j), jnp.float32), 1)  # strict
    # (dot(hit, LT): [b, c] = Σ_{c'} hit[b, c']·LT[c', c] counts c' < c)

    kernel = functools.partial(_nbr_compact_kernel, cutoff=float(cutoff), k=k)
    row = lambda d: pl.BlockSpec((block_i, d), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM)
    rowT = lambda d: pl.BlockSpec((d, block_j), lambda i, j: (0, j),
                                  memory_space=pltpu.VMEM)
    whole = lambda a, b: pl.BlockSpec((a, b), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    idxf, msk = pl.pallas_call(
        kernel,
        grid=(n_pad // block_i, n_pad // block_j),
        in_specs=[
            row(3), rowT(3),                     # xyz rows, xyzT cols
            row(1), rowT(1),                     # mask rows, maskT cols
            whole(block_j, block_j),             # strict-lower-tri ones
        ],
        out_specs=[
            pl.BlockSpec((block_i, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_i, 1), jnp.float32)],
        interpret=interpret,
    )(xyz_p, xyz_p.T, mask_p[:, None], mask_p[None, :], lt)
    idx = jnp.clip(idxf[:n], 0, n - 1).astype(jnp.int32)
    return idx, msk[:n]


# ---------------------------------------------------------------------------
# Lane-packed variants of the fused pair kernels.  Same math, MXU-shaped:
# P = 128 // H column pairs are packed per 128-lane row (as in
# dense_message_rowsum), the first-layer e-contraction runs against
# kron(I_P, W1e) and the mid layer against kron(I_P, W2) at full width.
#
# Bitwise antisymmetry survives the packing: a pair (i, j) occupies
# different lane groups on the two row sides, but the kron-structured
# weights make every cross-group product an exact zero, so each output lane
# accumulates exactly its own group's products — bitwise identical values in
# both positions.  Addition commutes exactly in IEEE, and (a−b)² == (b−a)²,
# so the in-tile cancellation argument of the unpacked kernels carries over.
# ---------------------------------------------------------------------------


def _lane_tables(xyz, node_mask, pack, width, extra=None):
    """Column-side lane tables: per packed row of P atoms, each atom's value
    is repeated across its ``width``-lane group.  Built OUTSIDE the kernel
    (XLA handles these relayouts; Mosaic must never see narrow reshapes).

    Returns (coords (N/P, 3·P·width), mask (N/P, P·width),
             colid (N/P, P·width) float ids, extra (N/P, P·width) or None).
    """
    n = xyz.shape[0]
    npk = n // pack

    def rep(v):  # (N,) -> (N/P, P*width)
        return jnp.broadcast_to(
            v.reshape(npk, pack, 1), (npk, pack, width)
        ).reshape(npk, pack * width)

    coords = tuple(rep(xyz[:, k]) for k in range(3))  # 3 × (N/P, P·width):
    # separate arrays so kernels never slice them (x[None, :, a:b] lowers to
    # a gather, which Mosaic rejects)
    mask = rep(node_mask.astype(jnp.float32))
    colid = rep(jnp.arange(n, dtype=jnp.float32))
    ex = rep(extra.astype(jnp.float32)) if extra is not None else None
    return coords, mask, colid, ex


def _kron_eye(w, pack):
    return jnp.kron(jnp.eye(pack, dtype=w.dtype), w)


def _group_spread(pack, e_dim, h):
    """(P·e_dim, P·H) 0/1 matrix mapping channel lanes -> their group's H
    lanes (for per-group any()/mean() reductions via one MXU pass)."""
    s = np.zeros((pack * e_dim, pack * h), np.float32)
    for g in range(pack):
        s[g * e_dim:(g + 1) * e_dim, g * h:(g + 1) * h] = 1.0
    return jnp.asarray(s)


def _packed_rbf(xr, xce, mc, cid, mi, ri0, *, cutoff, eta, e_dim, pack, prec):
    """In-tile packed featurization: rbf_flat (BI·BJP, P·e_dim) with the
    envelope/validity mask folded in, plus the 2-D masked envelope."""
    bi = xr.shape[0]
    bjp = xce[0].shape[0]
    pe = pack * e_dim
    d2 = jnp.zeros((bi, bjp, pe), jnp.float32)
    for k in range(3):
        diff = xr[:, k:k + 1][:, :, None] - xce[k][None, :, :]
        d2 = d2 + diff * diff
    d = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
    d = jnp.where(d2 > 0.0, d, 0.0)
    c = (jnp.cos(jnp.pi * d / cutoff) + 1.0) * 0.5
    c = jnp.where(d >= cutoff, 0.0, c)
    c = jnp.where(d <= 0.0, 1.0, c)
    rows = ri0 + jax.lax.broadcasted_iota(
        jnp.int32, (bi, 1, 1), 0).astype(jnp.float32)  # int iota only (Mosaic)
    notself = (rows != cid[None, :, :]).astype(jnp.float32)
    c = c * (mi[:, :, None] * mc[None, :, :] * notself)
    # mu per lane: channel index = lane % e_dim (same grid in every group)
    ch = jnp.mod(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, pe), 2), e_dim
    ).astype(jnp.float32)
    mu = 0.1 + (cutoff - 0.1) * ch / (e_dim - 1)
    rbf3 = c * jnp.exp(-eta * (d - mu) ** 2)
    return rbf3.reshape(bi * bjp, pe), c


def _epn_packed_kernel(pit, pjt, pip, pjp, xr, xce0, xce1, xce2, mc, cid,
                       mi, w1ep, w2p, b2p, spread, out_ref, *,
                       cutoff, eta, e_dim, pack, tol, soft_gate, prec):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bi, ph = pit.shape
    bjp = pjp.shape[0]
    h = ph // pack

    rbf, c3 = _packed_rbf(
        xr[:], (xce0[:], xce1[:], xce2[:]), mc[:], cid[:], mi[:][:, 0:1],
        i * bi, cutoff=cutoff, eta=eta, e_dim=e_dim, pack=pack, prec=prec,
    )
    epart = jnp.dot(rbf, w1ep[:], preferred_element_type=jnp.float32,
                    precision=prec)                       # (BI·BJP, P·H)
    base_n = (pit[:][:, None, :] + pjp[:][None, :, :]).reshape(bi * bjp, ph)
    base_t = (pjt[:][:, None, :] + pip[:][None, :, :]).reshape(bi * bjp, ph)
    hid_n = jax.nn.relu(base_n + epart)
    hid_t = jax.nn.relu(base_t + epart)
    hid_n = jax.nn.relu(jnp.dot(hid_n, w2p[:], preferred_element_type=jnp.float32,
                                precision=prec) + b2p[:])
    hid_t = jax.nn.relu(jnp.dot(hid_t, w2p[:], preferred_element_type=jnp.float32,
                                precision=prec) + b2p[:])
    if soft_gate:
        # per-group mean of e_dim identical envelope values == the envelope
        # (up to one rounding of sum/e_dim — symmetric on both pair sides)
        gate = jnp.dot(c3.reshape(bi * bjp, pack * e_dim), spread[:],
                       preferred_element_type=jnp.float32) / e_dim
    else:
        hit = (jnp.clip(rbf, tol, 1e5) != tol).astype(jnp.float32)
        gate = jnp.minimum(
            jnp.dot(hit, spread[:], preferred_element_type=jnp.float32), 1.0
        )
    diff = (0.5 * gate) * (hid_n - hid_t)
    partial = jnp.sum(diff.reshape(bi, bjp, ph), axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _msg_packed_kernel(pit, pjp, xr, xce0, xce1, xce2, mc, cid, mi, wsum,
                       w1ep, w2p, b2p, out_ref, *, cutoff, eta, e_dim, pack,
                       prec):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bi, ph = pit.shape
    bjp = pjp.shape[0]

    rbf, _ = _packed_rbf(
        xr[:], (xce0[:], xce1[:], xce2[:]), mc[:], cid[:], mi[:][:, 0:1],
        i * bi, cutoff=cutoff, eta=eta, e_dim=e_dim, pack=pack, prec=prec,
    )
    epart = jnp.dot(rbf, w1ep[:], preferred_element_type=jnp.float32,
                    precision=prec)
    base = (pit[:][:, None, :] + pjp[:][None, :, :]).reshape(bi * bjp, ph)
    hid = jax.nn.relu(base + epart)
    hid = jax.nn.relu(jnp.dot(hid, w2p[:], preferred_element_type=jnp.float32,
                              precision=prec) + b2p[:])
    # wsum: (BJP, P·H) per-column j-sum weights (pairm diag kept / col_vec);
    # the row-side mask factor (masked mode) is applied by the wrapper
    partial = jnp.sum(hid.reshape(bi, bjp, ph) * wsum[:][None, :, :], axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial

# ---------------------------------------------------------------------------
# Custom VJP for the packed far-field kernel: a single backward kernel that
# RECOMPUTES the two-layer activations in-tile (no residuals — the (N², H)
# activations never existed in the forward either) and emits all four
# gradients in one pass over the pair grid:
#
#   out_i = Σ_j cv_j · relu(z2_ij),  z2 = relu(z1) @ W2 + b2,  z1 = pi_i+pj_j
#
#   ē2 = cv_j · ḡ_i ⊙ 1[z2>0]         p̄i_i = Σ_j z̄1_ij   (accumulated over j)
#   z̄1 = (ē2 @ W2ᵀ) ⊙ 1[z1>0]         p̄j_j = Σ_i z̄1_ij   (accumulated over i)
#   W̄2 = Σ relu(z1)ᵀ ē2               b̄2  = Σ ē2          (all grid steps)
#
# This makes forward_blocked(use_pallas=True) differentiable, so the same
# kernel that serves inference also drives protein-scale training.
# ---------------------------------------------------------------------------


def _msg_bwd_kernel(pi_ref, pjp, mjp, g_ref, w2p, w2pT, b2p,
                    dpi_ref, dpj_ref, dw2_ref, db2_ref, *, prec, pack):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bjp, ph = pjp.shape
    bi = pi_ref.shape[0]
    # in-tile lane spreads (exact concat-style copies) — neither the tiled
    # pi nor the tiled cotangent ever exists in HBM
    pit = pltpu.repeat(pi_ref[:], pack, axis=1) if pack > 1 else pi_ref[:]
    gt = pltpu.repeat(g_ref[:], pack, axis=1) if pack > 1 else g_ref[:]

    z1 = (pit[:, None, :] + pjp[:][None, :, :]).reshape(bi * bjp, ph)
    a1 = jax.nn.relu(z1)
    z2 = jnp.dot(a1, w2p[:], preferred_element_type=jnp.float32,
                 precision=prec) + b2p[:]
    e2 = ((gt[:][:, None, :] * mjp[:][None, :, :]).reshape(bi * bjp, ph)
          * (z2 > 0.0).astype(jnp.float32))
    z1bar = (jnp.dot(e2, w2pT[:], preferred_element_type=jnp.float32,
                     precision=prec)
             * (z1 > 0.0).astype(jnp.float32))

    dpi = jnp.sum(z1bar.reshape(bi, bjp, ph), axis=1)          # (BI, PH)
    dpj = jnp.sum(z1bar.reshape(bi, bjp, ph), axis=0)          # (BJP, PH)
    dw2 = jax.lax.dot_general(                                  # (PH, PH)
        a1, e2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    db2 = jnp.sum(e2, axis=0, keepdims=True)                    # (1, PH)

    @pl.when(j == 0)
    def _():
        dpi_ref[:] = dpi

    @pl.when(j > 0)
    def _():
        dpi_ref[:] = dpi_ref[:] + dpi

    @pl.when(i == 0)
    def _():
        dpj_ref[:] = dpj

    @pl.when(i > 0)
    def _():
        dpj_ref[:] = dpj_ref[:] + dpj

    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _():
        dw2_ref[:] = dw2
        db2_ref[:] = db2

    @pl.when(jnp.logical_not(first))
    def _():
        dw2_ref[:] = dw2_ref[:] + dw2
        db2_ref[:] = db2_ref[:] + db2


def _dense_message_rowsum_impl(pi, pj, col_vec, w2, b2, block_i, block_jp,
                               precision, interpret, mid_dtype="float32"):
    """Shared forward implementation (see dense_message_rowsum's docstring).

    Rectangular by construction: ``pi`` may carry R rows against ``pj``'s N
    columns (R == N single-chip; R == N/D per device in the atom-sharded
    forward, where each shard reduces its row block against the full
    replicated column set).

    ``pi`` enters the kernel RAW (R, H): the P-group lane spread happens
    in-tile via ``pltpu.repeat`` (exact concat-style lane copy), so the
    (R, P·H) tiled array never exists in HBM.  Only ``pj``'s packed
    (N/P, P·H) view is materialized (a pure row→lane relayout XLA emits as
    one copy per round).

    ``mid_dtype='int8'`` switches the mid matmul to the quantized
    fast-mode tier: per-output-column weight scales here, per-row
    activation scales in-tile (see ``_msg_kernel``).
    """
    r, h = pi.shape
    n = pj.shape[0]
    pack = max(1, 128 // h) if 128 % h == 0 else 1
    if interpret is None:
        interpret = not _on_tpu()
    prec = {
        "default": None,
        "high": jax.lax.Precision.HIGHEST,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]

    np_rows = n // pack
    block_jp = min(block_jp, np_rows)
    block_i = min(block_i, r)
    assert r % block_i == 0 and np_rows % block_jp == 0, (r, n, block_i,
                                                          block_jp)

    ph = pack * h
    pjp = pj.reshape(np_rows, ph)                      # (N/P, P·H)
    mjp = jnp.repeat(col_vec[:, None], h, axis=1).reshape(np_rows, ph)
    if pack > 1:
        w2p = jnp.kron(jnp.eye(pack, dtype=w2.dtype), w2)
        b2p = jnp.tile(b2, pack)
    else:
        w2p, b2p = w2, b2

    if mid_dtype == "int8":
        # per-output-column symmetric weight scales; kron zeros stay 0
        sw = jnp.maximum(jnp.max(jnp.abs(w2p), axis=0), 1e-30) / 127.0
        w2p = jnp.clip(jnp.round(w2p / sw), -127, 127).astype(jnp.int8)
        # per-tensor activation bound: hid = relu(pi + pj) ≤ relu of the
        # two maxima (cheap O(N) reduces here, nothing per tile)
        s_in = jnp.maximum(
            jax.nn.relu(jnp.max(pi) + jnp.max(pj)), 1e-30) / 127.0
        # rows: [bias; dequant scale per column; quant scale broadcast]
        baux = jnp.stack([b2p, s_in * sw,
                          jnp.broadcast_to(1.0 / s_in, b2p.shape)])
    else:
        baux = b2p[None, :]

    grid = (r // block_i, np_rows // block_jp)
    kernel = functools.partial(_msg_kernel, prec=prec, pack=pack,
                               mid_dtype=mid_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, h), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_jp, ph), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_jp, ph), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, ph), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(baux.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, ph), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, ph), jnp.float32),
        interpret=interpret,
    )(pi, pjp, mjp, w2p, baux)
    return out.reshape(r, pack, h).sum(axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _dense_message_rowsum_cvjp(pi, pj, col_vec, w2, b2, block_i, block_jp,
                               precision, interpret, mid_dtype):
    return _dense_message_rowsum_impl(pi, pj, col_vec, w2, b2, block_i,
                                      block_jp, precision, interpret,
                                      mid_dtype)


def _dmr_fwd(pi, pj, col_vec, w2, b2, block_i, block_jp, precision, interpret,
             mid_dtype):
    out = _dense_message_rowsum_impl(pi, pj, col_vec, w2, b2, block_i,
                                     block_jp, precision, interpret,
                                     mid_dtype)
    return out, (pi, pj, col_vec, w2, b2)


def _dmr_bwd(block_i, block_jp, precision, interpret, mid_dtype, res, gbar):
    pi, pj, col_vec, w2, b2 = res
    r, h = pi.shape
    n = pj.shape[0]
    pack = max(1, 128 // h) if 128 % h == 0 else 1
    # The backward tile holds ~5 (BI·BJP, P·H) temporaries (z1/a1/z2/e2/
    # z1bar) plus the in-tile repeats; at the forward's (128, 64) blocks
    # Mosaic's scoped-vmem stack overflows on v5e (r4e battery: compile
    # "Ran out of memory in memory space vmem").  Half-size rows keep the
    # backward comfortably inside while the grid merely doubles.
    block_i = min(block_i, 64)
    if interpret is None:
        interpret = not _on_tpu()
    prec = {
        "default": None,
        "high": jax.lax.Precision.HIGHEST,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]

    np_rows = n // pack
    block_jp = min(block_jp, np_rows)
    block_i = min(block_i, r)
    ph = pack * h
    pjp = pj.reshape(np_rows, ph)
    mjp = jnp.repeat(col_vec[:, None], h, axis=1).reshape(np_rows, ph)
    g32 = gbar.astype(jnp.float32)       # (R, H): spread happens in-tile
    if pack > 1:
        w2p = jnp.kron(jnp.eye(pack, dtype=w2.dtype), w2)
        b2p = jnp.tile(b2, pack)
    else:
        w2p, b2p = w2, b2

    grid = (r // block_i, np_rows // block_jp)
    kernel = functools.partial(_msg_bwd_kernel, prec=prec, pack=pack)
    row = lambda d: pl.BlockSpec((block_i, d), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM)
    colp = lambda d: pl.BlockSpec((block_jp, d), lambda i, j: (j, 0),
                                  memory_space=pltpu.VMEM)
    whole = lambda a, b: pl.BlockSpec((a, b), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    dpit, dpjp, dw2p, db2p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row(h), colp(ph), colp(ph), row(h),
            whole(ph, ph), whole(ph, ph), whole(1, ph),
        ],
        out_specs=[
            row(ph),                                    # dpi (accum over j)
            colp(ph),                                   # dpj (accum over i)
            whole(ph, ph),                              # dW2p (accum all)
            whole(1, ph),                               # db2p (accum all)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, ph), jnp.float32),
            jax.ShapeDtypeStruct((np_rows, ph), jnp.float32),
            jax.ShapeDtypeStruct((ph, ph), jnp.float32),
            jax.ShapeDtypeStruct((1, ph), jnp.float32),
        ],
        interpret=interpret,
    )(pi, pjp, mjp, g32, w2p, w2p.T, b2p[None, :])

    dpi = dpit.reshape(r, pack, h).sum(axis=1)          # untile
    dpj = dpjp.reshape(n, h)                            # unpack (layout-free)
    if pack > 1:
        # only the kron-diagonal h×h blocks of dW2p are real W2 gradient
        dw2 = sum(dw2p[g * h:(g + 1) * h, g * h:(g + 1) * h]
                  for g in range(pack))
        db2 = db2p[0].reshape(pack, h).sum(axis=0)
    else:
        dw2, db2 = dw2p, db2p[0]
    return (dpi.astype(pi.dtype), dpj.astype(pj.dtype),
            jnp.zeros_like(col_vec), dw2.astype(w2.dtype),
            db2.astype(b2.dtype))


_dense_message_rowsum_cvjp.defvjp(_dmr_fwd, _dmr_bwd)


# ---------------------------------------------------------------------------
# Fused NEAR-FIELD kernels: the gathered O(N·k) message correction and the
# antisymmetric electron-pass reduction, computed in-tile from pre-gathered
# flat inputs.
#
# Motivation (r5b-r5d batteries, N=17,760): the XLA near paths cost
# ~1.8 ms/round in context — ~1.0 ms/round of flat row gathers (which these
# kernels keep in XLA, where gathers belong) plus ~0.8 ms/round of k-minor
# layout copies and fusion churn around the (N, k, H) elementwise chain
# (trace copy.235/238, fusion.268/269/287/288).  Reformulating in XLA moved
# nothing (r5d: four variants within noise); tiling the chain in Pallas
# removes the layout copies entirely — only (N, ·) and flat (N·k, ·) arrays
# in their natural {1,0} layouts ever touch HBM.
#
# Shapes are Mosaic-safe by construction: leading collapse/split between
# (BI·K, H) and (BI, K, H) (wide lanes), 2-D masks broadcast onto 3-D via
# [:, :, None] multiplies, and the pass kernel's pair swap is a lane ROLL of
# the gathered [pin | pjn] 64-lane rows (pltpu.roll — exact lane copy, same
# family as the far-field kernel's pltpu.repeat spread).
#
# Bitwise antisymmetry of the pass kernel: pair (i, j) appears in row i as
# lanes [0:H) = relu-chain(pi_i + pj_j + e_ij) minus lanes-rolled
# relu-chain(pi_i? ...) — concretely d = hid − roll(hid, H), whose [0:H)
# lanes are hn_ij − ht_ij per slot, exactly the per-slot form of the XLA
# path; hn_ij and ht_ji are computed from identical gathered values with
# commuted adds and the same kron-structured matmuls, so they are bitwise
# equal and every pair's two transfer terms are exact negations — the same
# conservation argument as ops/fused.py's gathered pass path.
# ---------------------------------------------------------------------------


def _near_msg_kernel(pi_ref, pjn_ref, rbf_ref, mask_ref, w1e_ref, w2_ref,
                     b2_ref, out_ref, *, k, prec):
    bi, h = pi_ref.shape
    pjn = pjn_ref[:]                              # (BI·K, H)
    epart = jnp.dot(rbf_ref[:], w1e_ref[:],
                    preferred_element_type=jnp.float32, precision=prec)
    base = (pi_ref[:][:, None, :] + pjn.reshape(bi, k, h)).reshape(bi * k, h)
    hf = jax.nn.relu(
        jnp.dot(jax.nn.relu(base + epart), w2_ref[:],
                preferred_element_type=jnp.float32, precision=prec)
        + b2_ref[:])
    hn = jax.nn.relu(
        jnp.dot(jax.nn.relu(base), w2_ref[:],
                preferred_element_type=jnp.float32, precision=prec)
        + b2_ref[:])
    diff3 = (hf - hn).reshape(bi, k, h)
    out_ref[:] = jnp.sum(diff3 * mask_ref[:][:, :, None], axis=1)


def _near_msg_ref(pi, pjn, rbf, mask, w1e, w2, b2, prec):
    """XLA twin of the near-message kernel (same math, same op order) —
    the custom VJP recomputes through this for the backward pass."""
    n, h = pi.shape
    k = mask.shape[1]
    epart = jnp.dot(rbf, w1e, precision=prec)
    base = (pi[:, None, :] + pjn.reshape(n, k, h)).reshape(n * k, h)
    hf = jax.nn.relu(jnp.dot(jax.nn.relu(base + epart), w2,
                             precision=prec) + b2)
    hn = jax.nn.relu(jnp.dot(jax.nn.relu(base), w2, precision=prec) + b2)
    return jnp.sum((hf - hn).reshape(n, k, h) * mask[:, :, None], axis=1)


def _near_block(n, block_i):
    b = max(1, min(block_i, n))
    while n % b:
        b //= 2
    return b


def _near_msg_impl(pi, pjn, rbf, mask, w1e, w2, b2, block_i, precision,
                   interpret):
    n, h = pi.shape
    k = mask.shape[1]
    e = rbf.shape[1]
    if interpret is None:
        interpret = not _on_tpu()
    prec = {"default": None, "high": jax.lax.Precision.HIGHEST,
            "highest": jax.lax.Precision.HIGHEST}[precision]
    bi = _near_block(n, block_i)
    kernel = functools.partial(_near_msg_kernel, k=k, prec=prec)
    row = lambda d: pl.BlockSpec((bi, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    flat = lambda d: pl.BlockSpec((bi * k, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    whole = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // bi,),
        in_specs=[row(h), flat(h), flat(e), row(k),
                  whole(e, h), whole(h, h), whole(1, h)],
        out_specs=pl.BlockSpec((bi, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        interpret=interpret,
    )(pi, pjn, rbf, mask, w1e, w2, b2[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _near_msg_cvjp(pi, pjn, rbf, mask, w1e, w2, b2, block_i, precision,
                   interpret):
    return _near_msg_impl(pi, pjn, rbf, mask, w1e, w2, b2, block_i,
                          precision, interpret)


def _near_msg_fwd(pi, pjn, rbf, mask, w1e, w2, b2, block_i, precision,
                  interpret):
    out = _near_msg_impl(pi, pjn, rbf, mask, w1e, w2, b2, block_i,
                         precision, interpret)
    return out, (pi, pjn, rbf, mask, w1e, w2, b2)


def _near_msg_bwd(block_i, precision, interpret, res, g):
    pi, pjn, rbf, mask, w1e, w2, b2 = res
    prec = {"default": None, "high": jax.lax.Precision.HIGHEST,
            "highest": jax.lax.Precision.HIGHEST}[precision]
    _, vjp = jax.vjp(
        lambda *a: _near_msg_ref(*a, prec=prec),
        pi, pjn, rbf, mask, w1e, w2, b2)
    return vjp(g)


_near_msg_cvjp.defvjp(_near_msg_fwd, _near_msg_bwd)


@functools.partial(jax.jit,
                   static_argnames=("block_i", "precision", "interpret"))
def near_message_corr(
    pi: jax.Array,        # (N, H) row projections, first-layer bias folded
    pjn: jax.Array,       # (N·K, H) gathered col projections pj[idx.ravel()]
    rbf: jax.Array,       # (N·K, E) gathered-pair RBF features (mask-zeroed)
    mask: jax.Array,      # (N, K) neighbor-slot validity
    w1e: jax.Array,       # (E, H) first-layer RBF slice
    w2: jax.Array,        # (H, H) mid layer
    b2: jax.Array,        # (H,)
    block_i: int = 64,
    precision: str = "default",
    interpret: bool | None = None,
) -> jax.Array:
    """Near-field message correction, fused in-tile (reference hot op
    ``charge_gn.py:62-70`` restricted to the gathered near set):

        out_i = Σ_s mask_is · [mlp(pi_i + pjn_is + rbf_is@W1e) −
                               mlp(pi_i + pjn_is)]          as (N, H)

    with mlp(z) = relu(relu(z) @ W2 + b2) — the "with features minus
    no-feature double count" term of the neighbor-split decomposition
    (ops/fused.py:_forward_single_nbr).  Differentiable: the custom VJP
    recomputes through the XLA twin (_near_msg_ref)."""
    return _near_msg_cvjp(pi, pjn, rbf, mask, w1e, w2, b2, block_i,
                          precision, interpret)


def _near_pass_kernel(rs_ref, ppn_ref, rbf_ref, gh_ref, w1e2_ref, w22_ref,
                      b22_ref, out_ref, *, k, h, prec):
    bi, h2 = rs_ref.shape
    ppn = ppn_ref[:]                              # (BI·K, 2H) [pin | pjn]
    pp_rot = pltpu.roll(ppn, h, axis=1)           # [pjn | pin] (exact)
    epart = jnp.dot(rbf_ref[:], w1e2_ref[:],
                    preferred_element_type=jnp.float32, precision=prec)
    base = (rs_ref[:][:, None, :]
            + pp_rot.reshape(bi, k, h2)).reshape(bi * k, h2) + epart
    hid = jax.nn.relu(
        jnp.dot(jax.nn.relu(base), w22_ref[:],
                preferred_element_type=jnp.float32, precision=prec)
        + b22_ref[:])
    d = hid - pltpu.roll(hid, h, axis=1)          # lanes [0:H): hn − ht
    out_ref[:] = jnp.sum(d.reshape(bi, k, h2) * gh_ref[:][:, :, None],
                         axis=1)


def _near_pass_ref(rs, ppn, rbf, gh, w1e, w2, b2, prec):
    """XLA twin of the near-pass kernel (per-slot 0.5·gate·(hn − ht) form,
    identical to ops/fused.py's gathered pass path) — backward recompute."""
    n, h2 = rs.shape
    h = h2 // 2
    k = gh.shape[1]
    pi_r, pj_r = rs[:, :h], rs[:, h:]
    pin = ppn[:, :h].reshape(n, k, h)
    pjn = ppn[:, h:].reshape(n, k, h)
    epart = jnp.dot(rbf, w1e, precision=prec).reshape(n, k, h)
    hn = jax.nn.relu((pi_r[:, None, :] + pjn) + epart)
    ht = jax.nn.relu((pin + pj_r[:, None, :]) + epart)
    hn = jax.nn.relu(jnp.dot(hn, w2, precision=prec) + b2)
    ht = jax.nn.relu(jnp.dot(ht, w2, precision=prec) + b2)
    return jnp.sum(gh[:, :, None] * (hn - ht), axis=1)


def _near_pass_impl(rs, ppn, rbf, gh, w1e, w2, b2, block_i, precision,
                    interpret):
    n, h2 = rs.shape
    h = h2 // 2
    k = gh.shape[1]
    e = rbf.shape[1]
    if interpret is None:
        interpret = not _on_tpu()
    prec = {"default": None, "high": jax.lax.Precision.HIGHEST,
            "highest": jax.lax.Precision.HIGHEST}[precision]
    bi = _near_block(n, block_i)
    w1e2 = jnp.concatenate([w1e, w1e], axis=1)    # (E, 2H)
    w22 = jnp.kron(jnp.eye(2, dtype=w2.dtype), w2)
    b22 = jnp.tile(b2, 2)[None, :]
    kernel = functools.partial(_near_pass_kernel, k=k, h=h, prec=prec)
    row = lambda d: pl.BlockSpec((bi, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    flat = lambda d: pl.BlockSpec((bi * k, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    whole = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n // bi,),
        in_specs=[row(h2), flat(h2), flat(e), row(k),
                  whole(e, h2), whole(h2, h2), whole(1, h2)],
        out_specs=pl.BlockSpec((bi, h2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h2), jnp.float32),
        interpret=interpret,
    )(rs, ppn, rbf, gh, w1e2, w22, b22)
    return out[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _near_pass_cvjp(rs, ppn, rbf, gh, w1e, w2, b2, block_i, precision,
                    interpret):
    return _near_pass_impl(rs, ppn, rbf, gh, w1e, w2, b2, block_i,
                           precision, interpret)


def _near_pass_fwd(rs, ppn, rbf, gh, w1e, w2, b2, block_i, precision,
                   interpret):
    out = _near_pass_impl(rs, ppn, rbf, gh, w1e, w2, b2, block_i,
                          precision, interpret)
    return out, (rs, ppn, rbf, gh, w1e, w2, b2)


def _near_pass_bwd(block_i, precision, interpret, res, g):
    rs, ppn, rbf, gh, w1e, w2, b2 = res
    prec = {"default": None, "high": jax.lax.Precision.HIGHEST,
            "highest": jax.lax.Precision.HIGHEST}[precision]
    _, vjp = jax.vjp(
        lambda *a: _near_pass_ref(*a, prec=prec),
        rs, ppn, rbf, gh, w1e, w2, b2)
    return vjp(g)


_near_pass_cvjp.defvjp(_near_pass_fwd, _near_pass_bwd)


@functools.partial(jax.jit,
                   static_argnames=("block_i", "precision", "interpret"))
def near_pass_rowsum(
    rs: jax.Array,        # (N, 2H) [pi | pj] row projections (b1 in pi)
    ppn: jax.Array,       # (N·K, 2H) gathered rows rs[idx.ravel()]
    rbf: jax.Array,       # (N·K, E) gathered-pair RBF features
    gh: jax.Array,        # (N, K) 0.5 · gate (pass weighting, mask folded)
    w1e: jax.Array,       # (E, H)
    w2: jax.Array,        # (H, H)
    b2: jax.Array,        # (H,)
    block_i: int = 64,
    precision: str = "default",
    interpret: bool | None = None,
) -> jax.Array:
    """One electron-passing round's antisymmetric near-pair row sums,
    fused in-tile (reference ops ``charge_gn.py:101-118`` on the gathered
    near set):

        out_i = Σ_s gh_is · (mlp(pi_i + pj_{idx_is} + e_is)
                             − mlp(pi_{idx_is} + pj_i + e_is))   as (N, H)

    The caller applies W_out (b_out cancels in the difference) and adds to
    q.  Both pair orderings come from one 64-lane lane-roll of the fused
    [pi | pj] gather, so per-slot terms are exact negations across the two
    rows of a pair — conservation stays f32-grade (see the section note).
    Differentiable via XLA-recompute custom VJP (_near_pass_ref)."""
    return _near_pass_cvjp(rs, ppn, rbf, gh, w1e, w2, b2, block_i,
                           precision, interpret)
