"""Weighted k-means for the clustered far-field tier.

The far-field (beyond-cutoff) message reduction evaluates, for every atom i,

    Σ_j jvec_j · mids(relu(pi_i + pj_j))

over ALL columns j (reference hot loop ``charge_gn.py:62-70`` — there the
far pairs carry exactly-zero RBF features, so the pair pre-activation splits
into per-atom projections; see ``ops/fused.py``).  The exact round-1 collapse
(``_forward_single_nbr``) exploits that at h=0 the ``pj`` rows take at most
E+1 distinct values.  For h≠0 rounds the rows are no longer discrete, but in
physical systems they are highly clustered (atoms in similar environments
have similar hidden states): quantizing the ``pj`` rows to C weighted
centroids turns the O(N²) reduction into the SAME count-weighted O(N·C)
grid reduction, with an error bounded by

    |Δ(message term)_pair| ≤ L(mids ∘ w_out) · max_j ‖pj_j − c(j)‖₂

(relu is 1-Lipschitz).  Charge conservation is untouched: charges only move
in the electron-passing rounds, which are exact and antisymmetric — the
approximation enters solely through the hidden state h.

This module holds the in-graph clustering primitive and the error-bound
helpers that surface the approximation quality (max intra-cluster radius per
round × an upper bound on the MLP tail's Lipschitz constant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST


def weighted_kmeans(rows: jax.Array, weights: jax.Array, n_clusters: int,
                    iters: int = 8, *, fit_precision=HIGHEST,
                    fit_rows: int = 0, seed: str = "norm",
                    differentiable: bool = False):
    """Deterministic weighted Lloyd k-means, fully in-graph (jit/vmap-safe).

    ``rows`` (N, D): points to cluster (the per-round ``pj`` projections).
    ``weights`` (N,): nonnegative j-sum weights (the node mask in clean mode,
    the compat column indicator otherwise); zero-weight rows are ignored for
    centroid fitting and contribute zero cluster weight.

    Returns ``(centroids (C, D) f32, cluster_weights (C,) f32,
    max_radius scalar f32)`` where ``Σ_c cluster_weights_c = Σ_j weights_j``
    exactly (each row's weight lands in exactly one cluster) and
    ``max_radius = max_{j: w_j>0} ‖rows_j − centroids_{assign_j}‖₂`` — the
    quantity the far-field error bound is linear in.

    Determinism: centroids are seeded from the weighted rows at C norm
    quantiles (no RNG — repeated calls on the same inputs are identical, a
    serving requirement).  Empty clusters keep their previous centroid and
    carry zero weight (they then contribute exactly nothing downstream).

    Fit-cost knobs (all preserve determinism and the exactness of the final
    cluster weights/radius; they only move where the CENTROIDS land, i.e.
    the approximation quality, which ``max_radius`` reports faithfully):

    - ``fit_precision``: matmul precision for the assignment/update dots.
      The k-means is O(N·C·D) FLOPs — tiny — but HIGHEST costs 6 MXU passes
      per dot and the fit is a long sequential chain, so latency-bound
      serving configs can run it at default precision.
    - ``fit_rows``: when > 0, Lloyd iterations run on this many evenly
      spaced valid rows (same deterministic ordering as the seeds); the
      FINAL assignment/weights/radius still cover every row exactly.
    - ``seed``: ``"norm"`` (norm-quantile rows via one argsort — the
      default) or ``"stride"`` (every (nvalid/C)-th valid row in input
      order via cumsum+searchsorted — sort-free, for when the argsort
      dominates the fit).

    ``differentiable`` — exact-VJP-of-the-approximation mode for the
    clustered TRAINING tier: the Lloyd fit and the final assignment stay
    stop-gradient (the assignment is piecewise-constant in ``rows``, so
    its a.e. derivative is zero anyway), but the returned centroids are
    RECOMPUTED as the weighted mean of the differentiable ``rows`` over
    ALL rows under the final assignment.  Gradients then flow
    ``∂cent_c/∂rows_j = w_j/W_c`` for j in cluster c — the true Jacobian
    of the clustered forward almost everywhere — so the far-field
    ``∂L/∂pj`` path is exact for the approximation instead of dropped.
    Values change slightly vs the default (one extra half Lloyd step
    over all rows — a strictly tighter fit; with ``fit_rows`` subsampling
    the final average still covers every row); serving keeps the default
    for bitwise stability.  At C ≥ #distinct valid rows the clustered
    forward AND its gradients reduce to the exact dense reduction up to
    fp summation order (tests/test_cluster.py).
    """
    n, _ = rows.shape
    r32 = jax.lax.stop_gradient(rows.astype(jnp.float32))
    w32 = jax.lax.stop_gradient(weights.astype(jnp.float32))
    valid = w32 > 0
    nvalid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)

    def _valid_quantile_idx(m: int) -> jax.Array:
        """Indices of m evenly spaced valid rows, per the seed ordering."""
        take = (jnp.arange(m, dtype=jnp.int32) * nvalid) // m
        if seed == "stride":
            # position of the (t+1)-th valid row in input order: first j
            # with cumsum(valid)[j] >= t+1 — O(N) + m·log N, no sort
            cums = jnp.cumsum(valid.astype(jnp.int32))
            return jnp.searchsorted(cums, take + 1).astype(jnp.int32)
        # norm quantiles: order rows by squared norm with invalid rows
        # pushed past the end, then take m evenly spaced valid rows.  Norm
        # quantiles spread the seeds across the occupied shell structure;
        # Lloyd refinement does the rest.
        key = jnp.sum(r32 * r32, axis=1)
        key = jnp.where(valid, key, jnp.inf)
        return jnp.argsort(key)[take]

    if fit_rows and fit_rows < n:
        fit_idx = _valid_quantile_idx(fit_rows)
        rf, wf = r32[fit_idx], w32[fit_idx]
        # seeds: C evenly spaced of the fit rows (they are themselves evenly
        # spaced valid rows, so this matches the full-set quantile choice)
        cent0 = rf[(jnp.arange(n_clusters, dtype=jnp.int32)
                    * fit_rows) // n_clusters]
    else:
        rf, wf = r32, w32
        cent0 = r32[_valid_quantile_idx(n_clusters)]

    rn2 = jnp.sum(r32 * r32, axis=1)  # reused every iteration

    def _assign(cent, rws):
        # argmin_c ‖r − c‖² = argmin_c (‖c‖² − 2 r·c); ‖r‖² is row-constant.
        score = (jnp.sum(cent * cent, axis=1)[None, :]
                 - 2.0 * jnp.dot(rws, cent.T, precision=fit_precision))
        return jnp.argmin(score, axis=1), score

    def lloyd(cent, _):
        assign, _ = _assign(cent, rf)
        onehot = (assign[:, None]
                  == jnp.arange(n_clusters, dtype=assign.dtype)[None, :])
        wo = onehot.astype(jnp.float32) * wf[:, None]          # (Nf, C)
        wts = jnp.sum(wo, axis=0)
        sums = jnp.dot(wo.T, rf, precision=fit_precision)      # (C, D)
        cent_new = sums / jnp.maximum(wts, 1e-30)[:, None]
        return jnp.where((wts > 0)[:, None], cent_new, cent), None

    cent, _ = jax.lax.scan(lloyd, cent0, None, length=iters)

    assign, score = _assign(cent, r32)
    onehot = (assign[:, None]
              == jnp.arange(n_clusters, dtype=assign.dtype)[None, :])
    wts = jnp.sum(onehot.astype(jnp.float32) * w32[:, None], axis=0)
    if differentiable:
        # final half Lloyd step over ALL rows, on the DIFFERENTIABLE rows:
        # the returned centroids carry the true a.e. Jacobian of the
        # clustered forward (∂cent_c/∂rows_j = w_j/W_c, assignment fixed)
        rd = rows.astype(jnp.float32)
        wo = onehot.astype(jnp.float32) * w32[:, None]
        sums = jnp.dot(wo.T, rd, precision=fit_precision)
        cent = jnp.where((wts > 0)[:, None],
                         sums / jnp.maximum(wts, 1e-30)[:, None], cent)
        # radius against the RETURNED centroids (diagnostic — stop-grad)
        ca = jax.lax.stop_gradient(cent)[assign]
        d2 = jnp.sum((r32 - ca) ** 2, axis=1)
        d2 = jnp.where(valid, d2, 0.0)
        return cent, wts, jnp.sqrt(jnp.max(d2))
    # ‖r − c‖² from the assignment scores (add ‖r‖² back); clamp the
    # cancellation residue at 0
    d2 = jnp.take_along_axis(score, assign[:, None], axis=1)[:, 0] + rn2
    d2 = jnp.where(valid, jnp.maximum(d2, 0.0), 0.0)
    radius = jnp.sqrt(jnp.max(d2))
    return cent, wts, radius


def weighted_kmeans_sharded(rows: jax.Array, weights: jax.Array,
                            n_clusters: int, axis_name: str,
                            iters: int = 8, *,
                            differentiable: bool = False):
    """Distributed twin of :func:`weighted_kmeans` for row-sharded inputs
    (the ring path, where the per-round ``pj`` never materializes globally).

    Call INSIDE ``shard_map``: ``rows`` (nd, D) / ``weights`` (nd,) are this
    device's shard of the global (N, D)/(N,) arrays, row-sharded over
    ``axis_name``.  Returns the same ``(centroids (C, D), cluster_weights
    (C,), max_radius)`` triple, REPLICATED across the axis.

    Equivalence to the single-chip fit: the seed keys (squared row norms)
    are computed per row and all-gathered — O(N) floats, not O(N·D) rows —
    so the norm-quantile seed CHOICE is bitwise identical to
    :func:`weighted_kmeans` on the gathered array; seed rows are fetched
    with one masked-onehot matmul + ``psum`` (each global seed index is
    owned by exactly one device).  Lloyd updates accumulate per-device
    partial sums with ``psum``, so centroid trajectories agree with the
    single-chip fit to fp reduction-order noise only.
    """
    nd, _ = rows.shape
    r32 = jax.lax.stop_gradient(rows.astype(jnp.float32))
    w32 = jax.lax.stop_gradient(weights.astype(jnp.float32))
    valid = w32 > 0

    my_dev = jax.lax.axis_index(axis_name)
    my_start = my_dev * nd

    # ---- seeds: global norm quantiles (keys gathered, rows psum-fetched)
    key_l = jnp.sum(r32 * r32, axis=1)
    key_l = jnp.where(valid, key_l, jnp.inf)
    keys = jax.lax.all_gather(key_l, axis_name).reshape(-1)     # (N,)
    nvalid = jnp.maximum(
        jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), axis_name), 1)
    order = jnp.argsort(keys)
    take = (jnp.arange(n_clusters, dtype=jnp.int32) * nvalid) // n_clusters
    seed_g = order[take]                                        # (C,) global
    onehot_seed = (seed_g[:, None]
                   == (my_start + jnp.arange(nd, dtype=jnp.int32))[None, :])
    cent0 = jax.lax.psum(
        jnp.dot(onehot_seed.astype(jnp.float32), r32, precision=HIGHEST),
        axis_name)

    rn2 = jnp.sum(r32 * r32, axis=1)

    def _assign(cent):
        score = (jnp.sum(cent * cent, axis=1)[None, :]
                 - 2.0 * jnp.dot(r32, cent.T, precision=HIGHEST))
        return jnp.argmin(score, axis=1), score

    def lloyd(cent, _):
        assign, _ = _assign(cent)
        onehot = (assign[:, None]
                  == jnp.arange(n_clusters, dtype=assign.dtype)[None, :])
        wo = onehot.astype(jnp.float32) * w32[:, None]
        wts = jax.lax.psum(jnp.sum(wo, axis=0), axis_name)
        sums = jax.lax.psum(
            jnp.dot(wo.T, r32, precision=HIGHEST), axis_name)
        cent_new = sums / jnp.maximum(wts, 1e-30)[:, None]
        return jnp.where((wts > 0)[:, None], cent_new, cent), None

    cent, _ = jax.lax.scan(lloyd, cent0, None, length=iters)

    assign, score = _assign(cent)
    onehot = (assign[:, None]
              == jnp.arange(n_clusters, dtype=assign.dtype)[None, :])
    wts = jax.lax.psum(
        jnp.sum(onehot.astype(jnp.float32) * w32[:, None], axis=0),
        axis_name)
    if differentiable:
        # exact-VJP mode (see weighted_kmeans): final half Lloyd step over
        # all shards on the differentiable rows; psum carries the cotangent
        # back to each shard's rows in reverse
        rd = rows.astype(jnp.float32)
        wo = onehot.astype(jnp.float32) * w32[:, None]
        sums = jax.lax.psum(jnp.dot(wo.T, rd, precision=HIGHEST), axis_name)
        cent = jnp.where((wts > 0)[:, None],
                         sums / jnp.maximum(wts, 1e-30)[:, None], cent)
        ca = jax.lax.stop_gradient(cent)[assign]
        d2 = jnp.sum((r32 - ca) ** 2, axis=1)
        d2 = jnp.where(valid, d2, 0.0)
        return cent, wts, jnp.sqrt(jax.lax.pmax(jnp.max(d2), axis_name))
    d2 = jnp.take_along_axis(score, assign[:, None], axis=1)[:, 0] + rn2
    d2 = jnp.where(valid, jnp.maximum(d2, 0.0), 0.0)
    radius = jnp.sqrt(jax.lax.pmax(jnp.max(d2), axis_name))
    return cent, wts, radius


def mids_lipschitz_bound(w) -> float:
    """Upper bound on the Lipschitz constant of the message-MLP tail
    (mid layers + linear head) that maps a first-layer pre-activation row to
    the per-pair message contribution — host-side, from a ``PairMLPWeights``
    whose arrays may be round-stacked (leading T axis).

    Uses exact spectral norms (the matrices are tiny, ~32×32); relu is
    1-Lipschitz, so L = Π_m ‖W_m‖₂ · ‖W_out‖₂.  For round-stacked weights
    returns the max over rounds.  The far-field approximation then satisfies,
    per atom i and message round,

        ‖Δ(Σ_j jvec_j mids(relu(pi_i + pj_j)) @ w_out)‖₂
            ≤ (Σ_j jvec_j) · L · max_radius .
    """
    def spec(a) -> float:
        a = np.asarray(jax.device_get(a), dtype=np.float64)
        if a.ndim == 2:
            return float(np.linalg.norm(a, 2))
        return float(max(np.linalg.norm(a[t], 2) for t in range(a.shape[0])))

    l = spec(w.w_out)
    for wm, _bm in w.mids:
        l *= spec(wm)
    return l
