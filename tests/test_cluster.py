"""Clustered far-field tier: the k-means fit primitive and its gradient
modes (``epnn_tpu/ops/cluster.py``).

The tier itself (values, error bound, serving composition) is covered in
test_fused.py / test_sharding.py / test_train.py; this file pins the
``differentiable`` exact-VJP mode: the assignment stays stop-gradient
(piecewise constant — its a.e. derivative is zero), the returned
centroids carry the true Jacobian ``∂cent_c/∂rows_j = w_j/W_c`` for j in
cluster c, and end-to-end the clustered training loss differentiates
EXACTLY (finite differences of the actual clustered forward match the
autodiff directional derivative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnn_tpu.models import EPNNConfig
from epnn_tpu.ops.cluster import weighted_kmeans

SMALL = EPNNConfig(h_dim=16, e_dim=16, msg_dim=8, mlp_hidden=(8, 8), T=2)


@pytest.fixture
def blobs():
    """Three well-separated tight blobs + two zero-weight rows: the final
    assignment is unambiguous (nearest returned centroid == the fit's own
    assignment), which lets the test reconstruct the expected Jacobian."""
    g = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0, 0.0, 0.0],
                        [10.0, 0.0, 0.0, 0.0],
                        [0.0, 10.0, 0.0, 0.0]])
    rows = np.concatenate([
        centers[i] + 0.05 * g.normal(size=(4, 4)) for i in range(3)
    ]).astype(np.float32)                                   # (12, 4)
    w = g.uniform(0.5, 2.0, size=12).astype(np.float32)
    w[3] = 0.0
    w[7] = 0.0                                              # masked rows
    return rows, w


def test_differentiable_values_match_final_half_step(blobs):
    """differentiable=True returns the weighted mean of the rows under the
    final assignment (one extra half Lloyd step over ALL rows) with the
    same cluster weights, and the radius is consistent with the returned
    centroids."""
    rows, w = blobs
    cent0, wts0, _ = weighted_kmeans(jnp.array(rows), jnp.array(w), 3)
    cent, wts, rad = weighted_kmeans(jnp.array(rows), jnp.array(w), 3,
                                     differentiable=True)
    np.testing.assert_array_equal(np.asarray(wts), np.asarray(wts0))

    # reconstruct assignment by nearest pre-recompute centroid
    d = ((rows[:, None, :] - np.asarray(cent0)[None]) ** 2).sum(-1)
    assign = d.argmin(1)
    for c in range(3):
        sel = (assign == c) & (w > 0)
        expect = (w[sel, None] * rows[sel]).sum(0) / w[sel].sum()
        np.testing.assert_allclose(np.asarray(cent)[c], expect, rtol=1e-5)
    # radius against the returned centroids, valid rows only
    d2 = ((rows - np.asarray(cent)[assign]) ** 2).sum(-1)
    np.testing.assert_allclose(float(rad), np.sqrt(d2[w > 0].max()),
                               rtol=1e-5)


def test_differentiable_jacobian_is_weighted_mean(blobs):
    """∂cent_c/∂rows_j == (w_j / W_c) · I for j in cluster c, zero
    otherwise — and the default mode's gradient is exactly zero."""
    rows, w = blobs
    rows_j, w_j = jnp.array(rows), jnp.array(w)

    def cent_of(r, diff):
        return weighted_kmeans(r, w_j, 3, differentiable=diff)[0]

    jac = jax.jacrev(lambda r: cent_of(r, True))(rows_j)    # (3, 4, 12, 4)
    cent0 = weighted_kmeans(rows_j, w_j, 3)[0]
    d = ((rows[:, None, :] - np.asarray(cent0)[None]) ** 2).sum(-1)
    assign = d.argmin(1)
    W = np.array([(w * (assign == c)).sum() for c in range(3)])
    jac = np.asarray(jac)
    for c in range(3):
        for j in range(12):
            coeff = w[j] / W[c] if (assign[j] == c and w[j] > 0) else 0.0
            np.testing.assert_allclose(jac[c, :, j, :],
                                       coeff * np.eye(4), atol=1e-6)

    jac0 = jax.jacrev(lambda r: cent_of(r, False))(rows_j)
    assert float(jnp.abs(jac0).max()) == 0.0


def test_far_cluster_grad_end_to_end_fd(toy_pad_batch):
    """The exact-VJP mode differentiates the ACTUAL clustered training
    forward: central finite differences of the loss along a random
    parameter direction match the autodiff directional derivative — and
    the stop-grad mode's gradient differs (the far-field ∂L/∂pj path it
    drops is nonzero on this system)."""
    from epnn_tpu.train import create_state
    from epnn_tpu.train.loop import TrainConfig, _loss_fn_fused

    cfg = SMALL
    x, q0, xyz, mask, y, w = toy_pad_batch
    params = create_state(cfg, TrainConfig(), jax.random.key(0)).params

    def loss(p, diff):
        return _loss_fn_fused(p, cfg, "masked_mse", 8, 12, False,
                              x, q0, xyz, mask, y, w,
                              far_cluster=4, far_cluster_grad=diff)[0]

    g_exact = jax.grad(lambda p: loss(p, True))(params)
    g_stop = jax.grad(lambda p: loss(p, False))(params)

    # a deterministic unit direction over the param pytree
    leaves, treedef = jax.tree_util.tree_flatten(params)
    key = jax.random.key(7)
    dirs = []
    for leaf in leaves:
        key, sub = jax.random.split(key)
        dirs.append(jax.random.normal(sub, leaf.shape, leaf.dtype))
    norm = float(jnp.sqrt(sum(jnp.sum(d.astype(jnp.float32) ** 2)
                              for d in dirs)))
    dirs = [d / norm for d in dirs]
    dvec = jax.tree_util.tree_unflatten(treedef, dirs)

    def dot(a, b):
        return float(sum(jnp.vdot(x1, y1) for x1, y1 in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))))

    eps = 1e-3
    lp = float(loss(jax.tree_util.tree_map(lambda a, d: a + eps * d,
                                           params, dvec), True))
    lm = float(loss(jax.tree_util.tree_map(lambda a, d: a - eps * d,
                                           params, dvec), True))
    fd = (lp - lm) / (2 * eps)
    ad = dot(g_exact, dvec)
    np.testing.assert_allclose(ad, fd, rtol=2e-2, atol=1e-7)

    # the dropped ∂L/∂pj path is real: the two modes' gradients differ
    diff = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(g_exact),
        jax.tree_util.tree_leaves(g_stop)))
    assert diff > 1e-7, diff


@pytest.fixture
def toy_pad_batch():
    from epnn_tpu.data.dataset import pad_molecules
    from epnn_tpu.data.xyz import Molecule
    from epnn_tpu.elements import table_for_n_elems

    g = np.random.default_rng(5)
    mols = []
    for i in range(4):
        n = int(g.integers(8, 14))
        symbols = list(g.choice(["H", "C", "N", "O"], size=n))
        xyz = g.uniform(-4, 4, size=(n, 3)).astype(np.float32)
        labels = g.normal(0, 0.2, size=n).astype(np.float32)
        labels -= labels.sum() / n
        mols.append(Molecule(name=f"c{i}", symbols=symbols, xyz=xyz,
                             total_charge=0.0, labels=labels))
    batch = pad_molecules(mols, table_for_n_elems(SMALL.n_elems), pad_to=16)
    w = np.ones((4,), np.float32)
    return batch.x, batch.q0, batch.xyz, batch.node_mask, batch.y, w
