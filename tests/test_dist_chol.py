"""Distributed blocked Cholesky / triangular solve / observation-NLL core
(parallel/dist_chol.py) vs single-device linear algebra, on the 8-virtual-
device mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gpmdm_tpu.parallel import make_mesh
from gpmdm_tpu.parallel.dist_chol import (
    chol_rowblock,
    tri_solve_lower_rowblock,
    y_nll_dist,
)

N, D, NDEV = 64, 5, 8


@pytest.fixture(scope="module")
def spd():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(N, N))
    K = M @ M.T / N + np.eye(N) * 2.0
    Y = rng.normal(size=(N, D))
    w2 = np.exp(rng.normal(size=(D,)))
    return (jnp.asarray(K), jnp.asarray(Y), jnp.asarray(w2))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"sp": NDEV})


def test_chol_rowblock_matches_numpy(spd, mesh):
    K, _, _ = spd
    f = shard_map(
        lambda Ki: chol_rowblock(Ki, "sp"),
        mesh=mesh, in_specs=P("sp", None), out_specs=P("sp", None),
    )
    L = np.asarray(f(K))
    np.testing.assert_allclose(L, np.linalg.cholesky(np.asarray(K)),
                               rtol=1e-10, atol=1e-12)


def test_tri_solve_lower_matches_scipy(spd, mesh):
    import scipy.linalg as sl

    K, Y, _ = spd
    L = np.linalg.cholesky(np.asarray(K))
    f = shard_map(
        lambda Li, Bi: tri_solve_lower_rowblock(Li, Bi, "sp"),
        mesh=mesh, in_specs=(P("sp", None), P("sp", None)),
        out_specs=P("sp", None),
    )
    X = np.asarray(f(jnp.asarray(L), Y))
    np.testing.assert_allclose(
        X, sl.solve_triangular(L, np.asarray(Y), lower=True),
        rtol=1e-10, atol=1e-12,
    )


def _ref_value(K, Y, w2):
    L = jnp.linalg.cholesky(K)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    V = jax.scipy.linalg.solve_triangular(L, Y, lower=True)
    return 0.5 * D * logdet + 0.5 * jnp.sum(w2 * jnp.sum(V * V, axis=0))


def test_y_nll_dist_value_and_grads(spd, mesh):
    """Value AND gradients (wrt K, Y, w2) of the distributed custom-vjp NLL
    core equal the single-device formula's autodiff."""
    K, Y, w2 = spd
    # local-share contract: the shard_map returns one partial per device
    # (out spec sharded over sp) and the caller sums them — unambiguous
    # transpose semantics (see y_nll_dist docstring).  check_vma=False
    # because the replication checker cannot see through the custom_vjp.
    f_shares = shard_map(
        lambda Ki, Yi, w2_: y_nll_dist(Ki, Yi, w2_, "sp").reshape(1),
        mesh=mesh, in_specs=(P("sp", None), P("sp", None), P()),
        out_specs=P("sp"), check_vma=False,
    )
    f_dist = lambda K, Y, w2: jnp.sum(f_shares(K, Y, w2))
    np.testing.assert_allclose(
        float(f_dist(K, Y, w2)), float(_ref_value(K, Y, w2)), rtol=1e-12
    )

    g_dist = jax.grad(lambda K, Y, w2: f_dist(K, Y, w2), argnums=(0, 1, 2))(
        K, Y, w2
    )
    g_ref = jax.grad(_ref_value, argnums=(0, 1, 2))(K, Y, w2)
    # dK: the closed-form adjoint is the symmetrized dense gradient, while
    # autodiff through cholesky+solve returns an equivalent (possibly
    # asymmetric) representative — compare their symmetrizations, which is
    # what any symmetric K(X) construction contracts against.
    sym = lambda A: 0.5 * (A + A.T)
    np.testing.assert_allclose(
        sym(np.asarray(g_dist[0])), sym(np.asarray(g_ref[0])),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(np.asarray(g_dist[1]), np.asarray(g_ref[1]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(g_dist[2]), np.asarray(g_ref[2]),
                               rtol=1e-9, atol=1e-11)


def test_nll_shard_chol_matches_single_device():
    """The distributed-Cholesky MAP loss (and its gradients) equal the
    single-device core.nll on an ep x tp mesh with a real model."""
    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.models import core
    from gpmdm_tpu.parallel import make_context, make_mesh, nll_sharded

    # Ny = 2 classes x 2 seqs x 16 frames = 64, divisible by tp=4
    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=16, D=7, seed=13
    )
    m = GPMDM(D=7, d=2, n_classes=2, dtype="float64")
    for Yc, c in zip(tr, tl):
        m.add_data(Yc, c)
    m.init_X()
    mesh2 = make_mesh({"ep": 2, "tp": 4})
    ctx = make_context(m.config, m.layout, mesh2, shard_chol=True)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)

    got = nll_sharded(m.params, Y, ctx)
    want = core.nll(m.params, Y, m.config, m.layout)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)

    g_sh = jax.grad(lambda p: nll_sharded(p, Y, ctx))(m.params)
    g_ref = jax.grad(lambda p: core.nll(p, Y, m.config, m.layout))(m.params)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


def test_train_adam_shard_chol_matches_single_device():
    """10 Adam steps through the distributed-Cholesky loss == 10
    single-device steps."""
    from gpmdm_tpu import GPMDM, TrainConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.parallel import make_mesh, train_adam_sharded
    from gpmdm_tpu.train.trainer import train_adam

    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=16, D=7, seed=13
    )
    m = GPMDM(D=7, d=2, n_classes=2, dtype="float64")
    for Yc, c in zip(tr, tl):
        m.add_data(Yc, c)
    m.init_X()
    mesh2 = make_mesh({"ep": 2, "tp": 4})
    Y = m.get_Y()
    tc = TrainConfig(num_steps=10, lr=0.01)
    p_sh, _, losses_sh = train_adam_sharded(
        m.params, Y, m.config, m.layout, mesh2, tc, shard_chol=True
    )
    res = train_adam(m.params, Y, m.config, m.layout, tc)
    np.testing.assert_allclose(
        np.asarray(losses_sh), np.asarray(res.losses), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(p_sh.X), np.asarray(res.params.X), rtol=1e-7, atol=1e-9
    )
