"""Kernel primitives vs dense numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu.ops import kernels as K

import oracle


@pytest.fixture
def data(rng):
    X1 = rng.normal(size=(7, 3))
    X2 = rng.normal(size=(5, 3))
    log_ls = rng.normal(size=(3,)) * 0.3
    log_coeff = rng.normal(size=(4,)) * 0.3
    log_sn = np.float64(-1.2)
    return X1, X2, log_ls, log_coeff, log_sn


def test_weighted_sqdist(data, rng):
    X1, X2, log_ls, _, _ = data
    got = np.asarray(K.weighted_sqdist(jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(log_ls)))
    ls = np.exp(log_ls)
    want = (((X1[:, None, :] - X2[None, :, :]) / ls) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_rbf_kernel_matches_oracle(data):
    X1, X2, log_ls, _, _ = data
    got = np.asarray(K.rbf_kernel(jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(log_ls)))
    np.testing.assert_allclose(got, oracle.rbf(X1, X2, log_ls), atol=1e-12)


def test_rbf_kernel_noise_on_diagonal(data):
    X1, _, log_ls, _, log_sn = data
    got = np.asarray(
        K.rbf_kernel(
            jnp.asarray(X1), jnp.asarray(X1), jnp.asarray(log_ls),
            jnp.asarray(log_sn), sigma_n_num=0.05, with_noise=True,
        )
    )
    want = oracle.rbf(X1, X1, log_ls) + (np.exp(log_sn) ** 2 + 0.05**2) * np.eye(7)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_linear_kernel_matches_oracle(data):
    X1, X2, _, log_coeff, _ = data
    got = np.asarray(K.linear_kernel(jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(log_coeff)))
    np.testing.assert_allclose(got, oracle.lin(X1, X2, log_coeff), atol=1e-10)


def test_x_kernel_is_rbf_plus_linear(data):
    X1, X2, log_ls, log_coeff, log_sn = data
    got = np.asarray(
        K.x_kernel(
            jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(log_ls),
            jnp.asarray(log_sn), jnp.asarray(log_coeff), with_noise=False,
        )
    )
    np.testing.assert_allclose(
        got, oracle.x_kernel(X1, X2, log_ls, log_sn, log_coeff, noise=False), atol=1e-10
    )


def test_diag_kernels_match_dense_diagonal(data):
    X1, _, log_ls, log_coeff, log_sn = data
    # y diag: RBF(x,x) = 1
    got = np.asarray(K.y_diag_kernel(jnp.asarray(X1), jnp.asarray(log_sn), with_noise=True))
    want = np.diag(oracle.y_kernel(X1, X1, log_ls, log_sn, noise=True))
    np.testing.assert_allclose(got, want, atol=1e-12)
    # x diag: 1 + linear diag (+ noise)
    got = np.asarray(
        K.x_diag_kernel(
            jnp.asarray(X1), jnp.asarray(log_coeff), jnp.asarray(log_sn), with_noise=True
        )
    )
    want = np.diag(oracle.x_kernel(X1, X1, log_ls, log_sn, log_coeff, noise=True))
    np.testing.assert_allclose(got, want, atol=1e-10)
