"""GP kernel primitives for GPMDM, as pure JAX functions.

TPU-native counterpart of the reference kernel methods
(`/root/reference/gpmdm/gpmdm.py:381-548`):

- RBF kernel with unit signal variance:  ``exp(-(x1-x2)^T L^-2 (x1-x2))``
  with L = diag(exp(log_lengthscales))  (reference ``get_rbf_kernel`` /
  ``get_weighted_distances``, gpmdm.py:436-517).
- Linear kernel in homogeneous coordinates:
  ``[X1,1] diag(exp(log_coeff)^2) [X2,1]^T``  (reference ``get_lin_kernel``,
  gpmdm.py:520-548).
- Observation kernel K_y = RBF + (sigma_n^2 + sigma_num^2) I.
- Dynamics kernel K_x = RBF + linear (+ noise on the diagonal).

All matmuls use ``precision='highest'`` so Gram matrices feeding Cholesky
factorizations are computed in full f32 on the MXU (TPU default would
truncate inputs to bf16, which is fatal for ill-conditioned Gram matrices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Gram matrices feed Cholesky; never let the MXU truncate them to bf16.
_PREC = jax.lax.Precision.HIGHEST


def weighted_sqdist(
    X1: jax.Array,
    X2: jax.Array,
    log_lengthscales: jax.Array,
    precision=_PREC,
) -> jax.Array:
    """Pairwise squared distance with per-dimension inverse lengthscale weights.

    ``dist[i,j] = sum_k ((X1[i,k]-X2[j,k]) / exp(log_lengthscales[k]))^2``

    Computed via the expansion |a|^2 + |b|^2 - 2 a.b (one MXU matmul),
    matching the reference ``get_weighted_distances`` (gpmdm.py:483-517).
    """
    inv_ls = jnp.exp(-log_lengthscales)
    A = X1 * inv_ls
    B = X2 * inv_ls
    a2 = jnp.sum(A * A, axis=1, keepdims=True)
    b2 = jnp.sum(B * B, axis=1, keepdims=True)
    return a2 + b2.T - 2.0 * jnp.matmul(A, B.T, precision=precision)


def rbf_kernel(
    X1: jax.Array,
    X2: jax.Array,
    log_lengthscales: jax.Array,
    log_sigma_n: jax.Array | None = None,
    sigma_n_num: float = 0.0,
    with_noise: bool = False,
    precision=_PREC,
) -> jax.Array:
    """Unit-signal-variance RBF kernel; optional diagonal noise.

    Reference ``get_rbf_kernel`` (gpmdm.py:436-481).  Noise is only valid for
    square symmetric use (X1 is X2) — callers must pass ``with_noise=False``
    for cross/star kernels, as the reference does.
    """
    K = jnp.exp(-weighted_sqdist(X1, X2, log_lengthscales, precision))
    if with_noise:
        noise = jnp.exp(log_sigma_n) ** 2 + sigma_n_num**2
        K = K + noise * jnp.eye(X1.shape[0], dtype=K.dtype)
    return K


def linear_kernel(
    X1: jax.Array, X2: jax.Array, log_lin_coeff: jax.Array, precision=_PREC
) -> jax.Array:
    """Homogeneous linear kernel ``[X1,1] diag(exp(c)^2) [X2,1]^T``.

    Reference ``get_lin_kernel`` (gpmdm.py:520-548).  The last coefficient
    weighs the constant (bias) feature.
    """
    w = jnp.exp(log_lin_coeff) ** 2  # (dim+1,)
    A = X1 * w[:-1]
    K = jnp.matmul(A, X2.T, precision=precision)
    return K + w[-1]


def y_kernel(
    X1: jax.Array,
    X2: jax.Array,
    log_lengthscales: jax.Array,
    log_sigma_n: jax.Array,
    sigma_n_num: float = 0.0,
    with_noise: bool = True,
    precision=_PREC,
) -> jax.Array:
    """Observation (latent->observation map) kernel K_y. Reference gpmdm.py:381-406."""
    return rbf_kernel(
        X1, X2, log_lengthscales, log_sigma_n, sigma_n_num, with_noise, precision
    )


def x_kernel(
    X1: jax.Array,
    X2: jax.Array,
    log_lengthscales: jax.Array,
    log_sigma_n: jax.Array,
    log_lin_coeff: jax.Array,
    sigma_n_num: float = 0.0,
    with_noise: bool = True,
    precision=_PREC,
) -> jax.Array:
    """Dynamics kernel K_x = RBF + linear. Reference gpmdm.py:408-434."""
    K = rbf_kernel(
        X1, X2, log_lengthscales, log_sigma_n, sigma_n_num, with_noise, precision
    )
    return K + linear_kernel(X1, X2, log_lin_coeff, precision)


def y_diag_kernel(
    X: jax.Array,
    log_sigma_n: jax.Array,
    sigma_n_num: float = 0.0,
    with_noise: bool = False,
) -> jax.Array:
    """Diagonal of K_y(X, X): RBF diag is exactly 1. Reference gpmdm.py:965-991."""
    n = X.shape[0]
    diag = jnp.ones((n,), dtype=X.dtype)
    if with_noise:
        diag = diag + jnp.exp(log_sigma_n) ** 2 + sigma_n_num**2
    return diag


def x_diag_kernel(
    X: jax.Array,
    log_lin_coeff: jax.Array,
    log_sigma_n: jax.Array,
    sigma_n_num: float = 0.0,
    with_noise: bool = False,
) -> jax.Array:
    """Diagonal of K_x(X, X): 1 + [x,1] diag(exp(c)^2) [x,1]^T (+ noise).

    Reference ``get_x_diag_kernel`` (gpmdm.py:1070-1101).
    """
    w = jnp.exp(log_lin_coeff) ** 2
    lin_diag = jnp.sum(X * X * w[:-1], axis=1) + w[-1]
    diag = 1.0 + lin_diag
    if with_noise:
        diag = diag + jnp.exp(log_sigma_n) ** 2 + sigma_n_num**2
    return diag
