"""Cholesky-based linear algebra helpers.

The reference factors Gram matrices with ``torch.linalg.cholesky_ex`` and
explicitly forms ``K^-1`` via triangular inverses (gpmdm.py:575-579, 616-620,
1284-1305).  On TPU we keep the same math but:

- use ``jax.scipy.linalg`` Cholesky (XLA-native, differentiable),
- avoid forming explicit inverses inside the loss — ``trace(K^-1 S)`` terms
  are evaluated with triangular solves instead (O(N^2 D) rather than O(N^3)
  extra work, and far better conditioned),
- form explicit inverses only once, at prediction-precompute time, where the
  reference also does (gpmdm.py:1284).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def chol_lower(K: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky factor of K (+ jitter * I)."""
    if jitter:
        K = K + jitter * jnp.eye(K.shape[0], dtype=K.dtype)
    return jnp.linalg.cholesky(K)


def chol_logdet(L: jax.Array) -> jax.Array:
    """log|K| from the lower Cholesky factor L of K."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def chol_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve K x = B given lower Cholesky factor L of K."""
    return jsl.cho_solve((L, True), B)


def chol_inverse(L: jax.Array) -> jax.Array:
    """Explicit K^-1 from lower Cholesky factor L (prediction precompute only)."""
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return jsl.cho_solve((L, True), eye)


def quad_trace(L: jax.Array, Y: jax.Array, col_weights: jax.Array) -> jax.Array:
    """``trace(K^-1 Y diag(col_weights) Y^T)`` via triangular solve.

    Equals ``sum_j col_weights[j] * y_j^T K^-1 y_j`` where ``y_j`` is column j
    of Y.  This is the trace term of both reference NLLs (gpmdm.py:587-589,
    626-628) without materializing K^-1.
    """
    A = jsl.solve_triangular(L, Y, lower=True)  # L A = Y
    return jnp.sum(jnp.sum(A * A, axis=0) * col_weights)
