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

CRITICAL precision note: every function here runs under
``jax.default_matmul_precision('highest')``.  XLA's blocked Cholesky /
triangular-solve lower to dot_generals that inherit the *default* MXU
precision — bf16 on TPU — and a bf16 factorization of an ill-conditioned
Gram matrix produces garbage inverses (observed: the particle filter's
whole posterior exploded to inf on TPU while being exact on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


#: Relative diagonal floor per dtype: reduced-precision factorizations of
#: ill-conditioned Grams need jitter PROPORTIONAL to the diagonal scale
#: (the dynamics kernel's linear term makes diagonals O(10-100), so an
#: absolute 1e-6 is nothing).  float64 gets none — bit-for-bit reference
#: parity for the oracle tests.
_REL_JITTER = {
    jnp.dtype(jnp.float32): 1e-5,
    jnp.dtype(jnp.bfloat16): 1e-2,
}


def chol_lower(K: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky factor of K (+ jitter * I + dtype-relative floor).

    The relative floor (f32: 1e-5 x mean diagonal) is what keeps TPU f32
    factorizations of near-singular trained dynamics Grams finite — without
    it the whole per-class posterior went NaN on TPU while the same f32
    matrix squeaked through LAPACK on CPU.
    """
    eps_rel = _REL_JITTER.get(jnp.dtype(K.dtype), 0.0)
    total = jitter
    if eps_rel:
        total = total + eps_rel * jnp.mean(jnp.diagonal(K))
    if jitter or eps_rel:
        K = K + total * jnp.eye(K.shape[0], dtype=K.dtype)
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.cholesky(K)


def chol_logdet(L: jax.Array) -> jax.Array:
    """log|K| from the lower Cholesky factor L of K."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def chol_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve K x = B given lower Cholesky factor L of K."""
    with jax.default_matmul_precision("highest"):
        return jsl.cho_solve((L, True), B)


def chol_inverse(L: jax.Array) -> jax.Array:
    """Explicit K^-1 from lower Cholesky factor L (prediction precompute only)."""
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    with jax.default_matmul_precision("highest"):
        return jsl.cho_solve((L, True), eye)


def tri_solve(L: jax.Array, B: jax.Array, lower: bool = True) -> jax.Array:
    """Triangular solve L x = B at full precision."""
    with jax.default_matmul_precision("highest"):
        return jsl.solve_triangular(L, B, lower=lower)


def quad_trace(L: jax.Array, Y: jax.Array, col_weights: jax.Array) -> jax.Array:
    """``trace(K^-1 Y diag(col_weights) Y^T)`` via triangular solve.

    Equals ``sum_j col_weights[j] * y_j^T K^-1 y_j`` where ``y_j`` is column j
    of Y.  This is the trace term of both reference NLLs (gpmdm.py:587-589,
    626-628) without materializing K^-1.
    """
    A = tri_solve(L, Y)  # L A = Y
    return jnp.sum(jnp.sum(A * A, axis=0) * col_weights)
