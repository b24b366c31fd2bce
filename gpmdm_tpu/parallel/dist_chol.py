"""Distributed blocked Cholesky + triangular solves over a device mesh.

The reference factorizes the full observation Gram on one device
(gpmdm.py:575-579); `nll_sharded` (parallel/sharded.py) replicates that
factorization on every device, so the O(Ny^3) Cholesky — the dominant cost
at Ny >~ 2k — gains nothing from more chips (measured: docs/BENCHMARKS.md).
This module shards it for real: the Gram is row-panel sharded over an
``sp`` axis and factorized with a right-looking blocked algorithm whose
trailing-update GEMMs (the O(N^3) term) run data-parallel on the MXU,
with one panel all-gather per block step (O(N^2) total communication over
ICI).

SPMD style: no per-device branching — every device redundantly computes
the O(nb^3)/O(N nb^2) panel work from the gathered column (cheap), and
applies the trailing update only to its own still-active rows via masks.

``y_nll_dist`` wraps the whole observation NLL in a ``jax.custom_vjp``
with the closed-form adjoint

    d/dK [ c1 * logdet K + 1/2 tr(K^-1 Y W Y^T) ]
        = c1 * K^-1 - 1/2 K^-1 Y W Y^T K^-1,

evaluated with the same distributed kernels (one distributed triangular
solve against I + local GEMMs), instead of differentiating through the
factorization loop — the standard production pattern for sharded dense
linear algebra.

All functions run inside an existing ``shard_map`` body over ``axis_name``
and take/return the local row panel (nb, N) of the logically (N, N)
operand, nb = N / axis_size.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg as LA


def _nblocks(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def chol_rowblock(A_i: jax.Array, axis_name: str) -> jax.Array:
    """Distributed lower Cholesky of a row-panel-sharded SPD matrix.

    A_i: this device's (nb, N) row panel of A (N = nb * n_devices).
    Returns this device's (nb, N) row panel of L (lower triangular).

    Right-looking: at step k the current column block (all rows, updated)
    is all-gathered; every device redundantly factorizes the (nb, nb)
    diagonal block and forms the full panel P[:, k] = A[:, k] L_kk^-T; each
    device then rank-nb-downdates only its own trailing rows.
    """
    B = _nblocks(axis_name)
    idx = jax.lax.axis_index(axis_name)
    nb = A_i.shape[0]
    N = A_i.shape[1]
    assert N == nb * B, (A_i.shape, B)

    L_i = jnp.zeros_like(A_i)
    for k in range(B):  # static unroll; B is the mesh size (small)
        colk_local = jax.lax.dynamic_slice_in_dim(A_i, k * nb, nb, axis=1)
        col = jax.lax.all_gather(colk_local, axis_name, tiled=True)  # (N, nb)
        A_kk = jax.lax.dynamic_slice_in_dim(col, k * nb, nb, axis=0)
        # Pin the factorization's internal dots to full precision rather
        # than relying on the lowering default (on the current jax the
        # TPU expansion already emits highest-precision dots — verified
        # via compiled-HLO inspection — but a default-precision dot in a
        # factorization of a trained ill-conditioned Gram is the exact
        # failure mode ops/linalg.py documents, so pin it explicitly).
        with jax.default_matmul_precision("highest"):
            L_kk = jnp.linalg.cholesky(A_kk)  # redundant, (nb, nb)
            # full panel P = col @ L_kk^-T  (rows < k*nb are finalized
            # garbage, masked out below)
            P = jax.lax.linalg.triangular_solve(
                L_kk, col, left_side=False, lower=True, transpose_a=True
            )  # (N, nb)
        P_own = jax.lax.dynamic_slice_in_dim(P, idx * nb, nb, axis=0)

        # write this device's column-k block of L:
        #   idx == k -> L_kk,  idx > k -> P_own,  idx < k -> 0
        blk = jnp.where(
            idx == k, L_kk, jnp.where(idx > k, P_own, jnp.zeros_like(P_own))
        )
        L_i = jax.lax.dynamic_update_slice_in_dim(L_i, blk, k * nb, axis=1)

        # trailing update of this device's own rows (only active when
        # idx > k): A_i[:, (k+1)nb:] -= P_own @ P[(k+1)nb:, :]^T.  Computed
        # over the full width with a column mask (static shapes).
        upd = jnp.matmul(
            P_own, P.T, precision=jax.lax.Precision.HIGHEST
        )  # (nb, N)
        col_ids = jnp.arange(N) // nb  # block id of each column
        active_cols = (col_ids > k)[None, :]
        A_i = jnp.where((idx > k) & active_cols, A_i - upd, A_i)
    return L_i


def tri_solve_lower_rowblock(
    L_i: jax.Array, B_i: jax.Array, axis_name: str
) -> jax.Array:
    """Distributed forward substitution: solve L X = B.

    L_i: (nb, N) local row panel of lower-triangular L;
    B_i: (nb, D) local row block of the right-hand side.
    Returns X_i (nb, D).  One (nb, D) broadcast per block step.
    """
    B = _nblocks(axis_name)
    idx = jax.lax.axis_index(axis_name)
    nb = L_i.shape[0]

    acc = B_i
    X_i = jnp.zeros_like(B_i)
    for k in range(B):
        L_kk = jax.lax.dynamic_slice_in_dim(L_i, k * nb, nb, axis=1)
        with jax.default_matmul_precision("highest"):  # see chol_rowblock
            cand = jax.lax.linalg.triangular_solve(
                L_kk, acc, left_side=True, lower=True
            )  # valid only on device k (elsewhere L_kk is an off-diag block)
        Xk = jax.lax.psum(
            jnp.where(idx == k, cand, jnp.zeros_like(cand)), axis_name
        )
        X_i = jnp.where(idx == k, cand, X_i)
        # downdate remaining rows: acc_i -= L_ik @ Xk for i > k
        acc = jnp.where(idx > k, acc - jnp.matmul(
            L_kk, Xk, precision=jax.lax.Precision.HIGHEST
        ), acc)
        # NOTE: for i > k the slice L_i[:, k nb:(k+1) nb] IS block L_ik.
    return X_i


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def y_nll_dist(K_i, Y_i, w2, axis_name: str):
    """Distributed observation NLL core, returned as this device's LOCAL
    SHARE — the caller sums the per-device shares OUTSIDE the shard_map:

        sum_over_devices(value_local)
            = D/2 * logdet(K) + 1/2 * sum_j w2_j * y_j^T K^-1 y_j

    with K row-panel sharded ((nb, N) per device) and Y row-sharded
    ((nb, D) per device); w2 = exp(y_log_lambdas)^2 replicated.  The -N
    log|W| term stays with the caller.

    Local-share design: returning per-device partials and summing outside
    keeps shard_map's transpose semantics unambiguous — each device's
    cotangent is exactly the outer sum's (replicated) cotangent, with no
    reliance on how replicated outputs split their cotangent across
    devices.  The backward pass therefore REQUIRES the incoming cotangent
    to be identical on every device (true for any psum/sum-of-shares
    consumer).  Differentiable in K_i, Y_i, w2 via the closed-form adjoint.
    """
    value_local, _, _ = _y_nll_dist_fwd_impl(K_i, Y_i, w2, axis_name)
    return value_local


def _y_nll_dist_fwd_impl(K_i, Y_i, w2, axis_name):
    D = Y_i.shape[1]
    L_i = chol_rowblock(K_i, axis_name)
    nb = L_i.shape[0]
    idx = jax.lax.axis_index(axis_name)
    diag_own = jnp.diagonal(
        jax.lax.dynamic_slice_in_dim(L_i, idx * nb, nb, axis=1)
    )
    logdet_local = 2.0 * jnp.sum(jnp.log(diag_own))
    V_i = tri_solve_lower_rowblock(L_i, Y_i, axis_name)  # L^-1 Y, row block
    quad_local = jnp.sum(V_i * V_i, axis=0)  # (D,) this device's share
    value_local = 0.5 * D * logdet_local + 0.5 * jnp.sum(w2 * quad_local)
    return value_local, (L_i, quad_local), V_i


def _y_nll_dist_fwd(K_i, Y_i, w2, axis_name):
    value_local, (L_i, quad_local), _ = _y_nll_dist_fwd_impl(
        K_i, Y_i, w2, axis_name
    )
    return value_local, (L_i, Y_i, w2, quad_local)


def _y_nll_dist_bwd(axis_name, res, g):
    # g is the cotangent of this device's local share; the local-share
    # contract (docstring) requires it to be replicated across the axis.
    # The closed-form adjoint below is the gradient of the SUMMED value, so
    # per-device outputs are exactly the per-device cotangent shares:
    # sharded inputs (K_i, Y_i) get their own row panels; the replicated
    # input (w2) gets this device's share, psum'd by shard_map's transpose.
    L_i, Y_i, w2, quad_local = res
    D = Y_i.shape[1]
    nb, N = L_i.shape
    idx = jax.lax.axis_index(axis_name)

    # Z = L^-1 (distributed solve against this device's slice of I)
    eye_cols = (
        jnp.arange(N)[None, :] == (idx * nb + jnp.arange(nb))[:, None]
    ).astype(L_i.dtype)  # (nb, N): rows of I owned by this device
    Z_i = tri_solve_lower_rowblock(L_i, eye_cols, axis_name)  # (nb, N)
    Z = jax.lax.all_gather(Z_i, axis_name, tiled=True)  # (N, N) replicated
    # own row panel of K^-1 = Z^T Z
    Z_cols_own = jax.lax.dynamic_slice_in_dim(Z, idx * nb, nb, axis=1)
    Kinv_i = jnp.matmul(
        Z_cols_own.T, Z, precision=jax.lax.Precision.HIGHEST
    )  # (nb, N)
    # alpha = K^-1 Y:  alpha_i = Kinv_i @ Y_full
    Y = jax.lax.all_gather(Y_i, axis_name, tiled=True)  # (N, D)
    alpha_i = jnp.matmul(Kinv_i, Y, precision=jax.lax.Precision.HIGHEST)
    alpha = jax.lax.all_gather(alpha_i, axis_name, tiled=True)  # (N, D)

    # dK (row panel) = g * (D/2 K^-1 - 1/2 alpha W2 alpha^T)
    dK_i = g * (
        0.5 * D * Kinv_i
        - 0.5 * jnp.matmul(
            alpha_i * w2[None, :], alpha.T,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    # dY (row block) = g * K^-1 Y W2  (d/dY of 1/2 tr(K^-1 Y W2 Y^T))
    dY_i = g * alpha_i * w2[None, :]
    # dw2_j = g * 1/2 * (this device's share of y_j^T K^-1 y_j)
    dw2 = g * 0.5 * quad_local
    return dK_i, dY_i, dw2


y_nll_dist.defvjp(_y_nll_dist_fwd, _y_nll_dist_bwd)
