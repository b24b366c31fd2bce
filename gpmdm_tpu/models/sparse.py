"""Sparse (inducing-point) GPMDM: variational free-energy training and
SGPR posteriors.

The reference's exact-GP formulation is O(N^3) in total training frames and
its own discussion names inducing-point approximations as the path to longer
sequences (reference paper §5; SURVEY.md §5 "long-context").  There is no
reference implementation — this module is designed from the standard sparse
variational GP regression equations (Titsias 2009 VFE / SGPR), applied to
both GPMDM maps:

- observation map: one sparse GP, M_y inducing inputs in latent space,
- dynamics map: one sparse GP *per class*, M_x inducing inputs each
  (batched over the class axis; the expert-parallel layout).

Objective per GP (multi-output, with the reference's per-dimension output
scales W = diag(exp(log_lambdas)) and noise sigma^2):

    L = Dout/2 * (log|B| + N log sigma^2)
        + 1/(2 sigma^2) * sum_j w_j^2 (|y_j|^2 - |c_j|^2)
        - N log|W|
        + Dout/(2 sigma^2) * tr(Knn - Qnn)

with  Kmm = k(Z,Z) + jitter,  Lm = chol(Kmm),  A = Lm^-1 k(Z,X) / sigma,
      B = I + A A^T,  LB = chol(B),  c_j = LB^-1 A y_j,
      Qnn = k(X,Z) Kmm^-1 k(Z,X).

This reduces to the reference's exact NLL (up to the VFE trace regularizer,
which -> 0) when Z = X.  Cost: O(N M^2) per step instead of O(N^3).

Posterior (SGPR):  mean(x*) = k*m beta,
    var(x*) = k** - |Lm^-1 km*|^2 + |LB^-1 Lm^-1 km*|^2,
with beta = sigma^-2 Lm^-T LB^-T c.  Exposed with the same
(mean, per-dim var) contract as the exact posteriors in
:mod:`gpmdm_tpu.models.core`, so the particle filter runs unchanged on
either backend.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..ops import linalg as LA

from ..config import GPMDMConfig
from ..ops import kernels as K
from . import core
from ..ops.layout import DataLayout, padded_class_indices

_PREC = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseParams:
    """Trainable state of the sparse model: the exact model's parameters
    (log-space hyperparameters + latent X, see core.GPMDMParams) plus free
    inducing inputs."""

    y_log_lengthscales: jax.Array  # (d,)
    y_log_lambdas: jax.Array  # (D,)
    y_log_sigma_n: jax.Array  # ()
    x_log_lengthscales: jax.Array  # (d * back_step,)
    x_log_lambdas: jax.Array  # (d,)
    x_log_sigma_n: jax.Array  # ()
    x_log_lin_coeff: jax.Array  # (d * back_step + 1,)
    X: jax.Array  # (Ny, d)
    Zy: jax.Array  # (My, d) observation-GP inducing inputs
    Zx: jax.Array  # (C, Mx, d * back_step) per-class dynamics inducing inputs


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparsePosterior:
    """Precomputed SGPR posterior state for both maps.

    ``distilled`` (static, not a leaf): True iff this posterior is a
    POST-HOC distillation of an exact-trained model (``distill_host`` /
    ``GPMDM.sparsified_posterior``) rather than a natively-trained sparse
    family's posterior.  The particle filter keys its variance-path
    default on it: distilled posteriors run the hoisted-inverse 'high'
    quad (measured strictly better — speed AND guard accuracy — at every
    P, round 5), while native sparse-family posteriors keep the
    per-frame tri-solve default (the hourlong asset regresses under
    'high', round 4).  See particle_filter._effective_quad_precision."""

    X: jax.Array  # latent snapshot (for PF init sampling)
    Zy: jax.Array  # (My, d)
    Ly: jax.Array  # (My, My) chol(Kmm_y)
    LBy: jax.Array  # (My, My) chol(B_y)
    beta_y: jax.Array  # (My, D)
    Zx: jax.Array  # (C, Mx, din)
    Lx: jax.Array  # (C, Mx, Mx)
    LBx: jax.Array  # (C, Mx, Mx)
    beta_x: jax.Array  # (C, Mx, d)
    distilled: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )


_JITTER = 1e-6

# Kuu jitter is dtype-aware: inducing points subsampled from consecutive
# motion frames are near-duplicates, so Kuu's smallest eigenvalues sit at
# the f32 kernel-evaluation noise floor (measured: min eig -8.5e-6 at
# M=256 on TPU, condition ~1e7 — exactly where TPU f32 Cholesky silently
# NaNs while CPU LAPACK squeaks through).  1e-4 keeps the condition ~2e5;
# the VFE with a jittered Kuu is still a valid bound (it only perturbs the
# approximating family).
_KUU_JITTER = {jnp.dtype("float32"): 1e-4, jnp.dtype("float64"): 1e-6}


def _kuu_jitter(dtype) -> float:
    return _KUU_JITTER.get(jnp.dtype(dtype), 1e-4)


def _lb_via_qr(A: jax.Array) -> jax.Array:
    """``chol(I + A A^T)`` computed WITHOUT ever forming ``I + A A^T``:
    the R factor of the tall QR of ``[A^T; I]`` satisfies
    ``R^T R = A A^T + I``, so ``LB = R^T`` (diagonal sign-fixed positive).

    Why (round-4 hourlong diagnosis, docs/BENCHMARKS.md "sparse-family
    f32 cliff"): at Ny ~ 54k rows/class and trained sigma_n ~ 0.04, the
    capacitance ``B = I + A A^T`` reaches condition ~3.4e7.  B >= I means
    every exact Cholesky pivot is >= 1, but f32 pivots carry absolute
    error ~ eps * ||B|| ~ 2 — the factorization is a coin flip that came
    up NaN inside the compiled train step (the plain forward of the same
    math at the same params stayed finite: fusion context decides).
    The stacked QR's error scales with ||[A^T; I]|| = sqrt(||B||):
    ~7e-4 against pivots of 1, safe at ANY training drift.  Same
    O(N M^2) asymptotic cost as forming A A^T."""
    M = A.shape[0]
    stack = jnp.concatenate([A.T, jnp.eye(M, dtype=A.dtype)], axis=0)
    _, R = jnp.linalg.qr(stack, mode="reduced")  # R: (M, M) upper
    s = jnp.sign(jnp.diagonal(R))
    s = jnp.where(s == 0, jnp.ones_like(s), s)
    return (R * s[:, None]).T  # lower, positive diagonal


def _sgpr_terms(Kmm, Kmn, knn_diag, Y, log_sigma, w2, n_valid, col_mask=None,
                sigma_n_num: float = 0.0, qr_b: bool | None = None):
    """Shared VFE pieces for one GP.

    Kmm (M, M), Kmn (M, N), knn_diag (N,), Y (N, Dout), w2 (Dout,).
    ``col_mask`` (N,) zeroes padded data columns (class-padding support);
    ``n_valid`` is the true data count N (scalar, may be traced).
    ``qr_b`` selects the capacitance factorization: the f32-safe stacked
    QR (:func:`_lb_via_qr`) or the direct ``chol(I + A A^T)``; None
    (default) = QR for f32 inputs, chol for f64 (where the direct form
    is exact enough and cheaper).
    Returns (nll, Lm, LB, c) where c = LB^-1 A Y.
    """
    M = Kmm.shape[0]
    sigma2 = jnp.exp(log_sigma) ** 2 + sigma_n_num**2 + _JITTER
    if col_mask is not None:
        Kmn = Kmn * col_mask[None, :]
        knn_diag = knn_diag * col_mask
        Y = Y * col_mask[:, None]
    Lm = LA.chol_lower(Kmm, jitter=_kuu_jitter(Kmm.dtype))
    A = LA.tri_solve(Lm, Kmn) / jnp.sqrt(sigma2)  # (M, N)
    if qr_b is None:
        qr_b = jnp.dtype(Kmm.dtype) == jnp.dtype("float32")
    if qr_b:
        LB = _lb_via_qr(A)
    else:
        B = jnp.eye(M, dtype=Kmm.dtype) + jnp.matmul(A, A.T, precision=_PREC)
        LB = LA.chol_lower(B)
    logdet_B = 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB)))
    AY = jnp.matmul(A, Y, precision=_PREC)  # (M, Dout)
    c = LA.tri_solve(LB, AY)  # (M, Dout)
    quad = (jnp.sum(Y * Y, axis=0) - jnp.sum(c * c, axis=0)) / sigma2  # (Dout,)
    trace = (jnp.sum(knn_diag) - sigma2 * jnp.sum(A * A)) / sigma2
    Dout = Y.shape[1]
    nll = (
        Dout / 2.0 * (logdet_B + n_valid * jnp.log(sigma2))
        + 0.5 * jnp.sum(w2 * quad)
        - n_valid * 0.5 * jnp.sum(jnp.log(w2))
        + Dout / 2.0 * trace
    )
    return nll, Lm, LB, c


def y_sparse_nll(params: SparseParams, Y: jax.Array, cfg: GPMDMConfig) -> jax.Array:
    """Sparse observation-map NLL (VFE form of core.y_neg_log_likelihood)."""
    Kmm = K.rbf_kernel(params.Zy, params.Zy, params.y_log_lengthscales)
    Kmn = K.rbf_kernel(params.Zy, params.X, params.y_log_lengthscales)
    knn_diag = jnp.ones((params.X.shape[0],), dtype=Y.dtype)
    w2 = jnp.exp(params.y_log_lambdas) ** 2
    nll, _, _, _ = _sgpr_terms(
        Kmm, Kmn, knn_diag, Y, params.y_log_sigma_n, w2, Y.shape[0],
        sigma_n_num=cfg.sigma_n_num_Y,
    )
    return nll


def _class_xin_xout(params: SparseParams, cfg: GPMDMConfig, pads: dict):
    """Padded per-class (Xin_c, Xout_c, mask) from the latent matrix."""
    X = params.X
    mask = pads["mask"]
    x_t = X[pads["idx_in"]] * mask[:, :, None]
    if cfg.dyn_back_step == 1:
        Xin_c = x_t
    else:
        Xin_c = jnp.concatenate([x_t, X[pads["idx_prev"]] * mask[:, :, None]], axis=2)
    Xout_c = X[pads["idx_out"]] * mask[:, :, None]
    if cfg.dyn_target == "delta":
        Xout_c = Xout_c - x_t
    return Xin_c, Xout_c, mask


def x_sparse_nll(
    params: SparseParams, cfg: GPMDMConfig, pads: dict
) -> jax.Array:
    """Sparse per-class dynamics NLL, batched over classes."""
    Xin_c, Xout_c, mask = _class_xin_xout(params, cfg, pads)
    w2 = jnp.exp(params.x_log_lambdas) ** 2

    def per_class(Z, Xin_b, Xout_b, m):
        Kmm = K.x_kernel(
            Z, Z, params.x_log_lengthscales, params.x_log_sigma_n,
            params.x_log_lin_coeff, with_noise=False,
        )
        Kmn = K.x_kernel(
            Z, Xin_b, params.x_log_lengthscales, params.x_log_sigma_n,
            params.x_log_lin_coeff, with_noise=False,
        )
        knn_diag = K.x_diag_kernel(Xin_b, params.x_log_lin_coeff, params.x_log_sigma_n)
        nll, _, _, _ = _sgpr_terms(
            Kmm, Kmn, knn_diag, Xout_b, params.x_log_sigma_n, w2,
            jnp.sum(m), col_mask=m, sigma_n_num=cfg.sigma_n_num_X,
        )
        return nll

    return jnp.sum(jax.vmap(per_class)(params.Zx, Xin_c, Xout_c, mask))


def sparse_nll(
    params: SparseParams,
    Y: jax.Array,
    cfg: GPMDMConfig,
    layout: DataLayout,
    balance: float = 1.0,
) -> jax.Array:
    """Total sparse MAP objective L_y + balance * L_x, plus the optional
    log-hyperprior (core.hyperprior_penalty, zero at the default config)."""
    pads = _pads_jnp(layout, Y.dtype)
    b = balance if cfg.balance_fix else 1.0
    return (
        y_sparse_nll(params, Y, cfg)
        + b * x_sparse_nll(params, cfg, pads)
        + core.hyperprior_penalty(params, cfg)
    )


def _pads_jnp(layout: DataLayout, dtype) -> dict:
    pads = padded_class_indices(layout)
    return {
        "idx_in": jnp.asarray(pads["idx_in"]),
        "idx_prev": jnp.asarray(pads["idx_prev"]),
        "idx_out": jnp.asarray(pads["idx_out"]),
        "mask": jnp.asarray(pads["mask"], dtype=dtype),
    }


# ---------------------------------------------------------------------------
# Posterior precompute + prediction (same contract as core.predict_*)
# ---------------------------------------------------------------------------


def precompute(
    params: SparseParams, Y: jax.Array, cfg: GPMDMConfig, layout: DataLayout
) -> SparsePosterior:
    """Precompute SGPR posterior state for both maps."""
    dt = Y.dtype
    # observation GP
    Kmm = K.rbf_kernel(params.Zy, params.Zy, params.y_log_lengthscales)
    Kmn = K.rbf_kernel(params.Zy, params.X, params.y_log_lengthscales)
    knn_diag = jnp.ones((params.X.shape[0],), dtype=dt)
    w2 = jnp.exp(params.y_log_lambdas) ** 2
    _, Lm, LB, c = _sgpr_terms(
        Kmm, Kmn, knn_diag, Y, params.y_log_sigma_n, w2, Y.shape[0],
        sigma_n_num=cfg.sigma_n_num_Y,
    )
    sigma2 = jnp.exp(params.y_log_sigma_n) ** 2 + cfg.sigma_n_num_Y**2 + _JITTER
    beta_y = LA.tri_solve(
        Lm.T, LA.tri_solve(LB.T, c, lower=False), lower=False
    ) / jnp.sqrt(sigma2)

    # per-class dynamics GPs
    pads = _pads_jnp(layout, dt)
    Xin_c, Xout_c, mask = _class_xin_xout(params, cfg, pads)
    w2x = jnp.exp(params.x_log_lambdas) ** 2

    def per_class(Z, Xin_b, Xout_b, m):
        Kmm = K.x_kernel(
            Z, Z, params.x_log_lengthscales, params.x_log_sigma_n,
            params.x_log_lin_coeff, with_noise=False,
        )
        Kmn = K.x_kernel(
            Z, Xin_b, params.x_log_lengthscales, params.x_log_sigma_n,
            params.x_log_lin_coeff, with_noise=False,
        )
        knn_diag = K.x_diag_kernel(Xin_b, params.x_log_lin_coeff, params.x_log_sigma_n)
        _, Lm, LB, c = _sgpr_terms(
            Kmm, Kmn, knn_diag, Xout_b, params.x_log_sigma_n, w2x,
            jnp.sum(m), col_mask=m, sigma_n_num=cfg.sigma_n_num_X,
        )
        s2 = jnp.exp(params.x_log_sigma_n) ** 2 + cfg.sigma_n_num_X**2 + _JITTER
        beta = LA.tri_solve(
            Lm.T, LA.tri_solve(LB.T, c, lower=False), lower=False
        ) / jnp.sqrt(s2)
        return Lm, LB, beta

    Lx, LBx, beta_x = jax.vmap(per_class)(params.Zx, Xin_c, Xout_c, mask)
    return SparsePosterior(
        X=params.X,
        Zy=params.Zy,
        Ly=Lm,
        LBy=LB,
        beta_y=beta_y,
        Zx=params.Zx,
        Lx=Lx,
        LBx=LBx,
        beta_x=beta_x,
    )


def _sgpr_predict(Lm, LB, beta, Kstar_m, kss_diag, quad_precision=None):
    """Shared SGPR predictive mean / common variance.

    Kstar_m: (M, N*) star kernel against inducing inputs.

    ``quad_precision`` (None = default): when set, the variance path runs
    as two (M, M) @ (M, N*) MXU matmuls against the hoisted triangular
    inverses Lm^-1 and LB^-1 Lm^-1 = (Lm LB)^-1 at that precision, instead of two
    HIGHEST-precision triangular solves per frame (the inversions are
    loop-invariant, so XLA lifts them out of filter scans).  Measured
    (interleaved A/B, M=128/P=10k): +12% PF fps single-filter and +30%
    on batched shapes (bank-vmap, per-class C=8) where the batched
    triangular solve lowers poorly; accuracy moves config-dependently
    (hourlong -0.018, banked/multi-class +0.01..+0.015) — so the default
    stays the tri-solve path and 'high' is a guard-arbitrated opt-in via
    PFConfig.quad_precision (docs/BENCHMARKS.md "SGPR variance path")."""
    mean = jnp.matmul(Kstar_m.T, beta, precision=_PREC)  # (N*, Dout)
    if quad_precision is None:
        v1 = LA.tri_solve(Lm, Kstar_m)  # (M, N*)
        v2 = LA.tri_solve(LB, v1)
    else:
        eye = jnp.eye(Lm.shape[0], dtype=Lm.dtype)
        Vi = LA.tri_solve(Lm, eye)  # Lm^-1, loop-invariant
        Wi = LA.tri_solve(LB, Vi)  # LB^-1 Lm^-1 = (Lm LB)^-1, loop-invariant
        v1 = jnp.matmul(Vi, Kstar_m, precision=quad_precision)
        v2 = jnp.matmul(Wi, Kstar_m, precision=quad_precision)
    var_common = kss_diag - jnp.sum(v1 * v1, axis=0) + jnp.sum(v2 * v2, axis=0)
    return mean, jnp.maximum(var_common, 1e-12)


def precompute_host(
    params: SparseParams, Y, cfg: GPMDMConfig, layout: DataLayout
) -> SparsePosterior:
    """SGPR posterior precompute on the HOST in float64, cast to model dtype
    (same rationale as core.precompute_host: factor high, deploy low — f32
    factorizations of trained kernels are at the conditioning cliff on
    TPU)."""
    from ..ops import kernels_host as KH

    f64 = KH.f64
    # one batched device->host transfer (see KH.fetch_tree)
    params, Y = KH.fetch_tree((params, Y))
    X = f64(params.X)
    Y64 = f64(Y)
    Zy = f64(params.Zy)
    Zx = f64(params.Zx)
    y_ls = np.exp(f64(params.y_log_lengthscales))
    x_ls = np.exp(f64(params.x_log_lengthscales))
    x_lw = np.exp(f64(params.x_log_lin_coeff)) ** 2
    sigma2_y = float(np.exp(f64(params.y_log_sigma_n))) ** 2 + cfg.sigma_n_num_Y**2 + _JITTER
    sigma2_x = float(np.exp(f64(params.x_log_sigma_n))) ** 2 + cfg.sigma_n_num_X**2 + _JITTER

    def rbf(A, B, ls):
        return KH.rbf(A, B, ls)

    def xker(A, B):
        return KH.x_kernel(A, B, x_ls, x_lw)

    def sgpr(Kmm, Kmn, Ydata, sigma2):
        M = Kmm.shape[0]
        # same Kuu jitter the MODEL-dtype training loss uses, so the
        # deployed posterior matches the trained objective.  Keyed on the
        # DEPLOY dtype (cfg.dtype), not the incoming array dtype: callers
        # pass f64 host copies (checkpoint loading, distill_host) while
        # the factors deploy — and tri-solve — at model dtype.
        Lm = np.linalg.cholesky(Kmm + _kuu_jitter(cfg.dtype) * np.eye(M))
        import scipy.linalg as sl

        A = sl.solve_triangular(Lm, Kmn, lower=True) / np.sqrt(sigma2)
        B = np.eye(M) + A @ A.T
        LB = np.linalg.cholesky(B)
        c = sl.solve_triangular(LB, A @ Ydata, lower=True)
        beta = sl.solve_triangular(
            Lm.T, sl.solve_triangular(LB.T, c, lower=False), lower=False
        ) / np.sqrt(sigma2)
        return Lm, LB, beta

    Lm_y, LB_y, beta_y = sgpr(rbf(Zy, Zy, y_ls), rbf(Zy, X, y_ls), Y64, sigma2_y)

    pads = padded_class_indices(layout)
    Xin_c, Xout_c, mask = KH.class_xin_xout(X, layout, cfg, pads)

    C, Mx = Zx.shape[0], Zx.shape[1]
    Lx = np.zeros((C, Mx, Mx))
    LBx = np.zeros((C, Mx, Mx))
    beta_x = np.zeros((C, Mx, cfg.d))
    for c in range(C):
        Kmn = xker(Zx[c], Xin_c[c]) * mask[c][None, :]
        Lx[c], LBx[c], beta_x[c] = sgpr(
            xker(Zx[c], Zx[c]), Kmn, Xout_c[c], sigma2_x
        )

    def cast(a):
        # cast to the TRUE model dtype (incl. bfloat16)
        return jnp.asarray(np.asarray(a, dtype=np.float64), dtype=jnp.dtype(cfg.dtype))

    return SparsePosterior(
        X=cast(X),
        Zy=cast(Zy),
        Ly=cast(Lm_y),
        LBy=cast(LB_y),
        beta_y=cast(beta_y),
        Zx=cast(Zx),
        Lx=cast(Lx),
        LBx=cast(LBx),
        beta_x=cast(beta_x),
    )


def predict_y(
    post: SparsePosterior, params: SparseParams, Xstar: jax.Array,
    cfg: GPMDMConfig, with_noise: bool = False, precision=_PREC,
    quad_precision=None, recon_precision=None, fused: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse latent -> observation posterior; same contract as
    core.predict_y.  ``quad_precision`` (None = default) switches the
    variance path to hoisted-inverse MXU matmuls at that precision (see
    _sgpr_predict; +12% single / +30% batched PF fps measured,
    guard-arbitrated); ``recon_precision``/``fused`` are accepted for
    interface parity and ignored (no reconstruction matmul, and the SGPR
    mean/variance operate on different factors)."""
    Kstar = K.rbf_kernel(post.Zy, Xstar, params.y_log_lengthscales, precision=precision)
    kss = K.y_diag_kernel(Xstar, params.y_log_sigma_n, cfg.sigma_n_num_Y, with_noise)
    mean, var_common = _sgpr_predict(post.Ly, post.LBy, post.beta_y, Kstar, kss,
                                     quad_precision=quad_precision)
    var = var_common[:, None] * jnp.exp(params.y_log_lambdas)[None, :] ** -2
    return mean, var


def _predict_x_per_class(
    post: SparsePosterior, params: SparseParams, Xstar: jax.Array,
    cfg: GPMDMConfig, with_noise: bool, precision, quad_precision=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-class SGPR dynamics posteriors: means (C, N*, d), common
    variances (C, N*) pre-lambda, and the star prior diagonal (N*,).
    ``quad_precision``: see _sgpr_predict."""
    kss = K.x_diag_kernel(
        Xstar, params.x_log_lin_coeff, params.x_log_sigma_n, cfg.sigma_n_num_X, with_noise
    )

    def per_class(Z, Lm, LB, beta):
        Kstar = K.x_kernel(
            Z, Xstar, params.x_log_lengthscales, params.x_log_sigma_n,
            params.x_log_lin_coeff, with_noise=False, precision=precision,
        )
        return _sgpr_predict(Lm, LB, beta, Kstar, kss,
                             quad_precision=quad_precision)

    means, var_common = jax.vmap(per_class)(post.Zx, post.Lx, post.LBx, post.beta_x)
    return means, var_common, kss


def predict_x_all_classes(
    post: SparsePosterior, params: SparseParams, Xstar: jax.Array,
    cfg: GPMDMConfig, with_noise: bool = False, precision=_PREC,
    quad_precision=None, recon_precision=None, fused: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse per-class dynamics posterior for every class at once; same
    contract as core.predict_x_all_classes: (C, N*, d) mean and var.
    ``quad_precision``: the hoisted-inverse variance path (see
    predict_y); ``recon_precision``/``fused`` accepted for interface
    parity, ignored."""
    means, var_common, _ = _predict_x_per_class(
        post, params, Xstar, cfg, with_noise, precision, quad_precision
    )
    var = var_common[:, :, None] * jnp.exp(params.x_log_lambdas)[None, None, :] ** -2
    return means, var


def predict_x(
    post: SparsePosterior, params: SparseParams, Xstar: jax.Array,
    cfg: GPMDMConfig, with_noise: bool = False, precision=_PREC,
    quad_precision=None,
) -> Tuple[jax.Array, jax.Array]:
    """All-class sparse dynamics posterior (analogue of core.predict_x /
    reference map_x_dynamics, gpmdm.py:993-1030).

    In the exact model the masked Gram is block-diagonal, which makes the
    all-class map ADDITIVE over classes: the unmasked star kernel splits
    by class rows, so mean = sum_c mean_c and the predictive-variance
    reduction = sum_c (kss - var_common_c)  (verified against
    core.predict_x in tests/test_sparse.py).  The sparse family applies
    the same additivity to the per-class SGPR posteriors — each class's
    inducing set stands in for its training block."""
    means, var_common, kss = _predict_x_per_class(
        post, params, Xstar, cfg, with_noise, precision, quad_precision
    )
    mean = jnp.sum(means, axis=0)
    var_common_all = jnp.maximum(
        kss - jnp.sum(kss[None, :] - var_common, axis=0), 1e-9
    )
    var = var_common_all[:, None] * jnp.exp(params.x_log_lambdas)[None, :] ** -2
    return mean, var


def predict_x_for_class(
    post: SparsePosterior, params: SparseParams, Xstar: jax.Array,
    class_index: int, cfg: GPMDMConfig, with_noise: bool = False,
):
    mean, var = predict_x_all_classes(post, params, Xstar, cfg, with_noise)
    return mean[class_index], var[class_index]


def _kmeans(X: np.ndarray, M: int, iters: int = 25) -> np.ndarray:
    """Deterministic Lloyd's k-means on the host (f64): init = even-stride
    subset, empty clusters re-seeded to the farthest point from its
    centroid.  Used for inducing-input selection — centroids cover the
    trained manifold more evenly than strided data rows, which matters at
    small M (measured: the 8-class distillation dial, BENCHMARKS.md)."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if M >= n:
        return X.copy()
    idx = np.linspace(0, n - 1, M).round().astype(int)
    C = X[idx].copy()
    X2 = (X * X).sum(1)[:, None]  # (n, 1), loop-invariant
    for _ in range(iters):
        # (n, M) squared distances via the matmul form — the rank-3
        # broadcast would materialize (n, M, dim) f64 temporaries
        # (~0.4 GB/iter at Ny=108k); argmin is shift-invariant so X2
        # could even be dropped, kept for the re-seed distances below
        d2 = X2 + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
        a = d2.argmin(1)
        newC = np.zeros_like(C)
        counts = np.bincount(a, minlength=M).astype(np.float64)
        np.add.at(newC, a, X)
        empty = counts == 0
        counts[empty] = 1.0
        newC /= counts[:, None]
        if empty.any():
            # re-seed empties at the points farthest from their centroid
            far = d2[np.arange(n), a].argsort()[::-1]
            newC[empty] = X[far[: int(empty.sum())]]
        if np.allclose(newC, C):
            C = newC
            break
        C = newC
    return C


def distill_host(
    params, Y, cfg: GPMDMConfig, layout: DataLayout,
    n_inducing_y: int = 128, n_inducing_x: int | None = None,
    method: str = "stride",
) -> SparsePosterior:
    """Post-hoc SGPR distillation of a trained EXACT model into a
    :class:`SparsePosterior` (deploy-time, host f64, one-shot).

    No reference counterpart (the reference family is exact-only; its
    paper names sparse approximations as future work).  Keeps the
    exact-trained hyperparameters and latents verbatim, selects inducing
    inputs as an even-stride per-class subset of the TRAINED latents
    (``init_inducing`` on the trained X), and builds the standard SGPR
    predictive factors (``precompute_host``).  The filter's per-frame
    star kernel drops from (Ny, P) to (M, P) and the variance path to
    O(M^2 P) — the lever the compressed posterior cannot reach, since its
    exact mean still needs the full (Ny, P) star kernel every frame.

    ``params`` may be device GPMDMParams or host numpy copies (checkpoint
    loading); ``n_inducing_x`` defaults to ``n_inducing_y`` and both are
    clamped to the available row counts (at the clamp the SGPR posterior
    equals the exact one up to jitter — tested).  ``method``: 'stride'
    (even-stride data subset, ``init_inducing``) or 'kmeans'
    (deterministic Lloyd centroids per GP/class — better manifold
    coverage at small M; measured on the 8-class dial, BENCHMARKS.md)."""
    from ..ops import kernels_host as KH

    if method not in ("stride", "kmeans"):
        raise ValueError("method must be 'stride' or 'kmeans'")
    params = KH.fetch_tree(params)
    if n_inducing_x is None:
        n_inducing_x = n_inducing_y
    My = int(min(n_inducing_y, int(layout.Ny)))
    min_nc = int(np.min(np.asarray(layout.class_x_counts)))
    Mx = int(min(n_inducing_x, min_nc))
    X0 = np.asarray(params.X, dtype=np.float64)
    if method == "kmeans":
        Zy = _kmeans(X0, My)
        pads = padded_class_indices(layout)
        Xin_c, _, mask = KH.class_xin_xout(X0, layout, cfg, pads)
        Zx = np.stack([
            _kmeans(Xin_c[c][mask[c].astype(bool)], Mx)
            for c in range(layout.n_classes)
        ])
    else:
        Zy, Zx = init_inducing(X0, layout, cfg, My, Mx)
    sp = SparseParams(
        y_log_lengthscales=np.asarray(params.y_log_lengthscales, np.float64),
        y_log_lambdas=np.asarray(params.y_log_lambdas, np.float64),
        y_log_sigma_n=np.asarray(params.y_log_sigma_n, np.float64),
        x_log_lengthscales=np.asarray(params.x_log_lengthscales, np.float64),
        x_log_lambdas=np.asarray(params.x_log_lambdas, np.float64),
        x_log_sigma_n=np.asarray(params.x_log_sigma_n, np.float64),
        x_log_lin_coeff=np.asarray(params.x_log_lin_coeff, np.float64),
        X=X0,
        Zy=Zy,
        Zx=Zx,
    )
    return dataclasses.replace(
        precompute_host(sp, Y, cfg, layout), distilled=True
    )


def init_inducing(
    X0: np.ndarray, layout: DataLayout, cfg: GPMDMConfig, n_inducing_y: int, n_inducing_x: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic inducing-input init: an even-stride subset of the PCA
    latent init (observation GP) and of each class's dynamics inputs."""
    Ny = X0.shape[0]
    idx = np.linspace(0, Ny - 1, n_inducing_y).round().astype(int)
    Zy = X0[idx].copy()

    pads = padded_class_indices(layout)
    C = layout.n_classes
    din = cfg.d * cfg.dyn_back_step
    Zx = np.zeros((C, n_inducing_x, din), dtype=X0.dtype)
    for c in range(C):
        n_c = int(layout.class_x_counts[c])
        sel = np.linspace(0, n_c - 1, n_inducing_x).round().astype(int)
        x_t = X0[pads["idx_in"][c, sel]]
        if cfg.dyn_back_step == 1:
            Zx[c] = x_t
        else:
            Zx[c] = np.concatenate([x_t, X0[pads["idx_prev"][c, sel]]], axis=1)
    return Zy, Zx
