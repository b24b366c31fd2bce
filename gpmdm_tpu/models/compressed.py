"""Deploy-time low-rank compression of the exact GP posterior quad term.

The particle filter's dominant FLOP sink at large training sets is the
predictive-variance quad contraction ``kstar^T K^-1 kstar`` — O(N^2 P) per
frame for the observation GP and each class's dynamics GP (reference math:
map_x_to_y / map_x_dynamics_for_class, gpmdm.py:923-963 / :1032-1068; the
reference never faces this because it runs 100 particles).  The round-2
Pallas sweep proved the stage MXU-bound, so the remaining honest lever is
FEWER FLOPs, not better scheduling (docs/BENCHMARKS.md).

The structure that makes compression exact-ish: every trained Gram here is
``K = K_smooth + s I`` with ``K_smooth`` PSD and numerically low-rank (RBF
over a d<=4-dim latent manifold decays spectrally fast; the dynamics linear
kernel is exactly rank d*bs+1).  Eigendecompose once on the host in f64:

    K = U diag(mu) U^T,   mu_i >= s   (s = total diagonal noise shift)
    K^-1 = (1/s) (I - U diag(d) U^T),   d_i = (mu_i - s) / mu_i in [0, 1)

Truncating to the top-q eigenpairs (all discarded d_i ~ 0) gives

    quad(k) ~= (1/s) ||k||^2 - ||R k||^2,   R = diag(sqrt(d)/sqrt(s)) U_q^T

an O(N q P) contraction instead of O(N^2 P).  The truncation direction
makes quad an OVER-estimate by sum_{i>q} d_i (u_i^T k)^2 / s >= 0, i.e. the
predictive variance is slightly UNDER-estimated; the bench accuracy guard
arbitrates whether a given rank is usable (it is: see docs/BENCHMARKS.md
round-3 table).

The posterior MEAN is left exact — it costs O(N D P), a factor N/D below
the quad — so compression touches nothing the resampling mean-path depends
on.

Usage: ``post_c = GPMDM.compressed_posterior(rank_y=..., rank_x=...)``;
``pf_scan``/``GPMDM_PF`` accept it anywhere an exact ``core.Posterior`` is
accepted (filter backend dispatch, particle_filter._predictors).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GPMDMConfig
from ..ops import kernels as K
from ..ops.layout import DataLayout

_PREC = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CompressedPosterior:
    """Exact-mean / low-rank-variance GP posterior state.

    Same prediction contract as :class:`core.Posterior` (the filter
    dispatches on type).  ``inv_s*`` are scalar arrays (1/s, the inverse
    total diagonal shift); ``Ry``/``Rxc`` are the truncated quad factors.
    """

    X: jax.Array  # (Ny, d) latent matrix snapshot
    Ay: jax.Array  # (Ny, D) observation predictive weights (exact mean)
    Ry: jax.Array  # (qy, Ny) obs quad factor
    inv_s2y: jax.Array  # () 1 / (sigma_n^2 + sigma_num^2)
    Xin_c: jax.Array  # (C, n_max, din) per-class dynamics inputs, zero-padded
    mask_c: jax.Array  # (C, n_max)
    Axc: jax.Array  # (C, n_max, d) per-class dynamics weights (exact mean)
    Rxc: jax.Array  # (C, qx, n_max) per-class quad factors, zero-padded
    inv_s2x: jax.Array  # () 1 / (x noise + class_jitter)


def _quad_factor(Kmat: np.ndarray, shift: float, rank, tol: float):
    """Top-q eigen factor R (q, N) with quad(k) = ||k||^2/s - ||R k||^2.

    ``Kmat`` (f64, WITH the diagonal shift included) is eigendecomposed;
    eigenpairs with ``d_i = (mu_i - s)/mu_i > tol`` are kept (or exactly
    ``rank`` of them if given), largest first.  Returns (R, kept)."""
    N = Kmat.shape[0]
    mu, U = np.linalg.eigh(Kmat)  # ascending
    mu = mu[::-1]
    U = U[:, ::-1]
    d = np.clip((mu - shift) / np.maximum(mu, 1e-300), 0.0, 1.0)
    if rank is None:
        q = int(np.sum(d > tol))
    else:
        q = min(int(rank), N)
    q = max(q, 1)
    R = (np.sqrt(d[:q] / shift)[:, None]) * U[:, :q].T  # (q, N)
    return R, q


def compress_host(
    params,
    Y,
    cfg: GPMDMConfig,
    layout: DataLayout,
    rank_y: int | None = None,
    rank_x: int | None = None,
    tol: float = 1e-6,
) -> CompressedPosterior:
    """Build a :class:`CompressedPosterior` on the host in f64.

    Same factor-high/deploy-low rationale as ``core.precompute_host``; the
    extra cost over the exact precompute is two eigendecompositions
    (O(N^3), once per refresh).  ``rank_y``/``rank_x`` pin the kept ranks
    (rounded shapes are the caller's choice); ``tol`` is the spectral
    cutoff on ``d_i = (mu_i - s)/mu_i`` when a rank is not pinned.
    """
    from ..ops import kernels_host as KH

    f64 = KH.f64
    params, Y = KH.fetch_tree((params, Y))
    X = f64(params.X)
    Y64 = f64(Y)
    y_ls = np.exp(f64(params.y_log_lengthscales))
    s_y = float(np.exp(f64(params.y_log_sigma_n))) ** 2 + cfg.sigma_n_num_Y**2
    x_ls = np.exp(f64(params.x_log_lengthscales))
    s_x = (
        float(np.exp(f64(params.x_log_sigma_n))) ** 2
        + cfg.sigma_n_num_X**2
        + cfg.class_jitter
    )
    x_lw = np.exp(f64(params.x_log_lin_coeff)) ** 2

    Ky = KH.rbf(X, X, y_ls) + s_y * np.eye(X.shape[0])
    Ay = np.linalg.solve(Ky, Y64)
    Ry, _ = _quad_factor(Ky, s_y, rank_y, tol)

    x_t = X[layout.xin_idx]
    Xin = (
        x_t
        if layout.back_step == 1
        else np.concatenate([x_t, X[layout.xin_prev_idx]], axis=1)
    )
    Xout = X[layout.xout_idx]
    if cfg.dyn_target == "delta":
        Xout = Xout - x_t

    C, n_max = layout.n_classes, layout.n_max
    din = Xin.shape[1]
    Xin_c = np.zeros((C, n_max, din))
    Axc = np.zeros((C, n_max, cfg.d))
    R_blocks = []
    q_max = 0
    for c in range(C):
        lo, hi = int(layout.x_class_offsets[c]), int(layout.x_class_offsets[c + 1])
        n_c = hi - lo
        blk = Xin[lo:hi]
        Kc = KH.x_kernel(blk, blk, x_ls, x_lw) + s_x * np.eye(n_c)
        Axc[c, :n_c] = np.linalg.solve(Kc, Xout[lo:hi])
        Xin_c[c, :n_c] = blk
        Rc, qc = _quad_factor(Kc, s_x, rank_x, tol)
        R_blocks.append((Rc, n_c))
        q_max = max(q_max, qc)
    Rxc = np.zeros((C, q_max, n_max))
    for c, (Rc, n_c) in enumerate(R_blocks):
        Rxc[c, : Rc.shape[0], :n_c] = Rc

    dt = jnp.dtype(cfg.dtype)

    def cast(a):
        return jnp.asarray(np.asarray(a, dtype=np.float64), dtype=dt)

    return CompressedPosterior(
        X=cast(X),
        Ay=cast(Ay),
        Ry=cast(Ry),
        inv_s2y=cast(1.0 / s_y),
        Xin_c=cast(Xin_c),
        mask_c=jnp.asarray(layout.class_pair_mask, dtype=dt),
        Axc=cast(Axc),
        Rxc=cast(Rxc),
        inv_s2x=cast(1.0 / s_x),
    )


def predict_y(
    post: CompressedPosterior,
    params,
    Xstar: jax.Array,
    cfg: GPMDMConfig,
    with_noise: bool = False,
    precision=_PREC,
    quad_precision=None,
) -> tuple[jax.Array, jax.Array]:
    """Latent -> observation posterior with the compressed quad (same
    contract as core.predict_y; mean is exact, variance rank-q)."""
    if quad_precision is None:
        quad_precision = precision
    Kstar = K.rbf_kernel(
        post.X, Xstar, params.y_log_lengthscales, precision=precision
    )  # (Ny, P)
    mean = jnp.matmul(Kstar.T, post.Ay, precision=precision)  # (P, D)
    RK = jnp.matmul(post.Ry, Kstar, precision=quad_precision)  # (qy, P)
    quad = post.inv_s2y * jnp.sum(Kstar * Kstar, axis=0) - jnp.sum(RK * RK, axis=0)
    diag_common = (
        K.y_diag_kernel(Xstar, params.y_log_sigma_n, cfg.sigma_n_num_Y, with_noise)
        - quad
    )
    diag_common = jnp.maximum(diag_common, 1e-9)
    var = diag_common[:, None] * jnp.exp(params.y_log_lambdas)[None, :] ** -2
    return mean, var


def predict_x_all_classes(
    post: CompressedPosterior,
    params,
    Xstar: jax.Array,
    cfg: GPMDMConfig,
    with_noise: bool = False,
    precision=_PREC,
    quad_precision=None,
) -> tuple[jax.Array, jax.Array]:
    """Per-class dynamics posterior for every class with compressed quads
    (same contract as core.predict_x_all_classes)."""
    if quad_precision is None:
        quad_precision = precision
    kst = jax.vmap(
        lambda Xin_blk: K.x_kernel(
            Xin_blk,
            Xstar,
            params.x_log_lengthscales,
            params.x_log_sigma_n,
            params.x_log_lin_coeff,
            with_noise=False,
            precision=precision,
        )
    )(post.Xin_c)
    kst = kst * post.mask_c[:, :, None]  # (C, n_max, P)
    mean = jnp.einsum("cnp,cnd->cpd", kst, post.Axc, precision=precision)
    RK = jnp.einsum("cqn,cnp->cqp", post.Rxc, kst, precision=quad_precision)
    quad = post.inv_s2x * jnp.sum(kst * kst, axis=1) - jnp.sum(RK * RK, axis=1)
    diag_star = K.x_diag_kernel(
        Xstar, params.x_log_lin_coeff, params.x_log_sigma_n, cfg.sigma_n_num_X, with_noise
    )  # (P,)
    diag_common = jnp.maximum(diag_star[None, :] - quad, 1e-9)  # (C, P)
    var = diag_common[:, :, None] * jnp.exp(params.x_log_lambdas)[None, None, :] ** -2
    return mean, var
