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

Truncating to the top-q eigenpairs (every discarded 1/mu_i ~ 1/s) gives

    quad(k) ~= sum_{i<=q} (u_i^T k)^2 / mu_i  +  ||k - U_q U_q^T k||^2 / s

two O(N q P) contractions instead of one O(N^2 P).  The residual is
computed as a VECTOR (k minus its top-q reconstruction) on purpose: the
algebraically-equal scalar form ``||k||^2/s - ||R k||^2`` is a
catastrophic cancellation — the dynamics linear kernel makes
``||k||^2/s`` orders of magnitude larger than the quad itself, so its
f32 rounding (~eps * ||k||^2/s) swamped the result (measured at the
headline asset: variance errors up to 39 absolute on a <=3.2 range, and
a rank-INDEPENDENT 0.927 accuracy plateau vs 0.958 exact; fixed by this
formulation).  The truncation direction makes quad an OVER-estimate by
sum_{i>q} (1/s - 1/mu_i) (u_i^T k)^2 >= 0, i.e. the predictive variance
is slightly UNDER-estimated; the bench accuracy guard arbitrates whether
a given rank is usable (it is: see docs/BENCHMARKS.md round-3 table).

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
    Uy: jax.Array  # (Ny, qy) obs Gram top eigenvectors
    inv_mu_y: jax.Array  # (qy,) their inverse eigenvalues
    inv_s2y: jax.Array  # () 1 / (sigma_n^2 + sigma_num^2)
    Xin_c: jax.Array  # (C, n_max, din) per-class dynamics inputs, zero-padded
    mask_c: jax.Array  # (C, n_max)
    Axc: jax.Array  # (C, n_max, d) per-class dynamics weights (exact mean)
    Uxc: jax.Array  # (C, n_max, qx) per-class top eigenvectors, zero-padded
    inv_mu_xc: jax.Array  # (C, qx) inverse eigenvalues, zero-padded
    inv_s2x: jax.Array  # () 1 / (x noise + class_jitter)

    @property
    def rank_y(self) -> int:
        return self.Uy.shape[1]

    @property
    def rank_x(self) -> int:
        return self.Uxc.shape[2]


def _quad_factor(Kmat: np.ndarray, shift: float, rank, tol: float):
    """Top-q eigenpairs (U_q, 1/mu_q) of the shifted Gram for the
    well-conditioned quad split (module docstring).

    ``Kmat`` (f64, WITH the diagonal shift included) is eigendecomposed;
    eigenpairs with ``d_i = (mu_i - s)/mu_i > tol`` are kept (or exactly
    ``rank`` of them if given), largest first.  Returns
    (U_q (N, q), inv_mu (q,), kept)."""
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
    # eigh roundoff can put mu_i slightly below the shift; 1/mu > 1/s
    # would then overshoot the discarded-direction weight
    inv_mu = 1.0 / np.maximum(mu[:q], shift)
    return U[:, :q], inv_mu, q


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
    Uy, inv_mu_y, _ = _quad_factor(Ky, s_y, rank_y, tol)

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
    U_blocks = []
    q_max = 0
    for c in range(C):
        lo, hi = int(layout.x_class_offsets[c]), int(layout.x_class_offsets[c + 1])
        n_c = hi - lo
        blk = Xin[lo:hi]
        Kc = KH.x_kernel(blk, blk, x_ls, x_lw) + s_x * np.eye(n_c)
        Axc[c, :n_c] = np.linalg.solve(Kc, Xout[lo:hi])
        Xin_c[c, :n_c] = blk
        Uc, imu_c, qc = _quad_factor(Kc, s_x, rank_x, tol)
        U_blocks.append((Uc, imu_c, n_c))
        q_max = max(q_max, qc)
    # zero-padded eigen slots (cols of U / entries of inv_mu) are exactly
    # "discarded directions": they contribute nothing to the top-q term
    # and fall through to the 1/s residual, which is the truncation
    # semantics for real discarded pairs too
    Uxc = np.zeros((C, n_max, q_max))
    inv_mu_xc = np.zeros((C, q_max))
    for c, (Uc, imu_c, n_c) in enumerate(U_blocks):
        Uxc[c, :n_c, : Uc.shape[1]] = Uc
        inv_mu_xc[c, : imu_c.shape[0]] = imu_c

    dt = jnp.dtype(cfg.dtype)

    def cast(a):
        return jnp.asarray(np.asarray(a, dtype=np.float64), dtype=dt)

    return CompressedPosterior(
        X=cast(X),
        Ay=cast(Ay),
        Uy=cast(Uy),
        inv_mu_y=cast(inv_mu_y),
        inv_s2y=cast(1.0 / s_y),
        Xin_c=cast(Xin_c),
        mask_c=jnp.asarray(layout.class_pair_mask, dtype=dt),
        Axc=cast(Axc),
        Uxc=cast(Uxc),
        inv_mu_xc=cast(inv_mu_xc),
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
    recon_precision=None,
    fused: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Latent -> observation posterior with the compressed quad (same
    contract as core.predict_y; mean is exact, variance rank-q).

    ``recon_precision`` optionally lowers only the residual
    RECONSTRUCTION matmul (k - U (U^T k)): its error enters the quad
    damped by ||residual||/||k|| (module docstring), so it can tolerate
    cheaper MXU passes than the eigenbasis projection.  Defaults to
    ``quad_precision``.  ``fused`` (None -> fuse iff n_classes <= 2):
    see core.predict_y."""
    if quad_precision is None:
        quad_precision = precision
    if recon_precision is None:
        recon_precision = quad_precision
    if fused is None:
        fused = cfg.n_classes <= 2
    Kstar = K.rbf_kernel(
        post.X, Xstar, params.y_log_lengthscales, precision=precision
    )  # (Ny, P)
    # well-conditioned quad split (module docstring): exact 1/mu weights in
    # the kept eigenspace + 1/s on the explicitly-reconstructed residual
    if fused and quad_precision == precision:
        # fused mean+projection against the shared star kernel (one MXU
        # call; see core.predict_y / tools/exp_fused_mean_quad.py)
        D = post.Ay.shape[1]
        lhs = jnp.concatenate([post.Ay.T, post.Uy.T], axis=0)  # (D+qy, Ny)
        out = jnp.matmul(lhs, Kstar, precision=precision)
        mean = out[:D].T
        UK = out[D:]  # (qy, P)
    else:
        mean = jnp.matmul(Kstar.T, post.Ay, precision=precision)  # (P, D)
        UK = jnp.matmul(post.Uy.T, Kstar, precision=quad_precision)  # (qy, P)
    resid = Kstar - jnp.matmul(post.Uy, UK, precision=recon_precision)
    quad = jnp.sum(post.inv_mu_y[:, None] * UK * UK, axis=0) + (
        post.inv_s2y * jnp.sum(resid * resid, axis=0)
    )
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
    recon_precision=None,
    fused: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-class dynamics posterior for every class with compressed quads
    (same contract as core.predict_x_all_classes).  ``recon_precision``
    and ``fused``: see predict_y."""
    if quad_precision is None:
        quad_precision = precision
    if recon_precision is None:
        recon_precision = quad_precision
    if fused is None:
        fused = cfg.n_classes <= 2
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
    # well-conditioned quad split (module docstring); padded rows/eigen
    # slots are zero so they drop out of both terms correctly
    if fused and quad_precision == precision:
        # fused mean+projection per class (see core.predict_x_all_classes)
        d = post.Axc.shape[2]
        lhs = jnp.concatenate(
            [jnp.swapaxes(post.Axc, 1, 2), jnp.swapaxes(post.Uxc, 1, 2)],
            axis=1,
        )  # (C, d+qx, n_max)
        out = jnp.einsum("cmn,cnp->cmp", lhs, kst, precision=precision)
        mean = jnp.swapaxes(out[:, :d], 1, 2)  # (C, P, d)
        UK = out[:, d:]  # (C, qx, P)
    else:
        mean = jnp.einsum("cnp,cnd->cpd", kst, post.Axc, precision=precision)
        UK = jnp.einsum("cnq,cnp->cqp", post.Uxc, kst, precision=quad_precision)
    resid = kst - jnp.einsum(
        "cnq,cqp->cnp", post.Uxc, UK, precision=recon_precision
    )
    quad = jnp.sum(post.inv_mu_xc[:, :, None] * UK * UK, axis=1) + (
        post.inv_s2x * jnp.sum(resid * resid, axis=1)
    )
    diag_star = K.x_diag_kernel(
        Xstar, params.x_log_lin_coeff, params.x_log_sigma_n, cfg.sigma_n_num_X, with_noise
    )  # (P,)
    diag_common = jnp.maximum(diag_star[None, :] - quad, 1e-9)  # (C, P)
    var = diag_common[:, :, None] * jnp.exp(params.x_log_lambdas)[None, None, :] ** -2
    return mean, var
