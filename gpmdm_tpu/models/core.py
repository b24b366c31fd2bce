"""Pure-functional GPMDM core: parameters, loss, posterior precompute, prediction.

TPU-native re-design of the reference model (`/root/reference/gpmdm/gpmdm.py`):

- Parameters are a pytree (:class:`GPMDMParams`) of log-space hyperparameters
  plus the latent matrix X, exactly mirroring the reference's trainables
  (gpmdm.py:201-230, :773).
- The MAP loss (:func:`nll`) reproduces L_y + balance * L_x
  (gpmdm.py:550-628, :721-760) but factors the class-block-masked dynamics
  Gram as independent dense per-class blocks instead of Cholesky-factoring a
  masked Nx x Nx matrix.  Because the mask zeroes all cross-class entries and
  the layout is class-major (layout.py), ``K_x * M`` is exactly block
  diagonal, so this is mathematically identical while being better
  conditioned (no zero off-diagonal blocks feeding the factorization) and
  cheaper (O(sum n_c^3) vs O(Nx^3)).
- GP posterior precomputation (:func:`precompute`) mirrors
  ``_precompute_kernel_inverses`` (gpmdm.py:1284-1305) with per-class
  quantities stored zero-padded and stacked on a leading class axis so that
  downstream consumers (the particle filter) can evaluate *all* classes for
  *all* query points in single batched einsums — the TPU-native replacement
  for the reference's per-class Python gather loop (gpmdm_pf.py:158).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GPMDMConfig
from ..ops import kernels as K
from ..ops import linalg as LA
from ..ops.layout import DataLayout, xin_xout

_PREC = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPMDMParams:
    """Trainable state. All hyperparameters live in log space (reference
    gpmdm.py:201-230); X is the (Ny, d) latent matrix (gpmdm.py:773)."""

    y_log_lengthscales: jax.Array  # (d,)
    y_log_lambdas: jax.Array  # (D,)
    y_log_sigma_n: jax.Array  # ()
    x_log_lengthscales: jax.Array  # (d * back_step,)
    x_log_lambdas: jax.Array  # (d,)
    x_log_sigma_n: jax.Array  # ()
    x_log_lin_coeff: jax.Array  # (d * back_step + 1,)
    X: jax.Array  # (Ny, d)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Posterior:
    """Precomputed exact-GP posterior state (reference gpmdm.py:1284-1305).

    Per-class arrays are zero-padded to ``n_max`` rows and stacked on a
    leading class axis C.
    """

    X: jax.Array  # (Ny, d) latent matrix snapshot
    Y: jax.Array  # (Ny, D) observation matrix
    Ky_inv: jax.Array  # (Ny, Ny)
    Ay: jax.Array  # (Ny, D) = Ky_inv @ Y  (observation predictive weights)
    Xin: jax.Array  # (Nx, din) dynamics inputs
    Xout: jax.Array  # (Nx, d) dynamics outputs
    Kx_inv: jax.Array  # (Nx, Nx) block-diagonal inverse of K_x * M
    Ax: jax.Array  # (Nx, d) = Kx_inv @ Xout
    Xin_c: jax.Array  # (C, n_max, din) per-class dynamics inputs, zero-padded
    mask_c: jax.Array  # (C, n_max) 1.0 valid / 0.0 pad
    Kxc_inv: jax.Array  # (C, n_max, n_max) per-class (K_c + jitter I)^-1, zero-padded
    Axc: jax.Array  # (C, n_max, d) = Kxc_inv @ Xout_c, zero-padded


def init_params(
    cfg: GPMDMConfig,
    y_lengthscales_init,
    y_lambdas_init,
    y_sigma_n_init,
    x_lengthscales_init,
    x_lambdas_init,
    x_sigma_n_init,
    x_lin_coeff_init,
    X0=None,
) -> GPMDMParams:
    """Build params from *linear-space* initial hyperparameters (the reference
    ctor takes linear values and stores logs, gpmdm.py:201-230)."""
    dt = jnp.dtype(cfg.dtype)

    def log_of(v, shape):
        arr = jnp.broadcast_to(jnp.asarray(v, dtype=dt), shape)
        return jnp.log(arr)

    d, D, bs = cfg.d, cfg.D, cfg.dyn_back_step
    if X0 is None:
        X0 = jnp.zeros((0, d), dtype=dt)
    return GPMDMParams(
        y_log_lengthscales=log_of(y_lengthscales_init, (d,)),
        y_log_lambdas=log_of(y_lambdas_init, (D,)),
        y_log_sigma_n=log_of(y_sigma_n_init, ()),
        x_log_lengthscales=log_of(x_lengthscales_init, (d * bs,)),
        x_log_lambdas=log_of(x_lambdas_init, (d,)),
        x_log_sigma_n=log_of(x_sigma_n_init, ()),
        x_log_lin_coeff=log_of(x_lin_coeff_init, (d * bs + 1,)),
        X=jnp.asarray(X0, dtype=dt),
    )


def pca_init_x(Y: np.ndarray, d: int) -> np.ndarray:
    """PCA latent initialization matching sklearn's ``PCA.fit_transform``
    (reference init_X, gpmdm.py:762-768): center, SVD, deterministic sign
    flip, project.  The flip follows sklearn's V-based convention
    (``svd_flip(u_based_decision=False)``: per component, the max-|v|
    entry of the right singular vector is made positive) — verified
    bit-for-bit against scikit-learn >= 1.5 in
    tests/test_reference_parity.py.  Older sklearn (< 1.5) used the
    U-based flip, so latents compared against a reference run on an old
    sklearn may be per-component sign-mirrored (a symmetry of the model:
    the NLL and all predictions are invariant)."""
    Y = np.asarray(Y, dtype=np.float64)
    Yc = Y - Y.mean(axis=0, keepdims=True)
    U, S, Vt = np.linalg.svd(Yc, full_matrices=False)
    max_cols = np.argmax(np.abs(Vt), axis=1)
    signs = np.sign(Vt[np.arange(Vt.shape[0]), max_cols])
    signs[signs == 0] = 1.0
    U = U * signs
    return (U[:, :d] * S[:d]).astype(Y.dtype)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def y_neg_log_likelihood(params: GPMDMParams, Y: jax.Array, cfg: GPMDMConfig) -> jax.Array:
    """Observation-map NLL L_y (reference gpmdm.py:550-589):

    ``L_y = D/2 log|K_y| + 1/2 trace(K_y^-1 Y W^2 Y^T) - N log|W^2|``
    with W = diag(exp(y_log_lambdas)).
    """
    N = Y.shape[0]
    Ky = K.y_kernel(
        params.X,
        params.X,
        params.y_log_lengthscales,
        params.y_log_sigma_n,
        cfg.sigma_n_num_Y,
        with_noise=True,
    )
    L = LA.chol_lower(Ky)
    logdet = LA.chol_logdet(L)
    w2 = jnp.exp(params.y_log_lambdas) ** 2
    trace_term = LA.quad_trace(L, Y, w2)
    log_det_W = 2.0 * jnp.sum(params.y_log_lambdas)
    return cfg.D / 2.0 * logdet + 0.5 * trace_term - N * log_det_W


def x_block_terms_deflated(
    Xin_b: jax.Array,
    Xout_b: jax.Array,
    mask: jax.Array | None,
    x_log_lengthscales: jax.Array,
    x_log_sigma_n: jax.Array,
    x_log_lin_coeff: jax.Array,
    w2: jax.Array,
    sigma_n_num: float = 0.0,
):
    """(logdet, quad) of one dynamics class block with the LINEAR kernel
    term deflated out of the Cholesky.

    The dynamics Gram is ``K = K0 + V V^T`` with ``K0 = RBF + noise I``
    (condition bounded by ~N/sigma_n^2 regardless of training drift) and
    ``V = [Xin, 1] diag(exp(x_log_lin_coeff))`` the rank-(din+1) linear
    kernel factor — the term whose growth drives the block's condition to
    the f32 cliff (measured: trained c8n5120 blocks reach cond 6.6e6 with
    diag 12-115x the RBF's unit scale, and the TPU blocked f32 Cholesky
    NaNs there while the equivalent K0 factorization stays at cond ~2e4;
    docs/BENCHMARKS.md round-4 "f32 NaN cliff mechanism").

    So factor ONLY K0 and fold the low-rank term in exactly:

      ``logdet K = logdet K0 + logdet(I + V^T K0^-1 V)``   (det lemma)
      ``quad_j  = ||L0^-1 y_j||^2 - ||Lc^-1 A^T (L0^-1 y_j)||^2``
      with ``A = L0^-1 V``, ``Lc = chol(I + A^T A)``       (Woodbury)

    Mathematically identical to the direct factorization (tested to f64
    round-off) at the same O(n^2 (r + dout)) extra cost over the shared
    O(n^3/3) Cholesky — but every factorized matrix is f32-safe.

    ``mask`` (n,) marks valid rows (1.0) vs zero-padding; padded rows get
    identity K0 rows (logdet contribution 0) and zeroed V/Xout rows.
    """
    n = Xin_b.shape[0]
    K0 = K.rbf_kernel(
        Xin_b, Xin_b, x_log_lengthscales, x_log_sigma_n, sigma_n_num,
        with_noise=True,
    )
    lin_w = jnp.exp(x_log_lin_coeff)
    ones = jnp.ones((n, 1), dtype=Xin_b.dtype)
    V = jnp.concatenate([Xin_b, ones], axis=1) * lin_w
    if mask is not None:
        mm = mask[:, None] * mask[None, :]
        K0 = K0 * mm + jnp.diag(1.0 - mask)
        V = V * mask[:, None]
    L0 = LA.chol_lower(K0)
    A = LA.tri_solve(L0, V)  # (n, r)
    B = LA.tri_solve(L0, Xout_b)  # (n, dout)
    r = V.shape[1]
    Cap = jnp.eye(r, dtype=K0.dtype) + jnp.matmul(A.T, A, precision=_PREC)
    Lc = jnp.linalg.cholesky(Cap)  # r x r, diag >= 1: no jitter needed
    G = LA.tri_solve(Lc, jnp.matmul(A.T, B, precision=_PREC))
    logdet = LA.chol_logdet(L0) + LA.chol_logdet(Lc)
    quad = jnp.sum((jnp.sum(B * B, axis=0) - jnp.sum(G * G, axis=0)) * w2)
    return logdet, quad


def x_neg_log_likelihood(
    params: GPMDMParams, cfg: GPMDMConfig, layout: DataLayout
) -> jax.Array:
    """Dynamics-map NLL L_x (reference gpmdm.py:591-628) via per-class blocks.

    ``L_x = d/2 log|K_x * M| + 1/2 trace((K_x * M)^-1 Xout W^2 Xout^T)
            - Nx log|W^2|``

    ``K_x * M`` is block diagonal in the class-major layout, so both the
    log-determinant and the trace decompose over dense class blocks.
    Each block's linear-kernel term is deflated out of the factorization
    by default (:func:`x_block_terms_deflated`; ``cfg.deflate_x_linear=
    False`` restores the direct Cholesky of the full block).
    """
    Xin, Xout = xin_xout(params.X, layout, cfg.dyn_target)
    w2 = jnp.exp(params.x_log_lambdas) ** 2
    total_logdet = 0.0
    total_trace = 0.0
    for c in range(layout.n_classes):  # static unroll; C is small
        lo, hi = int(layout.x_class_offsets[c]), int(layout.x_class_offsets[c + 1])
        Xin_c = Xin[lo:hi]
        Xout_c = Xout[lo:hi]
        if cfg.deflate_x_linear:
            ld, tr = x_block_terms_deflated(
                Xin_c, Xout_c, None,
                params.x_log_lengthscales, params.x_log_sigma_n,
                params.x_log_lin_coeff, w2, cfg.sigma_n_num_X,
            )
        else:
            Kc = K.x_kernel(
                Xin_c,
                Xin_c,
                params.x_log_lengthscales,
                params.x_log_sigma_n,
                params.x_log_lin_coeff,
                cfg.sigma_n_num_X,
                with_noise=True,
            )
            Lc = LA.chol_lower(Kc)
            ld, tr = LA.chol_logdet(Lc), LA.quad_trace(Lc, Xout_c, w2)
        total_logdet = total_logdet + ld
        total_trace = total_trace + tr
    log_det_W = 2.0 * jnp.sum(params.x_log_lambdas)
    return cfg.d / 2.0 * total_logdet + 0.5 * total_trace - layout.Nx * log_det_W


def x_nll_padded_blocks(
    params: GPMDMParams,
    cfg: GPMDMConfig,
    idx_in: jax.Array,
    idx_prev: jax.Array,
    idx_out: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Per-class dynamics NLL terms from zero-padded class blocks.

    Batched (vmap-over-classes) formulation of
    :func:`x_neg_log_likelihood`'s per-class loop: every class block is
    padded to a common ``n_max`` and factorized with one batched Cholesky —
    a single MXU-friendly kernel, and shardable over the class axis (the
    expert-parallel training path, see gpmdm_tpu.parallel).

    ``idx_*``: (C, n_max) int32 gathers into the Ny axis (x(t), x(t-1),
    x(t+1) of each class's dynamics pairs, 0-padded); ``mask``: (C, n_max)
    1/0 validity.  Padding is exact, not approximate: padded Gram entries
    are replaced by identity rows/cols (log-det contribution 0) and padded
    regression targets are zero (trace contribution 0).

    Returns the (C,) vector of ``d/2 log|K_c| + 1/2 trace(K_c^-1 Xout_c
    W^2 Xout_c^T)``; the caller adds the ``- Nx log|W^2|`` term.
    """
    X = params.X
    x_t = X[idx_in] * mask[:, :, None]  # (C, n_max, d)
    if cfg.dyn_back_step == 1:
        Xin_c = x_t
    else:
        Xin_c = jnp.concatenate([x_t, X[idx_prev] * mask[:, :, None]], axis=2)
    Xout_c = X[idx_out] * mask[:, :, None]
    if cfg.dyn_target == "delta":
        Xout_c = Xout_c - x_t

    def block_terms(Xin_b, Xout_b, m):
        w2 = jnp.exp(params.x_log_lambdas) ** 2
        if cfg.deflate_x_linear:
            return x_block_terms_deflated(
                Xin_b, Xout_b, m,
                params.x_log_lengthscales, params.x_log_sigma_n,
                params.x_log_lin_coeff, w2, cfg.sigma_n_num_X,
            )
        Kb = K.x_kernel(
            Xin_b,
            Xin_b,
            params.x_log_lengthscales,
            params.x_log_sigma_n,
            params.x_log_lin_coeff,
            cfg.sigma_n_num_X,
            with_noise=True,
        )
        mm = m[:, None] * m[None, :]
        Kb = Kb * mm + jnp.diag(1.0 - m)  # identity padding: exact
        Lb = LA.chol_lower(Kb)
        return LA.chol_logdet(Lb), LA.quad_trace(Lb, Xout_b, w2)

    logdets, traces = jax.vmap(block_terms)(Xin_c, Xout_c, mask)
    return cfg.d / 2.0 * logdets + 0.5 * traces


def hyperprior_penalty(params, cfg: GPMDMConfig) -> jax.Array | float:
    """Gaussian log-hyperprior term ``w * sum((log_h - center)^2)``.

    The reference MAP objective has no hyperprior (gpdm_loss,
    gpmdm.py:721-760) — with ``cfg.hyperprior_weight == 0`` (default) this
    is a trace-time 0.0 and the loss is bit-identical to before.  With
    w > 0 it is a log-normal prior on every kernel hyperparameter,
    centered at the ctor init values: the regularizer that keeps the
    large-Ny MAP trajectory out of the measured degeneracies (sigma_n
    sharpening, x_lin_coeff explosion) AND inside the f32 Cholesky
    condition budget (docs/BENCHMARKS.md "Four training findings").
    The latent matrix X is NOT penalized.

    Works for any params family carrying the 7 log-hyper fields
    (GPMDMParams, sparse.SparseParams — inducing inputs unpenalized).

    ``cfg.hyperprior_weights`` (7 per-group weights, same order as the
    centers) overrides the uniform weight where given: the measured NLL
    gradient on sigma_n is ~100x the lengthscale/lambda gradients at
    large Ny, so binding the filter-starving sigma_n drift without
    freezing adaptation elsewhere needs a sigma_n-heavy prior
    (docs/BENCHMARKS.md round-4 sweep).
    """
    ws = cfg.hyperprior_weights
    if ws is None:
        w = cfg.hyperprior_weight
        if w == 0.0:
            return 0.0
        ws = (w,) * 7
    elif all(v == 0.0 for v in ws):
        return 0.0
    c = cfg.hyperprior_centers or cfg._HYPERPRIOR_DEFAULT_CENTERS
    groups = (
        (params.y_log_lengthscales, c[0], ws[0]),
        (params.y_log_lambdas, c[1], ws[1]),
        (params.y_log_sigma_n, c[2], ws[2]),
        (params.x_log_lengthscales, c[3], ws[3]),
        (params.x_log_lambdas, c[4], ws[4]),
        (params.x_log_sigma_n, c[5], ws[5]),
        (params.x_log_lin_coeff, c[6], ws[6]),
    )
    return sum(wi * jnp.sum((g - ci) ** 2) for g, ci, wi in groups if wi)


def nll(
    params: GPMDMParams,
    Y: jax.Array,
    cfg: GPMDMConfig,
    layout: DataLayout,
    balance: float = 1.0,
) -> jax.Array:
    """Total MAP loss L = L_y + balance * L_x (reference gpdm_loss,
    gpmdm.py:721-760), plus the optional log-hyperprior
    (:func:`hyperprior_penalty`, zero at the default config).

    Note: the reference's ``balance`` is silently always 1 due to an argument
    binding bug (its ``train_adam`` passes balance into the unused ``M``
    parameter, gpmdm.py:866).  With ``cfg.balance_fix=False`` we reproduce
    that behavior.
    """
    b = balance if cfg.balance_fix else 1.0
    return (
        y_neg_log_likelihood(params, Y, cfg)
        + b * x_neg_log_likelihood(params, cfg, layout)
        + hyperprior_penalty(params, cfg)
    )


# ---------------------------------------------------------------------------
# Posterior precompute + prediction
# ---------------------------------------------------------------------------


def precompute(
    params: GPMDMParams, Y: jax.Array, cfg: GPMDMConfig, layout: DataLayout
) -> Posterior:
    """Precompute GP posterior state (reference _precompute_kernel_inverses,
    gpmdm.py:1284-1305).

    The reference inverts (i) K_y, (ii) the masked Gram ``K_x * M``, and
    (iii) per class ``K_x * M_c + 1e-6 I``.  Because masked star-kernels zero
    every row outside class c (gpmdm.py:1061), predictions only ever touch
    the dense class sub-block of (iii); we therefore invert
    ``K_c + jitter I`` per class and zero-pad — identical predictions, far
    better conditioned than inverting a matrix that is ~1e-6 I off-block.
    """
    dt = jnp.dtype(cfg.dtype)
    X = params.X
    Ky = K.y_kernel(
        X, X, params.y_log_lengthscales, params.y_log_sigma_n, cfg.sigma_n_num_Y, with_noise=True
    )
    Ly = LA.chol_lower(Ky)
    Ky_inv = LA.chol_inverse(Ly)
    Ay = LA.chol_solve(Ly, Y.astype(dt))

    Xin, Xout = xin_xout(X, layout, cfg.dyn_target)

    C, n_max = layout.n_classes, layout.n_max
    din = Xin.shape[1]
    Xin_c = jnp.zeros((C, n_max, din), dtype=dt)
    Kxc_inv = jnp.zeros((C, n_max, n_max), dtype=dt)
    Axc = jnp.zeros((C, n_max, cfg.d), dtype=dt)
    Kx_inv = jnp.zeros((layout.Nx, layout.Nx), dtype=dt)
    mask_c = jnp.asarray(layout.class_pair_mask, dtype=dt)

    for c in range(C):  # static unroll
        lo, hi = int(layout.x_class_offsets[c]), int(layout.x_class_offsets[c + 1])
        n_c = hi - lo
        Xin_blk = Xin[lo:hi]
        Kc = K.x_kernel(
            Xin_blk,
            Xin_blk,
            params.x_log_lengthscales,
            params.x_log_sigma_n,
            params.x_log_lin_coeff,
            cfg.sigma_n_num_X,
            with_noise=True,
        )
        # Full (all-class) inverse: block-diagonal inverse of K_x * M, no
        # extra jitter (reference gpmdm.py:1291-1295).
        Lc = LA.chol_lower(Kc)
        Kx_inv = Kx_inv.at[lo:hi, lo:hi].set(LA.chol_inverse(Lc))
        # Per-class inverse with jitter (reference gpmdm.py:1297-1305).
        Lcj = LA.chol_lower(Kc, jitter=cfg.class_jitter)
        inv_c = LA.chol_inverse(Lcj)
        Xin_c = Xin_c.at[c, :n_c].set(Xin_blk)
        Kxc_inv = Kxc_inv.at[c, :n_c, :n_c].set(inv_c)
        Axc = Axc.at[c, :n_c].set(LA.chol_solve(Lcj, Xout[lo:hi]))

    Ax = jnp.matmul(Kx_inv, Xout, precision=_PREC)
    return Posterior(
        X=X,
        Y=Y.astype(dt),
        Ky_inv=Ky_inv,
        Ay=Ay,
        Xin=Xin,
        Xout=Xout,
        Kx_inv=Kx_inv,
        Ax=Ax,
        Xin_c=Xin_c,
        mask_c=mask_c,
        Kxc_inv=Kxc_inv,
        Axc=Axc,
    )


def precompute_host(
    params: GPMDMParams, Y, cfg: GPMDMConfig, layout: DataLayout
) -> Posterior:
    """Posterior precompute on the HOST in float64, cast to the model dtype.

    Trained GPMDM Gram matrices routinely reach condition numbers ~1e7
    (the linear dynamics kernel piles O(100) onto the diagonal while the
    trained noise is ~1e-3): right at the f32 Cholesky cliff.  Observed on
    TPU: the f32 factorization of a trained model's per-class dynamics
    Gram goes NaN (while the same matrix squeaks through LAPACK on CPU).
    The inverses are computed once per posterior refresh, so doing them in
    f64 numpy costs nothing and makes the low-precision *deployment* of
    the posterior stable — factor high, deploy low.

    Numerically equivalent to :func:`precompute` (same math; f64
    intermediate).
    """
    from ..ops import kernels_host as KH

    f64 = KH.f64
    # fetch every device leaf in ONE transfer: per-leaf fetches cost a
    # large fixed round trip on the remote-TPU transport (KH.fetch_tree)
    params, Y = KH.fetch_tree((params, Y))
    X = f64(params.X)
    Y64 = f64(Y)
    y_ls = np.exp(f64(params.y_log_lengthscales))
    y_sn2 = float(np.exp(f64(params.y_log_sigma_n))) ** 2 + cfg.sigma_n_num_Y**2
    x_ls = np.exp(f64(params.x_log_lengthscales))
    x_sn2 = float(np.exp(f64(params.x_log_sigma_n))) ** 2 + cfg.sigma_n_num_X**2
    x_lw = np.exp(f64(params.x_log_lin_coeff)) ** 2

    def xker(A, B):
        return KH.x_kernel(A, B, x_ls, x_lw)

    Ky = KH.rbf(X, X, y_ls) + y_sn2 * np.eye(X.shape[0])
    Ky_inv = np.linalg.inv(Ky)
    Ay = np.linalg.solve(Ky, Y64)

    x_t = X[layout.xin_idx]
    Xin = x_t if layout.back_step == 1 else np.concatenate(
        [x_t, X[layout.xin_prev_idx]], axis=1
    )
    Xout = X[layout.xout_idx]
    if cfg.dyn_target == "delta":
        Xout = Xout - x_t

    C, n_max = layout.n_classes, layout.n_max
    din = Xin.shape[1]
    Xin_c = np.zeros((C, n_max, din))
    Kxc_inv = np.zeros((C, n_max, n_max))
    Axc = np.zeros((C, n_max, cfg.d))
    Kx_inv = np.zeros((layout.Nx, layout.Nx))
    for c in range(C):
        lo, hi = int(layout.x_class_offsets[c]), int(layout.x_class_offsets[c + 1])
        n_c = hi - lo
        blk = Xin[lo:hi]
        Kc = xker(blk, blk) + x_sn2 * np.eye(n_c)
        Kx_inv[lo:hi, lo:hi] = np.linalg.inv(Kc)
        Kcj = Kc + cfg.class_jitter * np.eye(n_c)
        Kxc_inv[c, :n_c, :n_c] = np.linalg.inv(Kcj)
        Xin_c[c, :n_c] = blk
        Axc[c, :n_c] = np.linalg.solve(Kcj, Xout[lo:hi])
    Ax = Kx_inv @ Xout

    def cast(a):
        # cast to the TRUE model dtype (incl. bfloat16 — np_dtype would
        # silently widen bf16 models to f32)
        return jnp.asarray(np.asarray(a, dtype=np.float64), dtype=jnp.dtype(cfg.dtype))

    return Posterior(
        X=cast(X),
        Y=cast(Y64),
        Ky_inv=cast(Ky_inv),
        Ay=cast(Ay),
        Xin=cast(Xin),
        Xout=cast(Xout),
        Kx_inv=cast(Kx_inv),
        Ax=cast(Ax),
        Xin_c=cast(Xin_c),
        mask_c=jnp.asarray(layout.class_pair_mask, dtype=jnp.dtype(cfg.dtype)),
        Kxc_inv=cast(Kxc_inv),
        Axc=cast(Axc),
    )


def predict_y(
    post: Posterior,
    params: GPMDMParams,
    Xstar: jax.Array,
    cfg: GPMDMConfig,
    with_noise: bool = False,
    precision=_PREC,
    quad_precision=None,
    recon_precision=None,
    fused: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Latent -> observation GP posterior (reference map_x_to_y,
    gpmdm.py:923-963).  ``recon_precision`` is accepted for interface
    parity with the compressed backend and ignored (the exact quad has no
    reconstruction matmul).  ``fused`` selects the single-matmul
    mean+quad grouping (None -> auto: fuse iff n_classes <= 2, the
    measured win region — see the branch comment below).

    Returns mean (N*, D) and per-dimension variance (N*, D) where the common
    variance is scaled by exp(y_log_lambdas)^-2 per output dimension.
    ``precision`` tunes the MXU pass count: HIGHEST for training-grade
    accuracy, HIGH/DEFAULT for the particle-filter hot path.
    ``quad_precision`` (None -> ``precision``) separately tunes the
    variance-quad matmul Kinv @ Kstar — errors there perturb only the
    predictive variance, so it tolerates a lower pass count than the
    star-kernel/mean path.
    """
    if quad_precision is None:
        quad_precision = precision
    if fused is None:
        fused = cfg.n_classes <= 2
    Kstar = K.rbf_kernel(
        post.X, Xstar, params.y_log_lengthscales, precision=precision
    )  # (Ny, N*)
    if fused and quad_precision == precision:
        # Fused mean+quad: one MXU call computes both products against the
        # same star kernel — [Ay^T; Ky_inv] @ Kstar — saving an HBM pass
        # over Kstar and folding the mean rows into sublane padding the
        # quad matmul already pays.  The win is CONFIG-DEPENDENT
        # (tools/exp_fused_mean_quad.py, one v5e, P=10k): headline C=2
        # Ny=480 both-GPs-fused +4.3% fps at bit-identical variances, but
        # the C=8 Ny=960 asset loses 23% whenever the per-class x-GP is
        # fused (the (C, d+n, n) lhs breaks XLA's batched-einsum tiling),
        # hence the n_classes <= 2 auto gate.  The concatenation is
        # loop-invariant, so XLA hoists it out of scans.
        D = post.Ay.shape[1]
        lhs = jnp.concatenate([post.Ay.T, post.Ky_inv], axis=0)  # (D+Ny, Ny)
        out = jnp.matmul(lhs, Kstar, precision=precision)  # (D+Ny, N*)
        mean = out[:D].T
        KiK = out[D:]
    else:
        # split-precision opt-in (PFConfig.quad_precision): keep the mean
        # at full precision and only cheapen the variance quad
        mean = jnp.matmul(Kstar.T, post.Ay, precision=precision)  # (N*, D)
        KiK = jnp.matmul(post.Ky_inv, Kstar, precision=quad_precision)  # (Ny, N*)
    diag_common = K.y_diag_kernel(
        Xstar, params.y_log_sigma_n, cfg.sigma_n_num_Y, with_noise
    ) - jnp.sum(Kstar * KiK, axis=0)
    # the subtraction can go slightly negative in f32 near training points;
    # a negative predictive variance is never meaningful
    diag_common = jnp.maximum(diag_common, 1e-9)
    var = diag_common[:, None] * jnp.exp(params.y_log_lambdas)[None, :] ** -2
    return mean, var


def predict_x(
    post: Posterior, params: GPMDMParams, Xstar: jax.Array, cfg: GPMDMConfig, with_noise: bool = False
) -> tuple[jax.Array, jax.Array]:
    """All-class dynamics GP posterior (reference map_x_dynamics,
    gpmdm.py:993-1030)."""
    Kstar = K.x_kernel(
        post.Xin,
        Xstar,
        params.x_log_lengthscales,
        params.x_log_sigma_n,
        params.x_log_lin_coeff,
        with_noise=False,
    )  # (Nx, N*)
    mean = jnp.matmul(Kstar.T, post.Ax, precision=_PREC)
    KiK = jnp.matmul(post.Kx_inv, Kstar, precision=_PREC)
    diag_common = jnp.maximum(
        K.x_diag_kernel(
            Xstar, params.x_log_lin_coeff, params.x_log_sigma_n, cfg.sigma_n_num_X, with_noise
        )
        - jnp.sum(Kstar * KiK, axis=0),
        1e-9,
    )
    var = diag_common[:, None] * jnp.exp(params.x_log_lambdas)[None, :] ** -2
    return mean, var


def predict_x_all_classes(
    post: Posterior,
    params: GPMDMParams,
    Xstar: jax.Array,
    cfg: GPMDMConfig,
    with_noise: bool = False,
    precision=_PREC,
    quad_precision=None,
    recon_precision=None,
    fused: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-class dynamics GP posterior for *every* class at once.

    Batched-over-classes version of the reference's
    ``map_x_dynamics_for_class`` (gpmdm.py:1032-1068): one einsum on the MXU
    replaces the per-class Python loop, and consumers select the relevant
    class per query point (the expert-parallel pattern used by the particle
    filter).  ``quad_precision`` (None -> ``precision``) and ``fused``
    (None -> fuse iff n_classes <= 2): see predict_y.

    Returns means (C, N*, d) and variances (C, N*, d).
    """
    if quad_precision is None:
        quad_precision = precision
    if fused is None:
        fused = cfg.n_classes <= 2
    # Star kernel against every class's padded training inputs: (C, n_max, N*)
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
    kst = kst * post.mask_c[:, :, None]  # zero padded rows (masked star kernel)
    if fused and quad_precision == precision:
        # fused mean+quad per class (see predict_y): [Axc^T; Kxc_inv] @ kst
        d = post.Axc.shape[2]
        lhs = jnp.concatenate(
            [jnp.swapaxes(post.Axc, 1, 2), post.Kxc_inv], axis=1
        )  # (C, d+n_max, n_max)
        out = jnp.einsum("cmn,cnp->cmp", lhs, kst, precision=precision)
        mean = jnp.swapaxes(out[:, :d], 1, 2)  # (C, N*, d)
        KiK = out[:, d:]  # (C, n_max, N*)
    else:
        mean = jnp.einsum("cnp,cnd->cpd", kst, post.Axc, precision=precision)
        KiK = jnp.einsum("cnm,cmp->cnp", post.Kxc_inv, kst, precision=quad_precision)
    diag_star = K.x_diag_kernel(
        Xstar, params.x_log_lin_coeff, params.x_log_sigma_n, cfg.sigma_n_num_X, with_noise
    )  # (N*,)
    diag_common = jnp.maximum(
        diag_star[None, :] - jnp.sum(kst * KiK, axis=1), 1e-9
    )  # (C, N*)
    var = diag_common[:, :, None] * jnp.exp(params.x_log_lambdas)[None, None, :] ** -2
    return mean, var


def predict_x_for_class(
    post: Posterior,
    params: GPMDMParams,
    Xstar: jax.Array,
    class_index: int,
    cfg: GPMDMConfig,
    with_noise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Single-class dynamics posterior (reference map_x_dynamics_for_class,
    gpmdm.py:1032-1068)."""
    mean, var = predict_x_all_classes(post, params, Xstar, cfg, with_noise)
    return mean[class_index], var[class_index]


def next_x(
    mean: jax.Array,
    var: jax.Array,
    Xold: jax.Array,
    cfg: GPMDMConfig,
    sample: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Turn a dynamics-GP output into the next latent state (reference
    get_next_x, gpmdm.py:1103-1145): 'full' returns the prediction, 'delta'
    adds it to the current state; optionally sample from the Gaussian."""
    if sample:
        out = mean + jnp.sqrt(var) * jax.random.normal(key, mean.shape, dtype=mean.dtype)
    else:
        out = mean
    if cfg.dyn_target == "delta":
        out = Xold + out
    return out


def rollout(
    post: Posterior,
    params: GPMDMParams,
    x0: jax.Array,
    n_steps: int,
    class_index: int,
    cfg: GPMDMConfig,
    sample: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Autoregressive latent rollout under one class's dynamics
    (library-level version of the reference notebook loop,
    train_gpmdm.ipynb cell 8), as a single ``lax.scan``.

    x0: (d,) (back_step=1) or (2, d) [x(t), x(t-1)] (back_step=2).
    Returns the (n_steps, d) trajectory of x(t+1..t+n_steps).
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    if cfg.dyn_back_step == 1:
        def step(carry, k):
            x = carry  # (d,)
            mean, var = predict_x_for_class(post, params, x[None, :], class_index, cfg)
            xn = next_x(mean[0], var[0], x, cfg, sample, k)
            return xn, xn

        _, traj = jax.lax.scan(step, x0, jax.random.split(key, n_steps))
    else:
        def step(carry, k):
            x_t, x_tm1 = carry  # each (d,)
            xin = jnp.concatenate([x_t, x_tm1])[None, :]
            mean, var = predict_x_for_class(post, params, xin, class_index, cfg)
            xn = next_x(mean[0], var[0], x_t, cfg, sample, k)
            return (xn, x_t), xn

        _, traj = jax.lax.scan(step, (x0[0], x0[1]), jax.random.split(key, n_steps))
    return traj


# ---------------------------------------------------------------------------
# Diagnostics
# ---------------------------------------------------------------------------


def latent_map_nmse(
    post: Posterior,
    params: GPMDMParams,
    cfg: GPMDMConfig,
    Xstar: jax.Array,
    Y_true: jax.Array,
    with_noise: bool = False,
    floored: bool = False,
) -> jax.Array:
    """Mean squared z-score of the latent->observation map (reference
    get_latent_map_performance, gpmdm.py:1199-1273).  The reference uses
    floor division ``//`` (a quirk, gpmdm.py:1235); ``floored=True``
    reproduces it, default is true division."""
    mean, var = predict_y(post, params, Xstar, cfg, with_noise)
    z2 = (Y_true - mean) ** 2 / var
    if floored:
        z2 = jnp.floor(z2)
    return jnp.mean(z2)


def dynamics_map_nmse_for_class(
    post: Posterior,
    params: GPMDMParams,
    cfg: GPMDMConfig,
    class_index: int,
    with_noise: bool = False,
    floored: bool = False,
) -> jax.Array:
    """Mean squared z-score of the per-class dynamics map on training pairs
    (reference get_dynamics_map_performance_for_class, gpmdm.py:1147-1196)."""
    mean, var = predict_x_for_class(post, params, post.Xin, class_index, cfg, with_noise)
    z2 = (post.Xout - mean) ** 2 / var
    if floored:
        z2 = jnp.floor(z2)
    return jnp.mean(z2)
