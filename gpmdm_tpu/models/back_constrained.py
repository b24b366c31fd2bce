"""Back-constrained GPMDM: smooth observation -> latent inverse mapping.

Model-family extension beyond the reference (its latent matrix X is a free
parameter, gpmdm.py:773).  The back-constraint (Lawrence &
Quinonero-Candela, "Local distance preservation in the GP-LVM through back
constraints", 2006) parameterizes

    X = K_b @ W,     K_b = k_rbf(Y, Y; l_b)   (fixed, data-dependent),

and trains W (Ny, d) instead of X.  Consequences:

- observations that are close in Y-space are forced to stay close in
  latent space (the free-X MAP objective only pulls the other way),
- a NEW observation can be projected into latent space directly:
  ``map_y_to_x(y*) = k_rbf(y*, Y) @ W`` — used to warm-start the particle
  filter near the right manifold region instead of sampling blind.

TPU notes: K_b is a loop-invariant (Ny, Ny) constant inside the training
scan, so XLA hoists its construction out of the per-step loss; the only
per-step extra over the exact model is one (Ny, Ny) x (Ny, d) matmul.
The optimizer state reuses the GPMDMParams pytree with W riding in the X
slot (same shape), so the whole trainer stack (masks, checkpoints, NaN
guards) applies unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GPMDMConfig
from ..ops import kernels as K
from . import core
from .gpmdm import GPMDM


def back_kernel(Y1, Y2, back_ls: float, dtype) -> jax.Array:
    """ROW-NORMALIZED RBF kernel over observation space (Nadaraya-Watson
    weights).  Normalization is load-bearing: the raw Gram's top eigenvalue
    grows ~O(n_neighbors) (measured 291 at Ny=640), which multiplies into
    every gradient step on W and blew training up at f32; the normalized
    map has spectral norm <= 1, so steps on W move X at the intended
    scale."""
    D = Y1.shape[1]
    log_ls = jnp.full((D,), jnp.log(jnp.asarray(back_ls, dtype=dtype)))
    Kb = K.rbf_kernel(
        jnp.asarray(Y1, dtype=dtype), jnp.asarray(Y2, dtype=dtype), log_ls
    )
    return Kb / jnp.sum(Kb, axis=1, keepdims=True)


def bc_nll(params, Y, cfg: GPMDMConfig, layout, balance: float = 1.0):
    """MAP loss of the back-constrained model.

    ``params.X`` holds W; the effective latent matrix is K_b @ W.  All
    other terms are the exact-model loss (core.nll).
    """
    Kb = back_kernel(Y, Y, cfg.back_constraint_ls, Y.dtype)
    X = jnp.matmul(Kb, params.X, precision=jax.lax.Precision.HIGHEST)
    return core.nll(dataclasses.replace(params, X=X), Y, cfg, layout, balance)


def median_lengthscale(Y: np.ndarray) -> float:
    """Median-pairwise-distance heuristic for the back-kernel lengthscale
    (subsampled for large Ny)."""
    Y = np.asarray(Y, dtype=np.float64)
    n = len(Y)
    idx = np.random.default_rng(0).permutation(n)[: min(n, 512)]
    S = Y[idx]
    d2 = np.sum((S[:, None, :] - S[None, :, :]) ** 2, axis=-1)
    med = np.median(d2[np.triu_indices(len(S), k=1)])
    return float(np.sqrt(max(med, 1e-12)))


class BCGPMDM(GPMDM):
    """GPMDM with back-constrained latents (same public surface as GPMDM,
    plus ``map_y_to_x``)."""

    def __init__(self, *args, back_lengthscale: float | None = None,
                 back_ridge: float = 1e-4, **kwargs):
        super().__init__(*args, **kwargs)
        self._back_ls_arg = back_lengthscale
        self._back_ridge = float(back_ridge)
        self._W: jax.Array | None = None

    # -------------------------------------------------------------- init

    def init_X(self) -> None:
        """PCA init projected through the back-constraint: W0 solves
        (K_b + ridge I) W = X_pca so the initial latents match the exact
        model's PCA init as closely as the constraint allows."""
        super().init_X()  # sets layout, params with X = PCA init
        Y = np.asarray(self.get_Y(), dtype=np.float64)
        ls = (
            float(self._back_ls_arg)
            if self._back_ls_arg is not None
            else median_lengthscale(Y)
        )
        self.config = self.config.replace(back_constraint_ls=ls)
        Kb = np.asarray(back_kernel(Y, Y, ls, jnp.float64), dtype=np.float64)
        X0 = np.asarray(self.params.X, dtype=np.float64)
        W0, *_ = np.linalg.lstsq(
            Kb + self._back_ridge * np.eye(len(Kb)), X0, rcond=None
        )
        self._W = jnp.asarray(W0, dtype=self.dtype)
        self._materialize()

    def _materialize(self) -> None:
        """params.X <- K_b @ W (everything downstream — posterior, PF,
        losses, plots — sees the effective latents)."""
        Y = jnp.asarray(self.get_Y(), dtype=self.dtype)
        Kb = back_kernel(Y, Y, self.config.back_constraint_ls, self.dtype)
        X = jnp.matmul(Kb, self._W, precision=jax.lax.Precision.HIGHEST)
        self.params = dataclasses.replace(self.params, X=X)
        self._precompute_kernel_inverses()

    # ---------------------------------------------------------- training

    def train_adam(self, num_opt_steps, num_print_steps=0, lr=0.01,
                   balance=1.0, logger=None, optimizer="adam"):
        from ..config import TrainConfig
        from ..train.trainer import train_adam as _train

        self._require_init()
        mode = self._training_mode or "all"
        tc = TrainConfig(num_steps=num_opt_steps, lr=lr, balance=balance,
                         print_every=num_print_steps, optimizer=optimizer)
        if optimizer != getattr(self, "_opt_name", "adam"):
            self._opt_state = None
        self._opt_name = optimizer
        self._lbfgs_memory = tc.lbfgs_memory

        def log(step, loss, t):
            print(f"BC-GPDM Opt. step {step}: loss {loss:.4e}  ({t:.1f}s)")

        params_w = dataclasses.replace(self.params, X=self._W)
        result = _train(
            params_w,
            self.get_Y(),
            self.config,
            self.layout,
            tc,
            mode=mode,
            opt_state=self._opt_state,
            log_fn=log if num_print_steps else None,
            kind="bc",
            logger=logger,
        )
        self._W = result.params.X
        self.params = dataclasses.replace(result.params, X=self.params.X)
        self._opt_state = result.opt_state
        self._materialize()
        return [float(l) for l in result.losses]

    def gpdm_loss(self, balance: float = 1.0) -> float:
        """MAP loss at the current parameters (through the constraint)."""
        self._require_init()
        Y = jnp.asarray(self.get_Y(), dtype=self.dtype)
        params_w = dataclasses.replace(self.params, X=self._W)
        return float(bc_nll(params_w, Y, self.config, self.layout, balance))

    # ------------------------------------------------------- persistence

    def _params_for_save(self):
        """Persist W in the X slot; load rematerializes X = K_b @ W from the
        saved observations + config lengthscale (utils/io.py)."""
        return dataclasses.replace(self.params, X=self._W)

    # --------------------------------------------------------- inference

    def map_y_to_x(self, Ystar) -> jax.Array:
        """Project observations into latent space through the learned
        back-constraint: k_rbf(y*, Y_train) @ W.  No counterpart exists in
        the reference or the unconstrained model (free X has no inverse
        map)."""
        self._require_init()
        Ystar = jnp.atleast_2d(jnp.asarray(Ystar, dtype=self.dtype))
        Kb = back_kernel(
            Ystar, jnp.asarray(self.get_Y(), dtype=self.dtype),
            self.config.back_constraint_ls, self.dtype,
        )
        return jnp.matmul(Kb, self._W, precision=jax.lax.Precision.HIGHEST)
