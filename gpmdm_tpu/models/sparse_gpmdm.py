"""User-facing sparse GPMDM: the GPMDM API backed by inducing-point GPs.

Drop-in replacement for :class:`gpmdm_tpu.GPMDM` on long datasets: same
``add_data`` / ``init_X`` / ``train_adam`` / ``map_*`` / save/load surface,
O(N M^2) training instead of O(N^3) (see :mod:`gpmdm_tpu.models.sparse` for
the math).  The particle filter accepts either model transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import core, sparse
from .gpmdm import GPMDM

_jit_sparse_precompute = jax.jit(sparse.precompute, static_argnames=("cfg", "layout"))
_jit_sparse_nll = jax.jit(sparse.sparse_nll, static_argnames=("cfg", "layout"))
_jit_sparse_predict_y = jax.jit(sparse.predict_y, static_argnames=("cfg", "with_noise"))
_jit_sparse_predict_x_for_class = jax.jit(
    sparse.predict_x_for_class, static_argnames=("class_index", "cfg", "with_noise")
)
_jit_sparse_predict_x = jax.jit(
    sparse.predict_x, static_argnames=("cfg", "with_noise")
)


class SparseGPMDM(GPMDM):
    """GPMDM with sparse (inducing-point) observation and dynamics GPs.

    Extra constructor arguments: ``n_inducing_y`` (observation-GP inducing
    inputs) and ``n_inducing_x`` (per-class dynamics-GP inducing inputs).
    Inducing inputs are free parameters, initialized to an even-stride
    subset of the PCA latent init and trained jointly with everything else.
    """

    #: The sparse posterior deploys as-is in the filter — the auto policy
    #: never swaps it for a compressed exact quad (see GPMDM).
    _deploys_core_posterior = False

    def __init__(self, *args, n_inducing_y: int = 64, n_inducing_x: int = 64, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_inducing_y = int(n_inducing_y)
        self.n_inducing_x = int(n_inducing_x)

    # ----------------------------------------------------------------- init

    def init_X(self) -> None:
        self.layout = self._build_layout()
        Y = self.get_Y()
        X0 = core.pca_init_x(Y, self.config.d)
        h = self._init_hypers
        base = core.init_params(
            self.config,
            h["y_lengthscales_init"],
            h["y_lambdas_init"],
            h["y_sigma_n_init"],
            h["x_lengthscales_init"],
            h["x_lambdas_init"],
            h["x_sigma_n_init"],
            h["x_lin_coeff_init"],
            X0=X0,
        )
        Zy, Zx = sparse.init_inducing(
            np.asarray(X0, dtype=np.float64),
            self.layout,
            self.config,
            self.n_inducing_y,
            self.n_inducing_x,
        )
        import dataclasses as dc

        dt = self.dtype
        self.params = sparse.SparseParams(
            **{f.name: getattr(base, f.name) for f in dc.fields(base)},
            Zy=jnp.asarray(Zy, dtype=dt),
            Zx=jnp.asarray(Zx, dtype=dt),
        )
        self._opt_state = None
        self._precompute_kernel_inverses()

    def _precompute_kernel_inverses(self, host_params=None, lazy=False) -> None:
        # host f64 factorization, cast to model dtype (see
        # sparse.precompute_host / core.precompute_host rationale);
        # host_params avoids the device->host fetch on checkpoint load.
        # ``lazy`` is accepted for signature parity with GPMDM but the
        # sparse precompute is O(N M^2) — cheap enough to run eagerly.
        del lazy
        self._require_init()
        self.posterior = sparse.precompute_host(
            host_params if host_params is not None else self.params,
            self.get_Y(), self.config, self.layout,
        )

    # ------------------------------------------------------------- training

    def gpdm_loss(self, balance: float = 1.0) -> float:
        self._require_init()
        Y = jnp.asarray(self.get_Y(), dtype=self.dtype)
        return float(
            _jit_sparse_nll(
                self.params, Y, cfg=self.config, layout=self.layout, balance=balance
            )
        )

    def train_adam(self, num_opt_steps, num_print_steps=0, lr=0.01, balance=1.0,
                   logger=None, optimizer="adam"):
        from ..config import TrainConfig
        from ..train.trainer import train_adam as _train

        self._require_init()
        mode = self._training_mode or "all"
        tc = TrainConfig(
            num_steps=num_opt_steps, lr=lr, balance=balance,
            print_every=num_print_steps, optimizer=optimizer,
        )
        if optimizer != getattr(self, "_opt_name", "adam"):
            self._opt_state = None
        self._opt_name = optimizer
        self._lbfgs_memory = tc.lbfgs_memory

        def log(step, loss, t):
            print(f"Sparse GPDM Opt. step {step}: loss {loss:.4e}  ({t:.1f}s)")

        result = _train(
            self.params,
            self.get_Y(),
            self.config,
            self.layout,
            tc,
            mode=mode,
            opt_state=self._opt_state,
            log_fn=log if num_print_steps else None,
            kind="sparse",
            logger=logger,
        )
        self.params = result.params
        self._opt_state = result.opt_state
        self._precompute_kernel_inverses()
        return [float(l) for l in result.losses]

    # ----------------------------------------------------------- prediction

    def map_x_to_y(self, Xstar, flg_noise: bool = False):
        self._require_posterior()
        Xstar = jnp.atleast_2d(jnp.asarray(Xstar, dtype=self.dtype))
        return _jit_sparse_predict_y(
            self.posterior, self.params, Xstar, cfg=self.config, with_noise=flg_noise
        )

    def map_x_dynamics(self, Xstar, flg_noise: bool = False):
        """All-class dynamics posterior (reference map_x_dynamics,
        gpmdm.py:993-1030), as the class-additive sparse analogue — the
        exact model's block-diagonal masked Gram makes the all-class map
        a sum of per-class posteriors; here each class's inducing set
        stands in for its training block (see sparse.predict_x)."""
        self._require_posterior()
        Xstar = jnp.atleast_2d(jnp.asarray(Xstar, dtype=self.dtype))
        return _jit_sparse_predict_x(
            self.posterior, self.params, Xstar, cfg=self.config, with_noise=flg_noise
        )

    def map_x_dynamics_for_class(self, Xstar, class_index: int, flg_noise: bool = False):
        self._require_posterior()
        Xstar = jnp.atleast_2d(jnp.asarray(Xstar, dtype=self.dtype))
        return _jit_sparse_predict_x_for_class(
            self.posterior,
            self.params,
            Xstar,
            class_index=class_index,
            cfg=self.config,
            with_noise=flg_noise,
        )

    def rollout(self, x0, n_steps: int, class_index: int, sample: bool = False, key=None):
        """Autoregressive latent rollout under one class's sparse dynamics."""
        self._require_posterior()
        if key is None:
            key = jax.random.PRNGKey(0)
        x0 = jnp.asarray(x0, dtype=self.dtype)
        cfg, post, params = self.config, self.posterior, self.params

        def step(carry, k):
            if cfg.dyn_back_step == 1:
                x = carry
                xin = x[None, :]
            else:
                x, x_prev = carry
                xin = jnp.concatenate([x, x_prev])[None, :]
            mean, var = sparse.predict_x_for_class(post, params, xin, class_index, cfg)
            xn = core.next_x(mean[0], var[0], x, cfg, sample, k)
            new_carry = xn if cfg.dyn_back_step == 1 else (xn, x)
            return new_carry, xn

        carry0 = x0 if cfg.dyn_back_step == 1 else (x0[0], x0[1])
        _, traj = jax.lax.scan(step, carry0, jax.random.split(key, n_steps))
        return traj

    # --------------------------------------------------------- diagnostics

    def get_latent_map_performance(self, flg_noise: bool = False, floored: bool = False):
        self._require_posterior()
        Y = jnp.asarray(self.get_Y(), dtype=self.dtype)
        mean, var = self.map_x_to_y(self.params.X, flg_noise)
        z2 = (Y - mean) ** 2 / var
        if floored:
            z2 = jnp.floor(z2)
        return np.asarray(mean), np.asarray(var), np.asarray(Y), float(jnp.mean(z2))

    def get_dynamics_map_performance_for_class(
        self, class_index: int, flg_noise: bool = False, floored: bool = False
    ):
        from ..ops.layout import xin_xout

        self._require_posterior()
        Xin, Xout = xin_xout(self.params.X, self.layout, self.config.dyn_target)
        lo = int(self.layout.x_class_offsets[class_index])
        hi = int(self.layout.x_class_offsets[class_index + 1])
        Xin_c, Xout_c = Xin[lo:hi], Xout[lo:hi]
        mean, var = self.map_x_dynamics_for_class(Xin_c, class_index, flg_noise)
        z2 = (Xout_c - mean) ** 2 / var
        if floored:
            z2 = jnp.floor(z2)
        return (
            np.asarray(mean),
            np.asarray(var),
            np.asarray(Xout_c),
            np.asarray(Xin_c),
            float(jnp.mean(z2)),
        )
