"""User-facing GPMDM model: a thin stateful wrapper over the functional core.

API-parity layer for users of the reference ``GPMDM`` class
(`/root/reference/gpmdm/gpmdm.py:18`): the same constructor schema, the same
method names (``add_data``, ``init_X``, ``train_adam``, ``map_x_to_y``,
``map_x_dynamics``, ``map_x_dynamics_for_class``, ``get_next_x``, ``save`` /
``load``, performance diagnostics), backed by jitted JAX computations from
:mod:`gpmdm_tpu.models.core`.

State management is explicit: observations are accumulated on the host;
``init_X`` freezes the data layout and creates the parameter pytree; training
and prediction run as pure jitted functions over that state.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GPMDMConfig, TrainConfig
from ..ops.layout import DataLayout, build_layout
from . import core

# Module-level jit wrappers: one persistent compilation cache per function
# (a fresh jax.jit per call would retrace every time).
_jit_precompute = jax.jit(core.precompute, static_argnames=("cfg", "layout"))
_jit_nll = jax.jit(core.nll, static_argnames=("cfg", "layout"))
_jit_predict_y = jax.jit(core.predict_y, static_argnames=("cfg", "with_noise"))
_jit_predict_x = jax.jit(core.predict_x, static_argnames=("cfg", "with_noise"))
_jit_predict_x_for_class = jax.jit(
    core.predict_x_for_class, static_argnames=("class_index", "cfg", "with_noise")
)


class GPMDM:
    """Gaussian Process Multi-Dynamical Model.

    Learns a shared latent space for all classes (one observation GP) and an
    independent dynamics GP per class, trained jointly by MAP.  See
    reference gpmdm.py:18-95 for the model description.
    """

    def __init__(
        self,
        D: int,
        d: int,
        n_classes: int,
        dyn_target: str = "full",
        dyn_back_step: int = 1,
        y_lambdas_init=1.0,
        y_lengthscales_init=1.0,
        y_sigma_n_init: float = 1e-2,
        x_lambdas_init=1.0,
        x_lengthscales_init=1.0,
        x_sigma_n_init: float = 1e-2,
        x_lin_coeff_init=1.0,
        flg_train_y_lambdas: bool = True,
        flg_train_y_lengthscales: bool = True,
        flg_train_y_sigma_n: bool = True,
        flg_train_x_lambdas: bool = True,
        flg_train_x_lengthscales: bool = True,
        flg_train_x_sigma_n: bool = True,
        flg_train_x_lin_coeff: bool = True,
        sigma_n_num_Y: float = 0.0,
        sigma_n_num_X: float = 0.0,
        dtype: str = "float32",
        balance_fix: bool = True,
        hyperprior_weight: float = 0.0,
        hyperprior_weights=None,
    ):
        # Log-space hyperprior centers = the init values (scalar per
        # group; array inits contribute their log-mean).  Computed
        # unconditionally so flipping hyperprior_weight on later (e.g.
        # via config.replace) keeps the intended centers.
        def _logc(v):
            return float(np.mean(np.log(np.asarray(v, dtype=np.float64))))

        hyperprior_centers = (
            _logc(y_lengthscales_init), _logc(y_lambdas_init),
            _logc(y_sigma_n_init), _logc(x_lengthscales_init),
            _logc(x_lambdas_init), _logc(x_sigma_n_init),
            _logc(x_lin_coeff_init),
        )
        self.config = GPMDMConfig(
            D=D,
            d=d,
            n_classes=n_classes,
            dyn_target=dyn_target,
            dyn_back_step=dyn_back_step,
            sigma_n_num_Y=sigma_n_num_Y,
            sigma_n_num_X=sigma_n_num_X,
            flg_train_y_lambdas=flg_train_y_lambdas,
            flg_train_y_lengthscales=flg_train_y_lengthscales,
            flg_train_y_sigma_n=flg_train_y_sigma_n,
            flg_train_x_lambdas=flg_train_x_lambdas,
            flg_train_x_lengthscales=flg_train_x_lengthscales,
            flg_train_x_sigma_n=flg_train_x_sigma_n,
            flg_train_x_lin_coeff=flg_train_x_lin_coeff,
            dtype=dtype,
            balance_fix=balance_fix,
            hyperprior_weight=hyperprior_weight,
            hyperprior_weights=(
                None if hyperprior_weights is None
                else tuple(float(v) for v in hyperprior_weights)
            ),
            hyperprior_centers=hyperprior_centers,
        )
        self._init_hypers = dict(
            y_lambdas_init=np.asarray(y_lambdas_init, dtype=np.float64),
            y_lengthscales_init=np.asarray(y_lengthscales_init, dtype=np.float64),
            y_sigma_n_init=float(y_sigma_n_init),
            x_lambdas_init=np.asarray(x_lambdas_init, dtype=np.float64),
            x_lengthscales_init=np.asarray(x_lengthscales_init, dtype=np.float64),
            x_sigma_n_init=float(x_sigma_n_init),
            x_lin_coeff_init=np.asarray(x_lin_coeff_init, dtype=np.float64),
        )
        # Observations accumulated per class (reference
        # class_aware_observations_list, gpmdm.py:237).
        self.class_aware_observations_list: List[List[np.ndarray]] = [
            [] for _ in range(n_classes)
        ]
        self.layout: Optional[DataLayout] = None
        self.params: Optional[core.GPMDMParams] = None
        self.posterior = None
        self._opt_state = None
        self._training_mode = "all"
        # Guard-arbitrated deployment recommendation (docs/DEPLOY.md):
        # set by `deploy --sparsify` / tools/eval_asset_guard.py --bake,
        # persisted in checkpoints, honored by resolve_posterior('auto').
        self._deploy_recommendation = None

    #: Deployment-family marker for resolve_posterior('auto'): True when
    #: the model's own posterior is an exact ``core.Posterior`` (so the
    #: auto policy may swap in the compressed quad at large Ny) — lets the
    #: policy decide WITHOUT forcing a lazily-deferred exact build.
    #: SparseGPMDM overrides to False (its posterior deploys as-is).
    _deploys_core_posterior = True

    @property
    def posterior(self):
        """Exact posterior state (``core.Posterior``), built lazily when a
        checkpoint load deferred it: deployments that only ever touch the
        persisted compressed cache (resolve_posterior 'auto' at large Ny)
        never pay the O(N^3) host factorization (~30 s at Ny=5120)."""
        if self._posterior is None and getattr(self, "_posterior_pending", False):
            hp = self._lazy_host_params
            built = core.precompute_host(
                hp if hp is not None else self.params,
                self.get_Y(), self.config, self.layout,
            )
            # clear the deferred state only on SUCCESS: a failed build
            # (degenerate Gram, interrupt) must stay retryable and keep
            # the stashed host params (re-fetching from device costs the
            # 2-450 s first-fetch, which the stash exists to avoid)
            self._posterior = built
            self._posterior_pending = False
            self._lazy_host_params = None
        return self._posterior

    @posterior.setter
    def posterior(self, value) -> None:
        self._posterior = value
        self._posterior_pending = False
        self._lazy_host_params = None

    # ----------------------------------------------------------------- data

    def add_data(self, Y: np.ndarray, class_index: int) -> None:
        """Register one observation sequence for a class (reference add_data,
        gpmdm.py:281-298)."""
        Y = np.asarray(Y)
        if Y.ndim != 2 or Y.shape[1] != self.config.D:
            raise ValueError("Y must be a N x D matrix collecting observation data!")
        if not (0 <= class_index < self.config.n_classes):
            raise ValueError(f"class_index out of range [0, {self.config.n_classes})")
        self.class_aware_observations_list[class_index].append(
            Y.astype(self.config.np_dtype)
        )

    @property
    def observations_list(self) -> List[np.ndarray]:
        """All sequences flattened class-major (reference gpmdm.py:300-309)."""
        return [s for cls in self.class_aware_observations_list for s in cls]

    def get_Y(self) -> np.ndarray:
        """Stacked observation matrix (reference get_Y, gpmdm.py:779-793;
        mean-centering is disabled there, so meanY = 0)."""
        return np.concatenate(self.observations_list, axis=0)

    def get_Y_for_class(self, class_index: int) -> np.ndarray:
        return np.concatenate(self.class_aware_observations_list[class_index], axis=0)

    # ------------------------------------------------------------ properties

    @property
    def D(self) -> int:
        return self.config.D

    @property
    def d(self) -> int:
        return self.config.d

    @property
    def n_classes(self) -> int:
        return self.config.n_classes

    @property
    def dyn_target(self) -> str:
        return self.config.dyn_target

    @property
    def dyn_back_step(self) -> int:
        return self.config.dyn_back_step

    @property
    def dtype(self):
        return jnp.dtype(self.config.dtype)

    @property
    def X(self) -> jax.Array:
        self._require_init()
        return self.params.X

    # ----------------------------------------------------------------- init

    def _build_layout(self) -> DataLayout:
        seq_lengths, seq_classes = [], []
        for c, seqs in enumerate(self.class_aware_observations_list):
            for s in seqs:
                seq_lengths.append(s.shape[0])
                seq_classes.append(c)
        if not seq_lengths:
            raise ValueError("no data added; call add_data first")
        return build_layout(
            seq_lengths, seq_classes, self.config.n_classes, self.config.dyn_back_step
        )

    def init_X(self) -> None:
        """PCA-initialize the latent matrix and precompute posterior state
        (reference init_X, gpmdm.py:762-777)."""
        self.layout = self._build_layout()
        Y = self.get_Y()
        X0 = core.pca_init_x(Y, self.config.d)
        h = self._init_hypers
        self.params = core.init_params(
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
        self._opt_state = None
        self._precompute_kernel_inverses()

    def _require_init(self):
        if self.params is None:
            raise RuntimeError("model not initialized; call init_X() first")

    def _require_posterior(self):
        self._require_init()
        if self.posterior is None:
            self._precompute_kernel_inverses()

    def _precompute_kernel_inverses(self, host_params=None, lazy=False) -> None:
        """Refresh posterior state (reference _precompute_kernel_inverses,
        gpmdm.py:1284-1305).

        Runs on the host in float64 (core.precompute_host): trained Gram
        matrices sit at f32's conditioning limit, and the one-time f64
        factorization makes the low-precision deployed posterior stable on
        TPU (factor high, deploy low).

        ``host_params``: numpy copies of ``self.params``, when the caller
        already has them (checkpoint loading) — avoids a device->host
        fetch, whose FIRST occurrence in a process costs 2-450 s on the
        remote-TPU transport (CLAUDE.md).

        ``lazy``: defer the O(N^3) host factorization to the first
        ``posterior`` access (checkpoint loading — see the ``posterior``
        property)."""
        self._require_init()
        self._compressed_cache = {}
        self._sparsified_cache = {}
        # a posterior refresh (retraining) invalidates any guard verdict
        # measured on the previous parameters
        self._deploy_recommendation = None
        if lazy:
            self._posterior = None
            self._posterior_pending = True
            self._lazy_host_params = host_params
            return
        self.posterior = core.precompute_host(
            host_params if host_params is not None else self.params,
            self.get_Y(), self.config, self.layout,
        )

    def compressed_posterior(
        self,
        rank_y: int | None = None,
        rank_x: int | None = None,
        tol: float = 1e-6,
    ):
        """Low-rank-quad deployment posterior (models/compressed.py): the
        predictive MEAN stays exact, the variance quad contraction drops
        from O(N^2 P) to O(N q P) per filter frame.  Pass the result as the
        ``posterior=`` of :class:`GPMDM_PF` / ``pf_scan``.  ``tol`` selects
        ranks from the Gram spectrum when ``rank_*`` are not pinned.

        The result is cached per (rank_y, rank_x, tol) — the O(N^3) host
        eigendecomposition runs once per posterior refresh, so repeated
        ``posterior='auto'`` deployments (GPMDM_PF, CLI eval) are free
        after the first; every posterior refresh
        (``_precompute_kernel_inverses``) clears the cache.  ``save()``
        persists the cache, so a loaded checkpoint deploys with no
        O(N^3) work at all (utils/io.py)."""
        from . import compressed

        self._require_init()
        cache = getattr(self, "_compressed_cache", None)
        if cache is None:
            cache = self._compressed_cache = {}
        # normalize to builtin types: numpy ints/floats are valid ranks
        # but would break the JSON key serialization in save_model
        key = (
            None if rank_y is None else int(rank_y),
            None if rank_x is None else int(rank_x),
            float(tol),
        )
        if key not in cache:
            # a lazily-loaded checkpoint stashes numpy host params for the
            # deferred exact build — use them here too, or this cache miss
            # pays the device->host first-fetch (2-450 s) the stash exists
            # to avoid
            hp = (
                self._lazy_host_params
                if getattr(self, "_posterior_pending", False)
                else None
            )
            cache[key] = compressed.compress_host(
                hp if hp is not None else self.params,
                self.get_Y(), self.config, self.layout,
                rank_y=rank_y, rank_x=rank_x, tol=tol,
            )
        return cache[key]

    def sparsified_posterior(
        self,
        n_inducing_y: int = 128,
        n_inducing_x: int | None = None,
        method: str = "stride",
    ):
        """Post-hoc SGPR distillation of this trained exact model
        (models/sparse.py ``distill_host``): the deployed filter's star
        kernel drops from (Ny, P) to (M, P) per frame and the variance
        path to O(M^2 P) — the large-N serving lever the compressed
        posterior cannot reach (its exact mean still reads all Ny training
        rows every frame).  Both mean AND variance become M-rank
        approximations, so arbitrate adoption with an accuracy guard
        (docs/DEPLOY.md).  Pass the result as the ``posterior=`` of
        :class:`GPMDM_PF` / ``pf_scan`` / CLI ``eval --sparsify M``.

        Cached per (n_inducing_y, n_inducing_x) and persisted by
        ``save()`` like the compressed cache, so a loaded checkpoint
        deploys with no O(N M^2) host work (utils/io.py)."""
        from . import sparse

        self._require_init()
        if not getattr(self, "_deploys_core_posterior", False):
            raise TypeError(
                f"{type(self).__name__} deploys its own posterior family; "
                "post-hoc distillation applies to exact-trained models "
                "(re-train with SparseGPMDM to choose M at training time)"
            )
        cache = getattr(self, "_sparsified_cache", None)
        if cache is None:
            cache = self._sparsified_cache = {}
        # method is part of the key; 'stride' keys stay 2-tuples so
        # checkpoints persisted before the knob existed keep loading
        key = (
            int(n_inducing_y),
            None if n_inducing_x is None else int(n_inducing_x),
        )
        if method != "stride":
            key = key + (str(method),)
        if key not in cache:
            # reuse the lazy host-param stash (see compressed_posterior)
            hp = (
                self._lazy_host_params
                if getattr(self, "_posterior_pending", False)
                else None
            )
            cache[key] = sparse.distill_host(
                hp if hp is not None else self.params,
                self.get_Y(), self.config, self.layout,
                n_inducing_y=n_inducing_y, n_inducing_x=n_inducing_x,
                method=method,
            )
        return cache[key]

    # ------------------------------------------------------------- training

    def set_evaluation_mode(self) -> None:
        self._training_mode = None

    def set_training_mode(self, model: str = "all") -> None:
        if model not in ("all", "latent", "dynamics"):
            raise ValueError("model must be 'all', 'latent' or 'dynamics'")
        self._training_mode = model

    def gpdm_loss(self, balance: float = 1.0) -> float:
        """Current total MAP loss (reference gpdm_loss, gpmdm.py:721-760)."""
        self._require_init()
        Y = jnp.asarray(self.get_Y(), dtype=self.dtype)
        return float(
            _jit_nll(self.params, Y, cfg=self.config, layout=self.layout, balance=balance)
        )

    def train_adam(
        self,
        num_opt_steps: int,
        num_print_steps: int = 0,
        lr: float = 0.01,
        balance: float = 1.0,
        logger=None,
        optimizer: str = "adam",
    ) -> List[float]:
        """Optimize with Adam (reference train_adam, gpmdm.py:817-885).

        Returns the per-step loss history.  Optimizer state is kept on the
        instance, so consecutive calls resume rather than restart Adam
        moments (switching ``optimizer`` resets it).  ``logger``
        (utils.logging.MetricLogger) receives structured loss /
        steps-per-sec records per chunk.
        """
        from ..train.trainer import train_adam as _train

        self._require_init()
        mode = self._training_mode or "all"
        tc = TrainConfig(
            num_steps=num_opt_steps, lr=lr, balance=balance,
            print_every=num_print_steps, optimizer=optimizer,
        )
        if optimizer != getattr(self, "_opt_name", "adam"):
            self._opt_state = None  # moments/history are not transferable
        self._opt_name = optimizer
        self._lbfgs_memory = tc.lbfgs_memory

        def log(step, loss, t):
            if num_print_steps:
                print(f"GPDM Opt. step {step}: loss {loss:.4e}  ({t:.1f}s)")

        result = _train(
            self.params,
            self.get_Y(),
            self.config,
            self.layout,
            tc,
            mode=mode,
            opt_state=self._opt_state,
            log_fn=log if num_print_steps else None,
            logger=logger,
        )
        self.params = result.params
        self._opt_state = result.opt_state
        self._precompute_kernel_inverses()
        return [float(l) for l in result.losses]

    def train_lbfgs(
        self,
        num_opt_steps: int,
        num_print_steps: int = 0,
        balance: float = 1.0,
        logger=None,
    ) -> List[float]:
        """Optimize with L-BFGS (optax two-loop recursion + zoom
        linesearch) — the SURVEY §7.1 optional second-order MAP trainer.
        No reference counterpart (the reference trains with Adam only);
        each step runs a linesearch, so far fewer steps are needed."""
        return self.train_adam(
            num_opt_steps, num_print_steps=num_print_steps, balance=balance,
            logger=logger, optimizer="lbfgs",
        )

    # ----------------------------------------------------------- prediction

    def map_x_to_y(self, Xstar, flg_noise: bool = False):
        """Latent -> observation posterior (reference map_x_to_y,
        gpmdm.py:923-963)."""
        self._require_posterior()
        Xstar = jnp.atleast_2d(jnp.asarray(Xstar, dtype=self.dtype))
        return _jit_predict_y(
            self.posterior, self.params, Xstar, cfg=self.config, with_noise=flg_noise
        )

    def map_x_dynamics(self, Xstar, flg_noise: bool = False):
        """All-class dynamics posterior (reference map_x_dynamics,
        gpmdm.py:993-1030)."""
        self._require_posterior()
        Xstar = jnp.atleast_2d(jnp.asarray(Xstar, dtype=self.dtype))
        return _jit_predict_x(
            self.posterior, self.params, Xstar, cfg=self.config, with_noise=flg_noise
        )

    def map_x_dynamics_for_class(self, Xstar, class_index: int, flg_noise: bool = False):
        """Single-class dynamics posterior (reference
        map_x_dynamics_for_class, gpmdm.py:1032-1068)."""
        self._require_posterior()
        Xstar = jnp.atleast_2d(jnp.asarray(Xstar, dtype=self.dtype))
        return _jit_predict_x_for_class(
            self.posterior,
            self.params,
            Xstar,
            class_index=class_index,
            cfg=self.config,
            with_noise=flg_noise,
        )

    def get_next_x(self, gp_mean_out, gp_out_var, Xold, flg_sample: bool = False, key=None):
        """Dynamics output -> next latent state (reference get_next_x,
        gpmdm.py:1103-1145)."""
        if flg_sample and key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        return core.next_x(
            jnp.asarray(gp_mean_out),
            jnp.asarray(gp_out_var),
            jnp.asarray(Xold),
            self.config,
            sample=flg_sample,
            key=key,
        )

    def rollout(self, x0, n_steps: int, class_index: int, sample: bool = False, key=None):
        """Autoregressive latent rollout under one class's dynamics."""
        self._require_posterior()
        x0 = jnp.asarray(x0, dtype=self.dtype)
        return core.rollout(
            self.posterior,
            self.params,
            x0,
            n_steps,
            class_index,
            self.config,
            sample=sample,
            key=key,
        )

    # ------------------------------------------------- reference API parity

    def get_M(self) -> np.ndarray:
        """Dense class-block mask M over dynamics pairs (reference get_M,
        gpmdm.py:311-340).  The compute path never materializes this — the
        class-major layout makes ``K_x * M`` block diagonal (see
        ops/layout.py); provided for inspection/parity."""
        from ..ops.layout import class_block_mask

        self._require_init()
        return class_block_mask(self.layout, dtype=self.config.np_dtype)

    def get_M_for_class(self, class_index: int) -> np.ndarray:
        """Single-class block mask (reference get_M_for_class,
        gpmdm.py:342-378)."""
        self._require_init()
        pc = self.layout.pair_class
        sel = (pc == class_index)
        return (sel[:, None] & sel[None, :]).astype(self.config.np_dtype)

    def get_Xin_Xout_matrices(self):
        """Dynamics regression matrices (Xin, Xout) plus per-sequence start
        indices INTO THE LATENT MATRIX X (reference get_Xin_Xout_matrices,
        gpmdm.py:630-718, whose start_indeces cumulate full sequence
        lengths)."""
        from ..ops.layout import xin_xout

        self._require_init()
        Xin, Xout = xin_xout(self.params.X, self.layout, self.config.dyn_target)
        starts = [int(s) for s in self.layout.seq_starts]
        return Xin, Xout, starts

    def get_y_kernel(self, X1, X2, flg_noise: bool = True):
        """Observation kernel matrix (reference get_y_kernel,
        gpmdm.py:381-406)."""
        from ..ops import kernels as K

        p = self.params
        return K.y_kernel(
            jnp.asarray(X1, self.dtype),
            jnp.asarray(X2, self.dtype),
            p.y_log_lengthscales,
            p.y_log_sigma_n,
            self.config.sigma_n_num_Y,
            with_noise=flg_noise,
        )

    def get_x_kernel(self, X1, X2, flg_noise: bool = True):
        """Dynamics kernel matrix (reference get_x_kernel,
        gpmdm.py:408-434)."""
        from ..ops import kernels as K

        p = self.params
        return K.x_kernel(
            jnp.asarray(X1, self.dtype),
            jnp.asarray(X2, self.dtype),
            p.x_log_lengthscales,
            p.x_log_sigma_n,
            p.x_log_lin_coeff,
            self.config.sigma_n_num_X,
            with_noise=flg_noise,
        )

    def get_y_neg_log_likelihood(self) -> float:
        """Observation-map NLL L_y (reference gpmdm.py:550-589)."""
        self._require_init()
        Y = jnp.asarray(self.get_Y(), dtype=self.dtype)
        return float(core.y_neg_log_likelihood(self.params, Y, self.config))

    def get_x_neg_log_likelihood(self) -> float:
        """Dynamics-map NLL L_x (reference gpmdm.py:591-628)."""
        self._require_init()
        return float(core.x_neg_log_likelihood(self.params, self.config, self.layout))

    # ---------------------------------------------------------- inspection

    def get_latent_sequences(self) -> List[np.ndarray]:
        """Per-sequence latent trajectories (reference get_latent_sequences,
        gpmdm.py:887-904)."""
        self._require_init()
        X = np.asarray(self.params.X)
        out, start = [], 0
        for s in self.observations_list:
            out.append(X[start : start + s.shape[0]])
            start += s.shape[0]
        return out

    def get_X_for_class(self, class_index: int) -> jax.Array:
        """Latent rows of one class (reference get_X_for_class,
        gpmdm.py:906-921)."""
        self._require_init()
        lo = int(self.layout.y_class_offsets[class_index])
        hi = int(self.layout.y_class_offsets[class_index + 1])
        return self.params.X[lo:hi]

    # --------------------------------------------------------- diagnostics

    @staticmethod
    def _nmse(truth, mean, var, floored: bool) -> float:
        z2 = (np.asarray(truth) - np.asarray(mean)) ** 2 / np.asarray(var)
        if floored:
            z2 = np.floor(z2)
        return float(np.mean(z2))

    def get_latent_map_performance(self, flg_noise: bool = False, floored: bool = False):
        """(mean, var, Y, NMSE) on all training data (reference
        get_latent_map_performance, gpmdm.py:1199-1239).  ``floored=True``
        reproduces the reference's floor-division quirk."""
        self._require_posterior()
        Y = np.asarray(self.get_Y())
        mean, var = self.map_x_to_y(self.params.X, flg_noise)
        nmse = self._nmse(Y, mean, var, floored)
        return np.asarray(mean), np.asarray(var), Y, nmse

    def get_latent_map_performance_for_class(
        self, class_index: int, flg_noise: bool = False, floored: bool = False
    ):
        """Per-class latent map NMSE (reference gpmdm.py:1241-1273)."""
        self._require_posterior()
        Xc = self.get_X_for_class(class_index)
        Yc = np.asarray(self.get_Y_for_class(class_index))
        mean, var = self.map_x_to_y(Xc, flg_noise)
        nmse = self._nmse(Yc, mean, var, floored)
        return np.asarray(mean), np.asarray(var), Yc, nmse

    def get_dynamics_map_performance_for_class(
        self, class_index: int, flg_noise: bool = False, floored: bool = False
    ):
        """Per-class dynamics map NMSE over all training pairs (reference
        gpmdm.py:1147-1196)."""
        self._require_posterior()
        mean, var = self.map_x_dynamics_for_class(self.posterior.Xin, class_index, flg_noise)
        nmse = self._nmse(self.posterior.Xout, mean, var, floored)
        return (
            np.asarray(mean),
            np.asarray(var),
            np.asarray(self.posterior.Xout),
            np.asarray(self.posterior.Xin),
            nmse,
        )

    # ---------------------------------------------------------- persistence

    def save(self, file_path) -> None:
        """Self-contained checkpoint (reference save, gpmdm.py:1307-1346):
        config + trained parameters + raw observation sequences (+ optimizer
        moments when present), as a single ``.npz`` — no pickle."""
        from ..utils.io import save_model

        save_model(self, file_path)

    @classmethod
    def load(cls, file_path) -> "GPMDM":
        """Load a checkpoint saved by :meth:`save` (reference load,
        gpmdm.py:1349-1414)."""
        from ..utils.io import load_model

        return load_model(cls, file_path)

    @classmethod
    def load_torch(cls, file_path) -> "GPMDM":
        """Import a reference PyTorch ``.pth`` checkpoint
        (format written by reference save, gpmdm.py:1307-1346)."""
        from ..utils.io import load_torch_model

        return load_torch_model(cls, file_path)
