"""Model configuration for GPMDM.

Mirrors the constructor schema of the reference implementation
(`/root/reference/gpmdm/gpmdm.py:96-237` and its persisted form at
`gpmdm.py:1317-1336`): observation dim D, latent dim d, number of classes,
dynamics target ('full' | 'delta'), dynamics back-step (1 | 2), initial kernel
hyperparameters, per-hyperparameter trainability flags, and numerical-jitter
noise values.

Everything here is static (hashable) so a config can be closed over by
``jax.jit`` without retracing.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class GPMDMConfig:
    """Static configuration of a GPMDM model.

    Attributes
    ----------
    D:
        Observation space dimension.
    d:
        Latent space dimension.
    n_classes:
        Number of classes (each with its own dynamics GP).
    dyn_target:
        Dynamics regression target: ``'full'`` predicts ``x(t+1)``,
        ``'delta'`` predicts ``x(t+1) - x(t)``.
    dyn_back_step:
        Dynamics memory: 1 uses ``x(t)`` as input, 2 uses ``[x(t), x(t-1)]``.
    sigma_n_num_Y / sigma_n_num_X:
        Additional noise std added to the observation / dynamics Gram
        diagonals for numerical robustness (reference ``sigma_n_num_*``,
        gpmdm.py:232-234).
    class_jitter:
        Jitter added to each per-class dynamics Gram block before inversion
        (reference hard-codes 1e-6 at gpmdm.py:1302).
    flg_train_*:
        Whether the corresponding hyperparameter receives gradient updates
        (reference ``requires_grad`` flags, gpmdm.py:104-107).
    balance_fix:
        The reference has a latent bug where the ``balance`` factor passed to
        ``train_adam`` binds to an unused parameter so the effective balance
        is always 1 (gpmdm.py:721-726 vs :866).  With ``balance_fix=True``
        (default) the balance factor is honored; set False for bug-for-bug
        reference parity.
    dtype:
        'float32' | 'float64' | 'bfloat16' — compute dtype for model state.
    """

    D: int
    d: int
    n_classes: int
    dyn_target: str = "full"
    dyn_back_step: int = 1
    sigma_n_num_Y: float = 0.0
    sigma_n_num_X: float = 0.0
    class_jitter: float = 1e-6
    flg_train_y_lambdas: bool = True
    flg_train_y_lengthscales: bool = True
    flg_train_y_sigma_n: bool = True
    flg_train_x_lambdas: bool = True
    flg_train_x_lengthscales: bool = True
    flg_train_x_sigma_n: bool = True
    flg_train_x_lin_coeff: bool = True
    balance_fix: bool = True
    dtype: str = "float32"
    # Back-constraint (models/back_constrained.py): when > 0, the latent
    # matrix is parameterized as X = k_rbf(Y, Y; this lengthscale) @ W and
    # W is trained instead of X (smooth inverse mapping, Lawrence &
    # Quinonero-Candela 2006).  0.0 = unconstrained X (the reference's
    # parameterization).
    back_constraint_ls: float = 0.0
    # Gaussian hyperprior on the LOG kernel hyperparameters, centered at
    # their init values: adds ``w * sum((log_h - center)^2)`` to the MAP
    # loss (core.hyperprior_penalty).  0.0 (default) = the reference's
    # improper-uniform hyperprior (gpmdm.py:721-760 has no prior term).
    # Rationale (docs/BENCHMARKS.md "Four training findings"): at large
    # Ny the unregularized MAP optimum drifts into degeneracy — sigma_n
    # sharpening past the residual scale, x_lin_coeff exploding to 3-18 —
    # and the drift ALSO walks the f32 Gram condition over the TPU
    # Cholesky cliff (the NaN freeze).  A log-space quadratic pull toward
    # init bounds both failure modes without freezing any hyperparameter.
    hyperprior_weight: float = 0.0
    # Static log-space centers (y_ls, y_lam, y_sn, x_ls, x_lam, x_sn,
    # x_lin), set by the GPMDM ctor from the *_init args; None defaults
    # to log(1)=0 for all but sigma_n (log 1e-2, the ctor default).
    hyperprior_centers: Tuple[float, ...] | None = None
    # Optional PER-GROUP weights (same 7-group order as the centers),
    # overriding the uniform ``hyperprior_weight`` where set.  Rationale
    # (docs/BENCHMARKS.md round-4 hyperprior sweep): the NLL gradient on
    # sigma_n is ~100x the lengthscale/lambda gradients at the large-Ny
    # configs, so one uniform weight either fails to bind the sigma_n
    # sharpening (the measured filter-starving drift) or freezes every
    # other hyperparameter.  A large sigma_n-group weight is the SOFT,
    # still-differentiable version of the reference-era flg_train_*
    # freeze — and like any MAP prior it legitimately scales with the
    # dataset size.  None = uniform hyperprior_weight everywhere.
    hyperprior_weights: Tuple[float, ...] | None = None
    # Factor the dynamics loss Gram as chol(RBF + noise) + exact
    # rank-(din+1) fold-in of the linear kernel (core.x_block_terms_
    # deflated) instead of chol(RBF + linear + noise).  Mathematically
    # identical; removes the f32 TPU Cholesky NaN cliff (the linear term
    # manufactures condition numbers ~1e7 as training drifts — measured,
    # docs/BENCHMARKS.md round 4).  False = the reference-shaped direct
    # factorization (gpmdm.py:616-620).
    deflate_x_linear: bool = True

    _HYPERPRIOR_DEFAULT_CENTERS = (0.0, 0.0, float(np.log(1e-2)),
                                   0.0, 0.0, float(np.log(1e-2)), 0.0)

    def __post_init__(self):
        if self.dyn_target not in ("full", "delta"):
            raise ValueError("dyn_target must be 'full' or 'delta'")
        if self.dyn_back_step not in (1, 2):
            raise ValueError("dyn_back_step must be 1 or 2")
        if self.n_classes < 1:
            raise ValueError("n_classes must be >= 1")
        if self.hyperprior_weight < 0.0:
            raise ValueError("hyperprior_weight must be >= 0")
        if self.hyperprior_centers is not None:
            c = tuple(float(v) for v in self.hyperprior_centers)
            if len(c) != 7:
                raise ValueError(
                    "hyperprior_centers must have 7 entries: (y_ls, y_lam, "
                    "y_sn, x_ls, x_lam, x_sn, x_lin) in log space"
                )
            # frozen dataclass: keep the config hashable (JSON round trips
            # deliver a list)
            object.__setattr__(self, "hyperprior_centers", c)
        if self.hyperprior_weights is not None:
            w = tuple(float(v) for v in self.hyperprior_weights)
            if len(w) != 7 or any(v < 0.0 for v in w):
                raise ValueError(
                    "hyperprior_weights must have 7 non-negative entries: "
                    "(y_ls, y_lam, y_sn, x_ls, x_lam, x_sn, x_lin)"
                )
            object.__setattr__(self, "hyperprior_weights", w)

    @property
    def dyn_input_dim(self) -> int:
        """Dimension of the dynamics GP input: d * back_step."""
        return self.d * self.dyn_back_step

    @property
    def np_dtype(self):
        return np.dtype(self.dtype) if self.dtype != "bfloat16" else np.dtype("float32")

    def replace(self, **kw) -> "GPMDMConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "GPMDMConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer configuration (reference: ``train_adam`` args, gpmdm.py:817).

    ``optimizer`` selects 'adam' (reference parity) or 'lbfgs' (optax
    L-BFGS with zoom linesearch — the SURVEY §7.1 optional second-order MAP
    trainer; ``lr`` is ignored and ``lbfgs_memory`` sets the two-loop
    history length).  Each L-BFGS step runs a linesearch (several loss
    evaluations), so far fewer steps are needed than with Adam."""

    num_steps: int = 500
    lr: float = 0.01
    balance: float = 1.0
    print_every: int = 0
    checkpoint_every: int = 0
    checkpoint_path: str | None = None
    optimizer: str = "adam"
    lbfgs_memory: int = 10


@dataclasses.dataclass(frozen=True)
class PFConfig:
    """Particle filter configuration (reference: GPMDM_PF ctor, gpmdm_pf.py:47).

    Attributes
    ----------
    num_particles:
        Number of particles P.
    resampling:
        'systematic' (TPU-friendly, sorted-uniform; default) or
        'multinomial' (reference parity, gpmdm_pf.py:211).
    compat_double_logdet:
        The reference double-counts the log-determinant in the observation
        log-likelihood (gpmdm_pf.py:189-191), producing an effective
        ``-sum(log var)`` instead of ``-0.5*sum(log var)``.  True reproduces
        that behavior; False (default) computes the correct diagonal
        Gaussian log-pdf.
    accumulate_weights:
        If True, multiply the previous weights into the new ones
        (w_t = p(z|x) * w_{t-1}).  The reference resets weights to the
        current likelihood every frame (gpmdm_pf.py:200, valid because it
        resamples every frame); default False for parity.
    precision:
        MXU precision for the filter's GP-posterior matmuls: 'default'
        (1-pass bf16, fastest), 'high' (3-pass), 'highest' (6-pass,
        training-grade).  The star-kernel/variance matmuls dominate the
        filter's TPU runtime; 'high' keeps weights accurate at a fraction
        of the 'highest' cost.
    resample_threshold:
        ESS-triggered resampling: resample only when the effective sample
        size falls below ``threshold * P``.  1.0 (default) resamples every
        frame like the reference (gpmdm_pf.py:206, which has no ESS
        logic); < 1 requires ``accumulate_weights=True`` and skips the
        (expensive) resampling gather on healthy frames.
    quad_precision:
        MXU precision for the variance-quad matmuls alone (Kinv @ Kstar and
        its per-class analogue) — the filter's single largest FLOP sink.
        Quad errors only perturb the predictive VARIANCE (never the mean),
        which the resampling step tolerates far better than mean/star-kernel
        errors, so this can be dropped below ``precision``.  None (default)
        lets each backend resolve its own measured default: exact and
        compressed follow ``precision``; the sparse backend runs
        per-frame triangular solves — EXCEPT a post-hoc DISTILLED
        posterior (``GPMDM.sparsified_posterior``), which defaults to the
        hoisted-inverse 'high' matmul path (measured round 5: +12%/+29%
        fps at P=10k/100k with the accuracy guard at 1.0 — the tri-solve
        default is strictly worse there, docs/BENCHMARKS.md "distilled
        quad-precision grid").  'default' (1-pass bf16) is the measured
        exact-path speed lever (+27% fps at -0.05 frame accuracy on the
        bench asset — below the 0.90 bar, hence opt-in); 'trisolve'
        forces the sparse backends' per-frame triangular-solve variance
        path (the explicit opt-out of the distilled default — also what
        keeps the quad A/B arms compiling DIFFERENT programs,
        tools/exp_quad_precision.py); exact/compressed treat 'trisolve'
        like None.  XLA path only: the opt-in fused kernels
        (``pallas='on'``) run every dot at ``precision`` and ignore this
        knob.
    recon_precision:
        Compressed-posterior backend only: MXU precision for the residual
        reconstruction matmul ``k - U (U^T k)`` of the stable low-rank quad
        (models/compressed.py) — roughly half that backend's FLOP budget.
        Its error enters the quad damped by ``||residual||/||k||`` (unlike
        the raw quad, whose error is undamped), so it tolerates fewer MXU
        passes than ``quad_precision`` on SOME models: measured 'default'
        (1-pass bf16) is +11% fps at full accuracy on the n5120 asset
        (q/N=0.037) but collapses the flat-spectrum c8n5120 asset
        (q/N=0.25) to 0.43 accuracy — adopt only under a measured guard
        (docs/BENCHMARKS.md "recon-precision grid").  None (default)
        follows ``quad_precision``.  Ignored by the exact and sparse
        backends (no reconstruction matmul).
    fuse_mean_quad:
        Group the GP mean matmul into the variance-quad/projection matmul
        against the shared star kernel ([A^T; K_inv] @ Kstar, one MXU call
        and one fewer HBM read of Kstar per GP per frame).  Measured
        CONFIG-DEPENDENT (tools/exp_fused_mean_quad.py): +4.3% headline
        fps at C=2 but -23% on the C=8 asset (the batched per-class lhs
        breaks XLA's einsum tiling), and -13% under bank-vmap even at
        C=2.  'auto' (default) fuses iff n_classes <= 2 on the
        single-filter path and never on the banked path; 'on'/'off'
        force it everywhere.  Only active when the mean and quad share
        an MXU precision (quad_precision unset or equal to precision);
        ignored by the sparse backend and the Pallas opt-in kernels
        (which fuse differently).
    """

    num_particles: int = 100
    resampling: str = "systematic"
    compat_double_logdet: bool = False
    accumulate_weights: bool = False
    # Include the trained observation noise sigma_n^2 in the weight
    # likelihood's variance.  The generative model is z = f(x) + eps, so
    # the correct p(z|x) integrates eps; the reference evaluates
    # map_x_to_y with flg_noise=False (gpmdm_pf.py:183, gpmdm.py:924
    # default), i.e. it scores observations against the noise-free
    # function posterior.  Like the other fixed quirks (balance_fix,
    # compat_double_logdet) the default here is the CORRECT behavior;
    # set False for reference parity (golden tests do).  Measured effect
    # (500 particles, CPU): exact headline asset 0.82 -> 1.00 frame
    # accuracy; sparse Ny=10240 asset 0.57 -> 0.99 — densely-trained
    # models' posterior variance at on-manifold points collapses below
    # the real residual scale and the noise term restores an honest
    # likelihood.  docs/BENCHMARKS.md round 3.
    obs_noise_in_weights: bool = True
    precision: str = "high"
    pallas: str = "auto"
    resample_threshold: float = 1.0
    quad_precision: str | None = None
    recon_precision: str | None = None
    fuse_mean_quad: str = "auto"
    # Banked-filter implementation (pf_scan_bank / pf_scan_bank_masked):
    # 'vmap' wraps the single-filter scan in jax.vmap (round-3 shipping
    # path; measured ~35%/bank-frame tax at 12x10k from batched-einsum
    # glue); 'flat' runs ONE P = B*Pb filter whose GP einsums carry no
    # bank axis at all, with normalization/resampling/readouts blocked
    # per bank (round-4 VERDICT #4).  'auto' picks the measured winner
    # (see _resolve_bank_impl; docs/BENCHMARKS.md "bank tax closed").
    bank_impl: str = "auto"

    def __post_init__(self):
        if self.resampling not in ("systematic", "multinomial"):
            raise ValueError("resampling must be 'systematic' or 'multinomial'")
        if self.num_particles < 1:
            raise ValueError("num_particles must be >= 1")
        if self.precision not in ("default", "high", "highest"):
            raise ValueError("precision must be 'default', 'high' or 'highest'")
        if self.quad_precision not in (None, "default", "high", "highest",
                                       "trisolve"):
            raise ValueError(
                "quad_precision must be None, 'default', 'high', 'highest' "
                "or 'trisolve'"
            )
        if self.recon_precision not in (None, "default", "high", "highest"):
            raise ValueError(
                "recon_precision must be None, 'default', 'high' or 'highest'"
            )
        if self.pallas not in ("auto", "on", "off"):
            raise ValueError("pallas must be 'auto', 'on' or 'off'")
        if self.fuse_mean_quad not in ("auto", "on", "off"):
            raise ValueError("fuse_mean_quad must be 'auto', 'on' or 'off'")
        if self.bank_impl not in ("auto", "vmap", "flat"):
            raise ValueError("bank_impl must be 'auto', 'vmap' or 'flat'")
        if not (0.0 < self.resample_threshold <= 1.0):
            raise ValueError("resample_threshold must be in (0, 1]")
        if self.resample_threshold < 1.0 and not self.accumulate_weights:
            raise ValueError(
                "resample_threshold < 1 (ESS-triggered resampling) requires "
                "accumulate_weights=True — skipped-resample frames must carry "
                "their weights forward"
            )

    @property
    def lax_precision(self):
        import jax

        return {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[self.precision]

    @property
    def lax_quad_precision(self):
        """None when ``quad_precision`` is unset OR 'trisolve' — each
        posterior backend then resolves its OWN default (exact/compressed:
        the main ``precision``; sparse: the triangular-solve variance
        path; post-hoc distilled: the filter promotes unset-None to the
        hoisted-inverse 'high' path, see
        particle_filter._effective_quad_precision — 'trisolve' is the
        explicit opt-out that stays None there).  Passing the main
        precision through here instead would silently flip the sparse
        backends onto the hoisted-inverse matmul path — caught when a
        bench run moved the hourlong guard 0.9994 -> 0.9817 with no
        config change (docs/BENCHMARKS.md "SGPR variance path")."""
        import jax

        if self.quad_precision in (None, "trisolve"):
            return None
        return {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[self.quad_precision]

    @property
    def fused_arg(self):
        """The ``fused=`` argument for the posterior predict functions:
        None ('auto', backends gate on n_classes <= 2) or a forced bool."""
        return {"auto": None, "on": True, "off": False}[self.fuse_mean_quad]

    @property
    def lax_recon_precision(self):
        """None when unset — the compressed backend then falls back to its
        own default (= the quad precision), matching prior behavior."""
        import jax

        if self.recon_precision is None:
            return None
        return {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[self.recon_precision]
