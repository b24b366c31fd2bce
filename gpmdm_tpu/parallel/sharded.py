"""Sharded GPMDM training: expert-parallel dynamics + tensor-parallel
observation NLL under ``shard_map``.

The reference trains on a single device (gpmdm.py:817-885).  The TPU-native
multi-chip training step distributes the two expensive parts of the MAP loss
over a ('ep', 'tp') mesh:

- **ep (expert parallel)** — the dynamics NLL decomposes into independent
  per-class Gram factorizations (SURVEY.md §2.6: per-class GPs are the EP
  analogue).  Class blocks are padded to a common size
  (:func:`gpmdm_tpu.models.core.x_nll_padded_blocks`, exact identity
  padding) and sharded over ``ep``; each device factorizes its classes'
  blocks and the per-class terms are ``psum``'d.  For the 8-class N~5k
  config this is where the O(sum n_c^3) Cholesky work parallelizes.
- **tp (tensor parallel)** — the observation NLL trace term
  ``trace(K_y^-1 Y W^2 Y^T) = sum_j w_j^2 y_j^T K_y^-1 y_j`` sums over the D
  columns of Y.  Y's columns (padded to a multiple of |tp|) are sharded over
  ``tp``; each device triangular-solves its columns against a (replicated)
  Cholesky factor of K_y and the partial traces are ``psum``'d.  The
  O(Ny^3) factorization itself is replicated — N stays moderate in every
  GPMDM config while D-column solves and the O(Ny^2 D) solve work dominate
  once D grows.

Zero-padding is exact in both axes (padded classes contribute identity
Gram blocks and zero targets; padded Y columns carry lambda = 1 and zero
data, so both the trace and the ``-N log|W|`` terms are untouched).

Gradients flow through ``shard_map`` (psum transposes to identity for
replicated outputs), so the whole thing sits under one
``jax.value_and_grad`` + optax update, jitted once.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import GPMDMConfig, TrainConfig
from ..models import core
from ..ops import kernels as K
from ..ops import linalg as LA
from ..ops.layout import DataLayout, padded_class_indices
from ..train.trainer import _mask_grad
from .mesh import round_up


@dataclasses.dataclass(frozen=True)
class ShardedTrainContext:
    """Static padded arrays + mesh for the sharded loss (built once per
    (layout, mesh) pair).

    ``shard_chol=True`` selects the distributed-Cholesky loss: the
    observation Gram is row-panel sharded over the ``tp`` axis and
    factorized with parallel/dist_chol (the O(Ny^3) term actually shards);
    Y is row-sharded instead of column-sharded.  Requires Ny divisible by
    |tp|.  False keeps the replicated-Cholesky loss (columns-of-Y
    trace-term sharding only).
    """

    mesh: Mesh
    cfg: GPMDMConfig
    layout: DataLayout
    idx_in: np.ndarray  # (C_pad, n_max)
    idx_prev: np.ndarray
    idx_out: np.ndarray
    mask: np.ndarray
    D_pad: int
    shard_chol: bool = False

    @property
    def ep(self) -> int:
        return self.mesh.shape["ep"]

    @property
    def tp(self) -> int:
        return self.mesh.shape["tp"]


def make_context(
    cfg: GPMDMConfig,
    layout: DataLayout,
    mesh: Mesh,
    shard_chol: bool = False,
) -> ShardedTrainContext:
    ep = mesh.shape["ep"]
    tp = mesh.shape["tp"]
    if shard_chol and layout.Ny % tp != 0:
        raise ValueError(
            f"shard_chol requires Ny ({layout.Ny}) divisible by the tp axis "
            f"({tp}); pad the data or use shard_chol=False"
        )
    pads = padded_class_indices(layout, n_class_pad=round_up(layout.n_classes, ep))
    return ShardedTrainContext(
        mesh=mesh,
        cfg=cfg,
        layout=layout,
        idx_in=pads["idx_in"],
        idx_prev=pads["idx_prev"],
        idx_out=pads["idx_out"],
        mask=pads["mask"],
        D_pad=cfg.D if shard_chol else round_up(cfg.D, tp),
        shard_chol=shard_chol,
    )


def pad_Y(Y: jax.Array, ctx: ShardedTrainContext) -> jax.Array:
    """Pad observation columns to a multiple of |tp| with zeros."""
    extra = ctx.D_pad - ctx.cfg.D
    if extra == 0:
        return Y
    return jnp.pad(Y, ((0, 0), (0, extra)))


def _pad_lambdas(y_log_lambdas: jax.Array, ctx: ShardedTrainContext) -> jax.Array:
    """Pad per-dimension output scales with lambda=1 (log 0): contributes
    nothing to trace or log|W| terms."""
    extra = ctx.D_pad - ctx.cfg.D
    if extra == 0:
        return y_log_lambdas
    return jnp.pad(y_log_lambdas, (0, extra))


def nll_sharded(
    params: core.GPMDMParams,
    Y_padded: jax.Array,
    ctx: ShardedTrainContext,
    balance: float = 1.0,
) -> jax.Array:
    """Total MAP loss L_y + balance * L_x over the ('ep', 'tp') mesh.

    Numerically identical to :func:`gpmdm_tpu.models.core.nll` (same math,
    different partitioning) — including the optional log-hyperprior
    (:func:`core.hyperprior_penalty`), added on the replicated-parameter
    side (device-local, no collective).  Y_padded must come from
    :func:`pad_Y`.
    """
    if ctx.shard_chol:
        return _nll_sharded_chol(params, Y_padded, ctx, balance)
    cfg, layout = ctx.cfg, ctx.layout
    lam_pad = _pad_lambdas(params.y_log_lambdas, ctx)
    idx_in = jnp.asarray(ctx.idx_in)
    idx_prev = jnp.asarray(ctx.idx_prev)
    idx_out = jnp.asarray(ctx.idx_out)
    mask = jnp.asarray(ctx.mask, dtype=Y_padded.dtype)

    def local_loss(params, Y_sh, lam_sh, idx_in_sh, idx_prev_sh, idx_out_sh, mask_sh):
        # ---- observation NLL: Cholesky replicated, trace columns sharded.
        N = Y_sh.shape[0]
        Ky = K.y_kernel(
            params.X,
            params.X,
            params.y_log_lengthscales,
            params.y_log_sigma_n,
            cfg.sigma_n_num_Y,
            with_noise=True,
        )
        Ly = LA.chol_lower(Ky)
        logdet_y = LA.chol_logdet(Ly)
        w2_sh = jnp.exp(lam_sh) ** 2
        trace_local = LA.quad_trace(Ly, Y_sh, w2_sh)
        logW_local = 2.0 * jnp.sum(lam_sh)
        trace_y = jax.lax.psum(trace_local, "tp")
        logW_y = jax.lax.psum(logW_local, "tp")
        L_y = cfg.D / 2.0 * logdet_y + 0.5 * trace_y - N * logW_y

        # ---- dynamics NLL: class blocks sharded over ep.
        terms = core.x_nll_padded_blocks(
            params, cfg, idx_in_sh, idx_prev_sh, idx_out_sh, mask_sh
        )
        L_x_local = jnp.sum(terms)
        L_x = jax.lax.psum(L_x_local, "ep") - layout.Nx * 2.0 * jnp.sum(
            params.x_log_lambdas
        )
        b = balance if cfg.balance_fix else 1.0
        return L_y + b * L_x

    fn = shard_map(
        local_loss,
        mesh=ctx.mesh,
        in_specs=(
            P(),  # params replicated
            P(None, "tp"),  # Y columns
            P("tp"),  # padded lambdas
            P("ep", None),  # per-class index arrays
            P("ep", None),
            P("ep", None),
            P("ep", None),
        ),
        out_specs=P(),
    )
    return fn(
        params, Y_padded, lam_pad, idx_in, idx_prev, idx_out, mask
    ) + core.hyperprior_penalty(params, cfg)


def _nll_sharded_chol(
    params: core.GPMDMParams,
    Y: jax.Array,
    ctx: ShardedTrainContext,
    balance: float = 1.0,
) -> jax.Array:
    """Distributed-Cholesky MAP loss: the observation Gram is row-panel
    sharded over ``tp`` and factorized with parallel/dist_chol, so the
    O(Ny^3) term — which the replicated path runs identically on every
    device — actually parallelizes.  Dynamics stays expert-parallel on
    ``ep``.

    Local-share pattern: each device returns its partial of the loss (an
    (ep, tp) array of shares after shard_map), summed outside together
    with the parameter-only constant terms; this keeps shard_map's
    transpose semantics unambiguous around the custom-vjp NLL core (see
    dist_chol.y_nll_dist).
    """
    from ..ops.linalg import _REL_JITTER
    from .dist_chol import y_nll_dist

    cfg, layout = ctx.cfg, ctx.layout
    N = layout.Ny
    tp, ep = ctx.tp, ctx.ep
    nb = N // tp
    idx_in = jnp.asarray(ctx.idx_in)
    idx_prev = jnp.asarray(ctx.idx_prev)
    idx_out = jnp.asarray(ctx.idx_out)
    mask = jnp.asarray(ctx.mask, dtype=Y.dtype)
    rel = _REL_JITTER.get(jnp.dtype(Y.dtype), 0.0)

    def local_share(params, Y_rows, idx_in_sh, idx_prev_sh, idx_out_sh, mask_sh):
        # ---- observation NLL share: Gram row panel + distributed Cholesky
        i_tp = jax.lax.axis_index("tp")
        X_rows = jax.lax.dynamic_slice_in_dim(params.X, i_tp * nb, nb, axis=0)
        K_i = K.y_kernel(
            X_rows,
            params.X,
            params.y_log_lengthscales,
            params.y_log_sigma_n,
            cfg.sigma_n_num_Y,
            with_noise=False,
        )
        noise = jnp.exp(params.y_log_sigma_n) ** 2 + cfg.sigma_n_num_Y**2
        # global-diagonal noise + the same dtype-relative jitter
        # ops.linalg.chol_lower adds (mean diag of Ky is exactly 1 + noise)
        row_global = i_tp * nb + jnp.arange(nb)
        eye_mask = (jnp.arange(N)[None, :] == row_global[:, None]).astype(
            K_i.dtype
        )
        K_i = K_i + (noise + rel * (1.0 + noise)) * eye_mask
        w2 = jnp.exp(params.y_log_lambdas) ** 2
        y_share = y_nll_dist(K_i, Y_rows, w2, "tp") / float(ep)

        # ---- dynamics NLL share: class blocks on ep (replicated over tp)
        terms = core.x_nll_padded_blocks(
            params, cfg, idx_in_sh, idx_prev_sh, idx_out_sh, mask_sh
        )
        b = balance if cfg.balance_fix else 1.0
        x_share = b * jnp.sum(terms) / float(tp)
        return (y_share + x_share).reshape(1, 1)

    shares = shard_map(
        local_share,
        mesh=ctx.mesh,
        in_specs=(
            P(),  # params replicated
            P("tp", None),  # Y rows
            P("ep", None),  # per-class index arrays
            P("ep", None),
            P("ep", None),
            P("ep", None),
        ),
        out_specs=P("ep", "tp"),
        check_vma=False,  # the checker can't see through the custom_vjp
    )(params, Y, idx_in, idx_prev, idx_out, mask)
    b = balance if cfg.balance_fix else 1.0
    consts = (
        -float(layout.Ny) * 2.0 * jnp.sum(params.y_log_lambdas)
        - b * float(layout.Nx) * 2.0 * jnp.sum(params.x_log_lambdas)
        + core.hyperprior_penalty(params, cfg)
    )
    return jnp.sum(shares) + consts


def make_sharded_update_step(
    ctx: ShardedTrainContext,
    optimizer: optax.GradientTransformation,
    balance: float,
    mask: core.GPMDMParams,
    latent_map: Callable | None = None,
) -> Callable:
    """One jittable sharded Adam step (multi-chip analogue of
    trainer.make_update_step).

    ``latent_map`` (optional) transforms the parameter pytree before the
    loss — the hook the back-constrained family uses to train W with the
    effective latent ``X = K_b @ W`` (models/back_constrained.py); the
    transform runs replicated and gradients flow through it."""

    def loss_fn(params, Y_padded, ctx, balance):
        p = latent_map(params) if latent_map is not None else params
        return nll_sharded(p, Y_padded, ctx, balance)

    def step(carry, _):
        params, opt_state, Y_padded = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, Y_padded, ctx, balance)
        # select, don't multiply: NaN grads on frozen leaves must not
        # poison the update (trainer._mask_grad rationale)
        grads = jax.tree.map(_mask_grad, grads, mask)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(loss)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
        )
        return (new_params, new_opt_state, Y_padded), loss

    return step


def train_adam_sharded(
    params: core.GPMDMParams,
    Y: jax.Array,
    cfg: GPMDMConfig,
    layout: DataLayout,
    mesh: Mesh,
    train_cfg: TrainConfig = TrainConfig(),
    mode: str = "all",
    opt_state=None,
    shard_chol: bool = False,
    latent_map: Callable | None = None,
):
    """Sharded counterpart of trainer.train_adam: the whole optimization
    runs as one jitted lax.scan of sharded update steps.

    ``shard_chol=True`` row-shards the observation Gram and factorizes it
    with the distributed blocked Cholesky (parallel/dist_chol) instead of
    replicating the O(Ny^3) factorization on every device.

    ``latent_map`` transforms params before the loss (the back-constrained
    family's X = K_b @ W hook; see make_sharded_update_step).

    Returns (params, opt_state, losses).
    """
    from ..train.trainer import trainable_mask

    ctx = make_context(cfg, layout, mesh, shard_chol=shard_chol)
    optimizer = optax.adam(train_cfg.lr)
    if opt_state is None:
        opt_state = optimizer.init(params)
    step = make_sharded_update_step(
        ctx, optimizer, train_cfg.balance, trainable_mask(cfg, mode),
        latent_map=latent_map,
    )
    Y_padded = pad_Y(jnp.asarray(Y, dtype=jnp.dtype(cfg.dtype)), ctx)

    @partial(jax.jit, static_argnames=("n",))
    def run(params, opt_state, Y_padded, n):
        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, Y_padded), None, length=n
        )
        return params, opt_state, losses

    return run(params, opt_state, Y_padded, train_cfg.num_steps)
