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
from .mesh import round_up


@dataclasses.dataclass(frozen=True)
class ShardedTrainContext:
    """Static padded arrays + mesh for the sharded loss (built once per
    (layout, mesh) pair)."""

    mesh: Mesh
    cfg: GPMDMConfig
    layout: DataLayout
    idx_in: np.ndarray  # (C_pad, n_max)
    idx_prev: np.ndarray
    idx_out: np.ndarray
    mask: np.ndarray
    D_pad: int

    @property
    def ep(self) -> int:
        return self.mesh.shape["ep"]

    @property
    def tp(self) -> int:
        return self.mesh.shape["tp"]


def make_context(cfg: GPMDMConfig, layout: DataLayout, mesh: Mesh) -> ShardedTrainContext:
    ep = mesh.shape["ep"]
    tp = mesh.shape["tp"]
    pads = padded_class_indices(layout, n_class_pad=round_up(layout.n_classes, ep))
    return ShardedTrainContext(
        mesh=mesh,
        cfg=cfg,
        layout=layout,
        idx_in=pads["idx_in"],
        idx_prev=pads["idx_prev"],
        idx_out=pads["idx_out"],
        mask=pads["mask"],
        D_pad=round_up(cfg.D, tp),
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
    different partitioning).  Y_padded must come from :func:`pad_Y`.
    """
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
    return fn(params, Y_padded, lam_pad, idx_in, idx_prev, idx_out, mask)


def make_sharded_update_step(
    ctx: ShardedTrainContext,
    optimizer: optax.GradientTransformation,
    balance: float,
    mask: core.GPMDMParams,
) -> Callable:
    """One jittable sharded Adam step (multi-chip analogue of
    trainer.make_update_step)."""

    def step(carry, _):
        params, opt_state, Y_padded = carry
        loss, grads = jax.value_and_grad(nll_sharded)(params, Y_padded, ctx, balance)
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
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
):
    """Sharded counterpart of trainer.train_adam: the whole optimization
    runs as one jitted lax.scan of sharded update steps.

    Returns (params, opt_state, losses).
    """
    from ..train.trainer import trainable_mask

    ctx = make_context(cfg, layout, mesh)
    optimizer = optax.adam(train_cfg.lr)
    if opt_state is None:
        opt_state = optimizer.init(params)
    step = make_sharded_update_step(
        ctx, optimizer, train_cfg.balance, trainable_mask(cfg, mode)
    )
    Y_padded = pad_Y(jnp.asarray(Y, dtype=jnp.dtype(cfg.dtype)), ctx)

    @partial(jax.jit, static_argnames=("n",))
    def run(params, opt_state, Y_padded, n):
        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, Y_padded), None, length=n
        )
        return params, opt_state, losses

    return run(params, opt_state, Y_padded, train_cfg.num_steps)
