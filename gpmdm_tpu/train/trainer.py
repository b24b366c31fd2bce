"""MAP training of GPMDM with Adam under jit.

TPU-native counterpart of the reference training loop
(`/root/reference/gpmdm/gpmdm.py:817-885`): the whole optimization runs as a
``lax.scan`` over jitted update steps (one compile, zero per-step Python
overhead), with

- optax Adam over all parameters (hyperparameters + latent X jointly, as the
  reference does at gpmdm.py:856-860),
- trainability flags / training modes implemented as gradient masks (the
  functional analogue of the reference's ``requires_grad`` toggles,
  gpmdm.py:104-107, :247-279),
- a NaN guard that freezes parameters as soon as the loss goes NaN
  (reference breaks out of its loop, gpmdm.py:868-870); training effectively
  stops and the caller can inspect the returned loss history.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..config import GPMDMConfig, TrainConfig
from ..models import core
from ..ops.layout import DataLayout


def trainable_mask(cfg: GPMDMConfig, mode: str = "all") -> core.GPMDMParams:
    """Per-parameter trainability mask (1.0 trainable / 0.0 frozen).

    Combines the config's ``flg_train_*`` flags with the training mode
    ('all' | 'latent' | 'dynamics'), mirroring reference
    ``set_training_mode`` (gpmdm.py:247-279).  The latent matrix X is always
    trainable during training, as in the reference (gpmdm.py:773).

    Intentional divergence: the reference's ``train_adam`` unconditionally
    calls ``set_training_mode('all')`` (gpmdm.py:856), force-enabling every
    parameter and silently overriding the ctor's ``flg_train_*`` flags and
    any prior mode — its flags are effectively dead.  Here flags and mode
    are honored (the behavior the reference's API documents); see
    docs/PARITY.md.
    """
    if mode not in ("all", "latent", "dynamics"):
        raise ValueError("mode must be 'all', 'latent' or 'dynamics'")
    y_on = mode in ("all", "latent")
    x_on = mode in ("all", "dynamics")

    def m(flag: bool) -> float:
        return 1.0 if flag else 0.0

    return core.GPMDMParams(
        y_log_lengthscales=jnp.asarray(m(y_on and cfg.flg_train_y_lengthscales)),
        y_log_lambdas=jnp.asarray(m(y_on and cfg.flg_train_y_lambdas)),
        y_log_sigma_n=jnp.asarray(m(y_on and cfg.flg_train_y_sigma_n)),
        x_log_lengthscales=jnp.asarray(m(x_on and cfg.flg_train_x_lengthscales)),
        x_log_lambdas=jnp.asarray(m(x_on and cfg.flg_train_x_lambdas)),
        x_log_sigma_n=jnp.asarray(m(x_on and cfg.flg_train_x_sigma_n)),
        x_log_lin_coeff=jnp.asarray(m(x_on and cfg.flg_train_x_lin_coeff)),
        X=jnp.asarray(1.0),
    )


def _mask_and_loss(cfg: GPMDMConfig, mode: str, kind: str):
    """(trainability mask, loss_fn) for a model family ``kind``."""
    if kind == "exact":
        return trainable_mask(cfg, mode), core.nll
    if kind == "sparse":
        from ..models import sparse

        return sparse_trainable_mask(cfg, mode), sparse.sparse_nll
    if kind == "bc":
        from ..models.back_constrained import bc_nll

        return trainable_mask(cfg, mode), bc_nll  # W rides in the X slot
    raise ValueError(f"unknown model kind {kind!r}")


@functools.lru_cache(maxsize=64)
def _get_run_chunk(
    cfg: GPMDMConfig,
    layout: DataLayout,
    lr: float,
    balance: float,
    mode: str,
    kind: str = "exact",
    optimizer_name: str = "adam",
    memory_size: int = 10,
):
    """Build (optimizer, jitted chunk runner) once per (config, layout,
    hyperparameter) combination — a fresh jax.jit per train_adam call would
    recompile the whole scan every time.  ``kind`` selects the model family:
    'exact' (core.nll) or 'sparse' (sparse.sparse_nll + inducing-input
    mask); ``optimizer_name`` selects 'adam' (reference parity,
    gpmdm.py:817-885) or 'lbfgs' (optax L-BFGS + zoom linesearch — the
    SURVEY §7 optional second-order MAP trainer; no reference counterpart)."""
    mask, loss_fn = _mask_and_loss(cfg, mode, kind)
    if optimizer_name == "adam":
        optimizer = optax.adam(lr)
        step = make_update_step(cfg, layout, optimizer, balance, mask, loss_fn)
    elif optimizer_name == "lbfgs":
        optimizer = optax.lbfgs(memory_size=memory_size)
        step = make_lbfgs_step(cfg, layout, optimizer, balance, mask, loss_fn)
    else:
        raise ValueError(f"unknown optimizer {optimizer_name!r}")

    @partial(jax.jit, static_argnames=("n",))
    def run_chunk(params, opt_state, Y, n):
        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, Y), None, length=n
        )
        return params, opt_state, losses

    return optimizer, run_chunk


@dataclasses.dataclass
class TrainResult:
    params: core.GPMDMParams
    opt_state: optax.OptState
    losses: jax.Array  # (num_steps,)
    wall_time_s: float
    steps_per_sec: float


def sparse_trainable_mask(cfg: GPMDMConfig, mode: str = "all"):
    """Trainability mask for SparseParams: the exact-model mask plus the
    inducing inputs (Zy trains with the latent/observation group, Zx with
    the dynamics group)."""
    from ..models import sparse

    base = trainable_mask(cfg, mode)
    y_on = mode in ("all", "latent")
    x_on = mode in ("all", "dynamics")
    return sparse.SparseParams(
        **{f.name: getattr(base, f.name) for f in dataclasses.fields(base)},
        Zy=jnp.asarray(1.0 if y_on else 0.0),
        Zx=jnp.asarray(1.0 if x_on else 0.0),
    )


def make_update_step(
    cfg: GPMDMConfig,
    layout: DataLayout,
    optimizer: optax.GradientTransformation,
    balance: float,
    mask: core.GPMDMParams,
    loss_fn: Callable = None,
) -> Callable:
    """One jittable Adam step: value_and_grad of the MAP loss, masked by
    trainability flags, with a NaN freeze.  ``loss_fn(params, Y, cfg,
    layout, balance)`` defaults to the exact-GP loss core.nll."""
    if loss_fn is None:
        loss_fn = core.nll

    def step(carry, _):
        params, opt_state, Y = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, Y, cfg, layout, balance)
        grads = jax.tree.map(_mask_grad, grads, mask)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # NaN guard: if the loss OR any gradient is non-finite keep the
        # previous parameters (reference breaks the loop at
        # gpmdm.py:868-870, which only sees the loss).  The grad check
        # matters: a finite loss with NaN grads (a Cholesky that
        # succeeded forward but whose adjoint overflowed in f32) would
        # otherwise write NaN into the params PERMANENTLY — the frozen
        # state the round-3 diagnosis calls the "degenerate checkpoint
        # class".
        ok = _finite_step(loss, grads)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
        )
        return (new_params, new_opt_state, Y), loss

    return step


def _mask_grad(g, m):
    """Zero gradients on frozen leaves WITHOUT propagating their NaNs.

    ``g * m`` would turn a non-finite gradient on a frozen hyperparameter
    (e.g. flg_train_x_lin_coeff=False, exactly the config whose lin-coeff
    gradients blow up) into NaN*0 = NaN, and _finite_step would then veto
    every update — training silently makes zero progress while reporting
    finite losses.  Frozen coordinates' gradients are irrelevant by
    definition, so select rather than multiply."""
    return jnp.where(m != 0, g, jnp.zeros_like(g))


def _finite_step(loss, grads):
    """True iff the loss and every (unfrozen) gradient leaf are finite."""
    leaves_ok = [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
    return jnp.isfinite(loss) & jnp.stack(leaves_ok).all()


def make_lbfgs_step(
    cfg: GPMDMConfig,
    layout: DataLayout,
    optimizer: optax.GradientTransformation,
    balance: float,
    mask: core.GPMDMParams,
    loss_fn: Callable = None,
) -> Callable:
    """One jittable L-BFGS step (optax.lbfgs: two-loop recursion + zoom
    linesearch).

    No reference counterpart (the reference trains with Adam only); this is
    the SURVEY §7.1 'optional L-BFGS' trainer — the standard second-order
    choice for GPDM MAP objectives (smooth, deterministic, full-batch).

    Trainability flags are enforced by masking the gradient fed to the
    optimizer: the L-BFGS two-loop recursion maps the masked subspace to
    itself (the search direction is a linear combination of masked gradients
    and masked parameter displacements), so frozen coordinates never move —
    no post-hoc update masking needed.  The linesearch's value function sees
    the full loss, which is correct because candidate points only vary along
    the masked direction.
    """
    if loss_fn is None:
        loss_fn = core.nll

    def step(carry, _):
        params, opt_state, Y = carry

        def value_fn(p):
            return loss_fn(p, Y, cfg, layout, balance)

        loss, grads = jax.value_and_grad(value_fn)(params)
        grads = jax.tree.map(_mask_grad, grads, mask)
        updates, new_opt_state = optimizer.update(
            grads, opt_state, params, value=loss, grad=grads, value_fn=value_fn
        )
        new_params = optax.apply_updates(params, updates)
        # NaN freeze, same contract as the Adam step: a non-finite loss
        # or gradient leaves parameters and optimizer state untouched.
        ok = _finite_step(loss, grads)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
        )
        return (new_params, new_opt_state, Y), loss

    return step


def train_adam(
    params: core.GPMDMParams,
    Y: jax.Array,
    cfg: GPMDMConfig,
    layout: DataLayout,
    train_cfg: TrainConfig = TrainConfig(),
    mode: str = "all",
    opt_state: optax.OptState | None = None,
    log_fn: Callable[[int, float, float], None] | None = None,
    kind: str = "exact",
    logger=None,
) -> TrainResult:
    """Run Adam for ``train_cfg.num_steps`` steps (reference train_adam,
    gpmdm.py:817-885).

    The loop runs as chunked ``lax.scan`` s (chunk = ``print_every`` steps, or
    the whole run when print_every == 0) so that per-chunk logging and the
    NaN early exit stay on the host while the hot path stays compiled.
    Returns updated params, optimizer state, and the per-step loss history.

    ``logger`` (a :class:`gpmdm_tpu.utils.logging.MetricLogger`) receives a
    structured record per chunk: loss and steps/sec — the SURVEY §5
    first-class training metrics.
    """
    # lr is ignored by L-BFGS (linesearch picks the step): canonicalize it
    # out of the compile-cache key so `--optimizer lbfgs --lr X` sweeps
    # reuse one compiled scan instead of recompiling per lr (ADVICE r3).
    lr = 0.0 if train_cfg.optimizer == "lbfgs" else train_cfg.lr
    optimizer, run_chunk = _get_run_chunk(
        cfg, layout, lr, train_cfg.balance, mode, kind,
        train_cfg.optimizer, train_cfg.lbfgs_memory,
    )
    if opt_state is None:
        opt_state = optimizer.init(params)
    else:
        # A caller-supplied state from the WRONG optimizer family (e.g. an
        # adam state resumed into optimizer='lbfgs') would otherwise
        # surface as an opaque scan/pytree structure error (ADVICE r3).
        expected = jax.tree.structure(optimizer.init(params))
        got = jax.tree.structure(opt_state)
        if got != expected:
            raise ValueError(
                f"opt_state structure does not match optimizer "
                f"'{train_cfg.optimizer}' — it was probably produced by a "
                "different optimizer; pass opt_state=None to start fresh"
            )

    chunk = train_cfg.print_every if train_cfg.print_every > 0 else train_cfg.num_steps
    if train_cfg.checkpoint_every > 0:
        chunk = min(chunk, train_cfg.checkpoint_every)
    chunk = max(1, min(chunk, train_cfg.num_steps))

    Y = jnp.asarray(Y, dtype=jnp.dtype(cfg.dtype))
    t0 = time.perf_counter()
    all_losses = []
    done = 0
    while done < train_cfg.num_steps:
        n = min(chunk, train_cfg.num_steps - done)
        params, opt_state, losses = run_chunk(params, opt_state, Y, n)
        losses.block_until_ready()
        all_losses.append(losses)
        done += n
        if log_fn is not None:
            log_fn(done, float(losses[-1]), time.perf_counter() - t0)
        if logger is not None:
            wall_so_far = time.perf_counter() - t0
            logger.log(
                step=done,
                loss=float(losses[-1]),
                steps_per_sec=done / wall_so_far if wall_so_far > 0 else 0.0,
            )
        # save whenever a checkpoint boundary was crossed inside this chunk
        # (chunk boundaries need not align with checkpoint_every)
        if (
            train_cfg.checkpoint_every > 0
            and train_cfg.checkpoint_path
            and done // train_cfg.checkpoint_every > (done - n) // train_cfg.checkpoint_every
        ):
            from ..utils.checkpoint import save_train_state

            save_train_state(
                train_cfg.checkpoint_path,
                params,
                opt_state,
                done,
                jnp.concatenate(all_losses),
            )
        if not bool(jnp.isfinite(losses[-1])):
            break  # NaN guard tripped inside the chunk; parameters are frozen
    wall = time.perf_counter() - t0
    losses = jnp.concatenate(all_losses) if all_losses else jnp.zeros((0,))
    return TrainResult(
        params=params,
        opt_state=opt_state,
        losses=losses,
        wall_time_s=wall,
        steps_per_sec=done / wall if wall > 0 else float("inf"),
    )
