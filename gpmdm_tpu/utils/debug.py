"""Numerical debugging helpers (checkify-based).

JAX purity is the framework's "race detector" (SURVEY.md §5: nothing
shared-mutable exists); what remains to catch is numerical corruption.
These helpers wrap the loss / an arbitrary function in
``jax.experimental.checkify`` so NaN/Inf producers are reported with a
location instead of silently propagating — the debugging-time counterpart
of the training loop's always-on NaN freeze (train/trainer.py).
"""

from __future__ import annotations

from typing import Callable

from jax.experimental import checkify


def checked(fn: Callable, *args, **kwargs):
    """Run ``fn`` under float checkify; raises with the first NaN/Inf site
    if any, else returns the result.  Runs un-jitted so arguments may
    include static config objects:

        loss = checked(core.nll, params, Y, cfg, layout)
    """
    f = checkify.checkify(fn, errors=checkify.float_checks)
    err, out = f(*args, **kwargs)
    err.throw()
    return out


def check_loss(model, balance: float = 1.0):
    """Checkified evaluation of a model's MAP loss — pinpoints which
    operation first produced a non-finite value."""
    import jax.numpy as jnp

    from ..models import core, sparse

    Y = jnp.asarray(model.get_Y(), dtype=model.dtype)
    loss_fn = (
        sparse.sparse_nll
        if isinstance(model.params, sparse.SparseParams)
        else core.nll
    )
    f = checkify.checkify(
        lambda p: loss_fn(p, Y, model.config, model.layout, balance),
        errors=checkify.float_checks,
    )
    err, loss = f(model.params)
    err.throw()
    return float(loss)
