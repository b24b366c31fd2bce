"""Sharded particle-filter banks: data parallelism over independent filters.

The BASELINE multi-chip inference config is "64 simultaneous PFs x 1k
particles sharded across a v5e-8 slice".  Each bank is an independent filter
(own particles, own RNG stream) over a *shared* model posterior, so the
natural mapping is pure data parallelism: bank axis sharded over the mesh,
model state replicated, zero cross-device communication inside the scan.
XLA partitions the vmapped scan automatically from the input shardings —
no shard_map needed for a collective-free computation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GPMDMConfig, PFConfig
from ..filter import particle_filter as pf
from ..models import core


def shard_bank_state(states: pf.PFState, mesh: Mesh, axis: str = "dp") -> pf.PFState:
    """Place a bank-stacked PFState (leading bank axis on every leaf) with
    the bank axis sharded over ``axis``."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), states)


def pf_scan_bank_sharded(
    states: pf.PFState,
    Z: jax.Array,
    post: core.Posterior,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
    mesh: Mesh,
    axis: str = "dp",
):
    """Run B filter banks over (B, T, D) observations with the bank axis
    sharded across the mesh and model state replicated.

    Returns (final states, stacked outputs) with the same shardings.
    """
    bank_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    run = jax.jit(
        partial(pf.pf_scan_bank, cfg=cfg, pf_cfg=pf_cfg),
        in_shardings=(
            jax.tree.map(lambda _: bank_sh, states),
            bank_sh,
            jax.tree.map(lambda _: repl, post),
            jax.tree.map(lambda _: repl, params),
            repl,
        ),
        out_shardings=(
            jax.tree.map(lambda _: bank_sh, states),
            None,
        ),
    )
    Z = jax.device_put(jnp.asarray(Z), bank_sh)
    states = shard_bank_state(states, mesh, axis)
    post = jax.tree.map(lambda a: jax.device_put(a, repl), post)
    params = jax.tree.map(lambda a: jax.device_put(a, repl), params)
    log_T = jax.device_put(log_T, repl)
    return run(states, Z, post, params, log_T)


def pf_scan_bank_sharded_masked(
    states: pf.PFState,
    Z: jax.Array,
    valid: jax.Array,
    post: core.Posterior,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
    mesh: Mesh,
    axis: str = "dp",
):
    """Sharded banks over PADDED sequences: the multi-chip form of banked
    evaluation (utils.metrics.evaluate_pf_banked) — B variable-length
    trials padded to one bucket, one filter bank row per trial, bank axis
    sharded over the mesh, zero collectives.  ``valid`` is (B, T_pad)."""
    bank_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    run = jax.jit(
        partial(pf.pf_scan_bank_masked, cfg=cfg, pf_cfg=pf_cfg),
        in_shardings=(
            jax.tree.map(lambda _: bank_sh, states),
            bank_sh,
            bank_sh,
            jax.tree.map(lambda _: repl, post),
            jax.tree.map(lambda _: repl, params),
            repl,
        ),
        out_shardings=(
            jax.tree.map(lambda _: bank_sh, states),
            None,
        ),
    )
    Z = jax.device_put(jnp.asarray(Z), bank_sh)
    valid = jax.device_put(jnp.asarray(valid), bank_sh)
    states = shard_bank_state(states, mesh, axis)
    post = jax.tree.map(lambda a: jax.device_put(a, repl), post)
    params = jax.tree.map(lambda a: jax.device_put(a, repl), params)
    log_T = jax.device_put(log_T, repl)
    return run(states, Z, valid, post, params, log_T)
