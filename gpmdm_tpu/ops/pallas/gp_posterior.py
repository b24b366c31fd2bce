"""Pallas TPU kernel: fused GP posterior (RBF star kernel -> mean + variance
quad term) without materializing intermediates in HBM.

The particle filter's per-frame cost is dominated by the observation-GP
posterior over all particles (core.predict_y):

    Kstar = exp(-wsqdist(X, Xstar))        # (N, P)   ~N*P*4B in HBM
    mean  = Kstar^T @ Ay                   # (P, D)
    KiK   = Kinv @ Kstar                   # (N, P)   another N*P*4B
    quad  = sum(Kstar * KiK, axis=0)       # (P,)
    var   = kdiag - quad

XLA materializes Kstar and KiK in HBM (~2 * N * P * 4 bytes per frame; at
N=480, P=10k that is ~38 MB each frame each way).  This kernel keeps the
whole pipeline in VMEM per particle tile: compute the Kstar tile once,
immediately contract it against Ay and against Kinv row-tiles, and emit only
the (P, D) mean and (P,) quad.

Grid: (P // TP, N // TN).  For each particle tile, the first N-step computes
the full (N, TP) Kstar tile into VMEM scratch and the mean; subsequent
N-steps stream (TN, N) row-tiles of Kinv and accumulate the quad.

Shapes are padded to multiples of the tile sizes by the wrapper; padded
training rows carry +inf squared distance (Kstar exactly 0), so padding is
exact.  f32 throughout with MXU accumulation in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(xs_ref, xt_ref, ay_ref, kinv_ref, mean_ref, quad_ref, kstar_ref):
    """One (particle-tile, kinv-row-tile) grid step.

    xs_ref:   (TP, dpad)  particle tile (pre-scaled by 1/lengthscale)
    xt_ref:   (Npad, dpad) training latents (pre-scaled), full
    ay_ref:   (Npad, Dpad) predictive weights, full
    kinv_ref: (TN, Npad)  row tile of Kinv
    mean_ref: (TP, Dpad)  out
    quad_ref: (TP, 128)   out (quad broadcast into lane dim; col 0 is real)
    kstar_ref:(Npad, TP)  VMEM scratch holding this particle tile's Kstar
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _first():
        xs = xs_ref[:]  # (TP, dpad)
        xt = xt_ref[:]  # (Npad, dpad)
        # weighted squared distances via the norm expansion; inputs are
        # pre-scaled so this is a plain sqdist.
        xs2 = jnp.sum(xs * xs, axis=1)[None, :]  # (1, TP)
        xt2 = jnp.sum(xt * xt, axis=1)[:, None]  # (Npad, 1)
        cross = jax.lax.dot_general(
            xt, xs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Npad, TP)
        ks = jnp.exp(2.0 * cross - xs2 - xt2)  # exp(-|a-b|^2)
        kstar_ref[:] = ks
        mean_ref[:] = jax.lax.dot_general(
            ks, ay_ref[:], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TP, Dpad)
        quad_ref[:] = jnp.zeros_like(quad_ref)

    # accumulate quad over Kinv row tiles: rows i of this tile contribute
    # sum_p Kstar[i, p] * (Kinv[i, :] @ Kstar[:, p])
    TN = kinv_ref.shape[0]
    row0 = pl.program_id(1) * TN
    ki = kinv_ref[:]  # (TN, Npad)
    ks_rows = kstar_ref[pl.ds(row0, TN), :]  # (TN, TP)
    kik = jax.lax.dot_general(
        ki, kstar_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TN, TP)
    contrib = jnp.sum(ks_rows * kik, axis=0)  # (TP,)
    quad_ref[:] += contrib[:, None]


@functools.partial(jax.jit, static_argnames=("tile_p", "tile_n"))
def fused_rbf_posterior(
    Xtrain: jax.Array,
    Xstar: jax.Array,
    Ay: jax.Array,
    Kinv: jax.Array,
    inv_lengthscales: jax.Array,
    tile_p: int = 512,
    tile_n: int = 256,
):
    """Fused RBF-GP posterior: returns (mean (P, D), quad (P,)).

    mean = Kstar^T Ay,  quad = sum(Kstar * (Kinv Kstar), 0) with
    Kstar = exp(-sum_k ((xt-xs)/l)^2).  Equivalent to the unfused XLA path
    in core.predict_y (tested); var = kdiag - quad is applied by the caller.
    """
    N, d = Xtrain.shape
    P = Xstar.shape[0]
    D = Ay.shape[1]
    f32 = jnp.float32

    Npad = _round_up(N, max(tile_n, 128))
    Ppad = _round_up(P, tile_p)
    Dpad = _round_up(D, 128)
    dpad = _round_up(d, 128)

    xt = (Xtrain * inv_lengthscales).astype(f32)
    xs = (Xstar * inv_lengthscales).astype(f32)
    # pad training rows far away -> Kstar exactly 0 there (exp(-big)).
    xt = jnp.pad(xt, ((0, Npad - N), (0, dpad - d)))
    if Npad > N:
        xt = xt.at[N:, 0].set(1e6)
    xs = jnp.pad(xs, ((0, Ppad - P), (0, dpad - d)))
    ay = jnp.pad(Ay.astype(f32), ((0, Npad - N), (0, Dpad - D)))
    kinv = jnp.pad(Kinv.astype(f32), ((0, Npad - N), (0, Npad - N)))

    grid = (Ppad // tile_p, Npad // tile_n)
    mean, quad = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, dpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Npad, dpad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Npad, Dpad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, Npad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_p, Dpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Ppad, Dpad), f32),
            jax.ShapeDtypeStruct((Ppad, 128), f32),
        ],
        scratch_shapes=[pltpu.VMEM((Npad, tile_p), f32)],
    )(xs, xt, ay, kinv)
    return mean[:P, :D], quad[:P, 0]
