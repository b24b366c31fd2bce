"""Pallas TPU kernels: fused GP posterior (star kernel -> mean + variance
quad term) without materializing intermediates in HBM.

The particle filter's per-frame cost is dominated by GP posteriors over all
particles (core.predict_y / predict_x_all_classes):

    Kstar = k(Xtrain, Xstar)               # (N, P)   ~N*P*4B in HBM
    mean  = Kstar^T @ A                    # (P, Dout)
    KiK   = Kinv @ Kstar                   # (N, P)   another N*P*4B
    quad  = sum(Kstar * KiK, axis=0)       # (P,)
    var   = kdiag - quad

XLA materializes Kstar and KiK in HBM (at N=480, P=10k that is ~19 MB each,
per frame, each way).  These kernels keep the whole pipeline in VMEM per
particle tile: compute the Kstar tile once, immediately contract it against
A and against Kinv row-tiles, and emit only the (P, Dout) mean and (P,)
quad.

STATUS (measured on v5e, P=10k, N in {1k, 2k, 4k} — tools/sweep_pallas_x.py):
with numerically-correct matmuls these kernels do NOT beat XLA's unfused
pipeline — the stage is MXU-bound, so the saved HBM traffic is hidden
behind the matmul passes, and at matching 3-pass 'high' precision the
in-kernel bf16 hi/lo emulation (``_mxu_dot``) adds cast overhead that XLA's
native HIGH avoids (dyn: 0.52 vs 0.42 ms at N=1024).  At 'highest' they are
a wash.  Round-1's reported fused wins came from Mosaic silently lowering
unqualified f32 dots to single-pass bf16 — fast but wrong (chance-level PF
accuracy on trained models).  The filter therefore defaults to the XLA
path everywhere (``PFConfig(pallas='auto')`` == off); ``pallas='on'``
keeps the kernels exercisable.

Two entry points share one kernel body:

- :func:`fused_rbf_posterior` — observation GP (unit-variance RBF,
  reference kernel at gpmdm.py:436-517),
- :func:`fused_x_posterior` — dynamics GP (RBF + homogeneous linear kernel,
  gpmdm.py:408-434) for one class block, with row masking for the padded
  class layout; callers unroll the (small) class axis.

Grid: (P // TP, N // TN).  For each particle tile, the first N-step computes
the full (Npad, TP) Kstar tile into VMEM scratch and the mean; subsequent
N-steps stream (TN, Npad) row-tiles of Kinv and accumulate the quad.
Padding is exact: padded training rows are masked to zero in the star
kernel (iota < n_valid), padded feature columns are zero.
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


def _canon_precision(precision):
    """Accept lax.Precision members, their string names ('high', ...), or
    None (-> HIGHEST).  String configs are the norm elsewhere in this repo;
    an un-canonicalized 'high' would compare unequal to Precision.HIGH,
    skip the 3-pass emulation, and crash in Mosaic on device while passing
    in CPU interpret mode."""
    if precision is None:
        return jax.lax.Precision.HIGHEST
    if isinstance(precision, str):
        return jax.lax.Precision(precision)
    return precision


def _mxu_dot(a, b, dims, precision):
    """f32 dot_general inside a Mosaic kernel at a chosen MXU pass count.

    Mosaic implements only DEFAULT (ONE bf16 pass — numerically far weaker
    than XLA's f32 default; see the module history) and HIGHEST (true f32)
    for f32 inputs; requesting HIGH raises NotImplementedError.  XLA-high's
    3-pass scheme is emulated here by hand: split each operand into a bf16
    hi part and a bf16 lo remainder and accumulate hi*hi + hi*lo + lo*hi in
    f32 — same error bound as XLA's HIGH at ~3x the speed of HIGHEST.
    """
    precision = _canon_precision(precision)
    d = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    if precision == jax.lax.Precision.HIGH:
        a_hi = a.astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))
    return d(a, b, precision=precision)


def _kernel(
    bias_ref,
    xs_ref,
    xt_ref,
    ls_ref,
    lt_ref,
    ay_ref,
    kinv_ref,
    mean_ref,
    quad_ref,
    kstar_ref,
    *,
    n_valid: int,
    n_dims: int,
    has_linear: bool,
    mxu_precision,
):
    """One (particle-tile, kinv-row-tile) grid step.

    bias_ref: (1, 1) SMEM linear-kernel bias (ignored unless has_linear)
    xs_ref:   (TP, dpad)   particle tile, pre-scaled by 1/lengthscale
    xt_ref:   (Npad, dpad) training inputs, pre-scaled, full
    ls_ref:   (TP, dpad)   particle linear features (pre-scaled by exp(c))
    lt_ref:   (Npad, dpad) training linear features
    ay_ref:   (Npad, Dpad) predictive weights, full
    kinv_ref: (TN, Npad)   row tile of Kinv
    mean_ref: (TP, Dpad)   out
    quad_ref: (TP, 128)    out (quad broadcast into lanes; col 0 is real)
    kstar_ref:(Npad, TP)   VMEM scratch holding this particle tile's Kstar
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _first():
        xs = xs_ref[:]  # (TP, dpad)
        xt = xt_ref[:]  # (Npad, dpad)
        # squared distance by direct per-dimension differences: the latent
        # dimension is tiny (d <= ~8), so this is a handful of VPU passes
        # and avoids the catastrophic cancellation of the norm-expansion
        # (|a|^2+|b|^2-2ab) that wrecks the variance term in f32.
        Npad, TP = xt.shape[0], xs.shape[0]
        sq = jnp.zeros((Npad, TP), dtype=jnp.float32)
        for k in range(n_dims):  # static unroll
            diff = xt[:, k][:, None] - xs[:, k][None, :]
            sq = sq + diff * diff
        ks = jnp.exp(-sq)
        if has_linear:
            lin = _mxu_dot(lt_ref[:], ls_ref[:], (((1,), (1,)), ((), ())), mxu_precision)
            ks = ks + lin + bias_ref[0, 0]
        # zero padded training rows (exact masked star kernel)
        Npad = ks.shape[0]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Npad, 1), 0)
        ks = jnp.where(row_ids < n_valid, ks, 0.0)
        kstar_ref[:] = ks
        mean_ref[:] = _mxu_dot(ks, ay_ref[:], (((0,), (0,)), ((), ())), mxu_precision)  # (TP, Dpad)
        quad_ref[:] = jnp.zeros_like(quad_ref)

    # accumulate quad over Kinv row tiles: rows i of this tile contribute
    # sum_p Kstar[i, p] * (Kinv[i, :] @ Kstar[:, p])
    TN = kinv_ref.shape[0]
    row0 = pl.program_id(1) * TN
    ki = kinv_ref[:]  # (TN, Npad)
    ks_rows = kstar_ref[pl.ds(row0, TN), :]  # (TN, TP)
    kik = _mxu_dot(ki, kstar_ref[:], (((1,), (0,)), ((), ())), mxu_precision)  # (TN, TP)
    contrib = jnp.sum(ks_rows * kik, axis=0)  # (TP,)
    quad_ref[:] += contrib[:, None]


# On-device validated default particle tiles, keyed by (kernel flavour,
# whether the emulated-HIGH bf16 hi/lo copies are live) -> {max Npad: tile}.
# Every entry ran on a v5e in tools/sweep_pallas_x.py / exp_quad_precision;
# shapes between entries use the next-larger bound's (smaller) tile.  An
# analytic VMEM model was tried twice and mispredicted Mosaic's true
# allocation in both directions (tile 512 runs at Npad=1024 but dies at
# 2048 where 256 runs; tile 128 dies at 4096 where 256 runs), so the
# defaults are pinned to measurements instead.
_VALIDATED_TILES = {
    # dynamics kernel (has_linear=True: lt/ls resident, 3 dots)
    ("x", False): {1024: 512, 2048: 256, 4096: 256},   # HIGHEST / DEFAULT
    ("x", True): {1024: 512},                          # emulated HIGH
    # observation kernels (no linear features)
    ("obs", False): {1024: 1024, 2048: 512},
    ("obs", True): {1024: 512, 2048: 512},
}


def _default_tile_p(
    Npad: int, mxu_precision=None, kernel: str = "x",
) -> int:
    """Pick the largest particle tile VALIDATED on-device for this shape.

    The table is keyed on Npad + precision + kernel flavour ONLY: the
    sweeps ran at dpad=Dpad=128 / tile_n=128 (the dimensions every
    current caller produces), so the defaults are NOT validated for other
    footprints — callers with wider D must pass explicit tile_p.

    See _VALIDATED_TILES.  Raises for shapes with no validated entry —
    direct kernel callers may still pass explicit ``tile_p``/``tile_n``
    (untested territory); particle-filter users should keep the default
    ``PFConfig(pallas='off'/'auto')`` — the XLA pipeline is the faster
    path at every measured shape anyway — or switch to the sparse family
    at this scale."""
    emulated = _canon_precision(mxu_precision) == jax.lax.Precision.HIGH
    table = _VALIDATED_TILES[(kernel, emulated)]
    for bound in sorted(table):
        if Npad <= bound:
            return table[bound]
    raise ValueError(
        f"no on-device-validated fused-kernel tiling for Npad={Npad} "
        f"({kernel} kernel, {'emulated-HIGH' if emulated else 'HIGHEST'} "
        f"dots; largest validated Npad is {max(table)}).  Use "
        f"PFConfig(pallas='off') — the XLA pipeline is the faster default "
        f"at every measured shape — or the sparse model family at this "
        f"scale; direct kernel callers may experiment via explicit "
        f"tile_p/tile_n"
    )


def _fused_posterior(
    xt, xs, lt, ls, bias, Ay, Kinv, n_valid: int, has_linear: bool,
    tile_p: int, tile_n: int, mxu_precision=None,
):
    """Shared padded pallas_call wrapper.  All feature inputs pre-scaled.

    ``mxu_precision`` sets the pass count of the in-kernel dot_generals.
    CRITICAL: Mosaic lowers an unqualified f32 dot_general to ONE bf16 MXU
    pass (unlike XLA, whose f32 default is numerically stronger) — measured
    mean errors ~1e-1 and variance errors that collapsed PF accuracy to
    chance before this was pinned (tools/check_pallas_numerics.py).
    Defaults to HIGHEST (6-pass true f32)."""
    mxu_precision = _canon_precision(mxu_precision)
    N, P, D = xt.shape[0], xs.shape[0], Ay.shape[1]
    d = xt.shape[1]
    f32 = jnp.float32

    Npad = _round_up(max(N, 1), max(tile_n, 128))
    Dpad = _round_up(max(D, 1), 128)
    dpad = _round_up(max(d, 1), 128)
    if tile_p == 0:  # adaptive default
        # always the "x" table: this wrapper keeps lt/ls resident even for
        # the pure-RBF entry point, so its footprint is the dynamics one
        tile_p = _default_tile_p(Npad, mxu_precision=mxu_precision, kernel="x")
    Ppad = _round_up(max(P, 1), tile_p)

    xt = jnp.pad(xt.astype(f32), ((0, Npad - N), (0, dpad - d)))
    xs = jnp.pad(xs.astype(f32), ((0, Ppad - P), (0, dpad - d)))
    lt = jnp.pad(lt.astype(f32), ((0, Npad - N), (0, dpad - d)))
    ls = jnp.pad(ls.astype(f32), ((0, Ppad - P), (0, dpad - d)))
    ay = jnp.pad(Ay.astype(f32), ((0, Npad - N), (0, Dpad - D)))
    kinv = jnp.pad(Kinv.astype(f32), ((0, Npad - N), (0, Npad - N)))
    bias2d = jnp.asarray(bias, dtype=f32).reshape(1, 1)

    grid = (Ppad // tile_p, Npad // tile_n)
    kernel = functools.partial(
        _kernel, n_valid=n_valid, n_dims=d, has_linear=has_linear,
        mxu_precision=mxu_precision,
    )
    mean, quad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_p, dpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Npad, dpad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
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
    )(bias2d, xs, xt, ls, lt, ay, kinv)
    return mean[:P, :D], quad[:P, 0]


def _obs_loglik_kernel(
    zl_ref,
    xs_ref,
    xt_ref,
    ay_ref,
    kinv_ref,
    quad_ref,
    qres_ref,
    kstar_ref,
    mean_ref,
    *,
    n_valid: int,
    n_dims: int,
    mxu_precision,
):
    """Fully-fused observation weighting: star kernel -> mean -> weighted
    residual + variance quad, all in VMEM.  The (P, D) posterior mean never
    reaches HBM; only two (P,) vectors leave the kernel.

    zl_ref:   (8, Dpad) row 0 = observation z, row 1 = lambda^2 (both
              zero-padded; padded dims contribute exactly 0 to the residual)
    xs_ref:   (TP, dpad)  particle tile, pre-scaled by 1/lengthscale
    xt_ref:   (Npad, dpad) training inputs, pre-scaled, full
    ay_ref:   (Npad, Dpad) predictive weights, full
    kinv_ref: (TN, Npad)  row tile of Kinv
    quad_ref: (TP, 128)   out: variance quad (col 0)
    qres_ref: (TP, 128)   out: sum_j lambda_j^2 (mean_j - z_j)^2 (col 0)
    kstar_ref:(Npad, TP)  VMEM scratch: this particle tile's Kstar
    mean_ref: (TP, Dpad)  VMEM scratch: this particle tile's posterior mean
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _first():
        xs = xs_ref[:]
        xt = xt_ref[:]
        Npad, TP = xt.shape[0], xs.shape[0]
        sq = jnp.zeros((Npad, TP), dtype=jnp.float32)
        for k in range(n_dims):  # static unroll; see _kernel for rationale
            diff = xt[:, k][:, None] - xs[:, k][None, :]
            sq = sq + diff * diff
        ks = jnp.exp(-sq)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Npad, 1), 0)
        ks = jnp.where(row_ids < n_valid, ks, 0.0)
        kstar_ref[:] = ks
        mean_ref[:] = _mxu_dot(ks, ay_ref[:], (((0,), (0,)), ((), ())), mxu_precision)
        quad_ref[:] = jnp.zeros_like(quad_ref)

    TN = kinv_ref.shape[0]
    row0 = j * TN
    ki = kinv_ref[:]
    ks_rows = kstar_ref[pl.ds(row0, TN), :]
    kik = _mxu_dot(ki, kstar_ref[:], (((1,), (0,)), ((), ())), mxu_precision)
    quad_ref[:] += jnp.sum(ks_rows * kik, axis=0)[:, None]

    @pl.when(j == pl.num_programs(1) - 1)
    def _last():
        z = zl_ref[0, :][None, :]  # (1, Dpad)
        lam2 = zl_ref[1, :][None, :]  # (1, Dpad)
        diff = mean_ref[:] - z  # (TP, Dpad); exact residual, no cancellation
        qres = jnp.sum(lam2 * diff * diff, axis=1)[:, None]
        qres_ref[:] = jnp.broadcast_to(qres, qres_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("tile_p", "tile_n", "mxu_precision")
)
def fused_obs_loglik(
    Xtrain: jax.Array,
    Xstar: jax.Array,
    Ay: jax.Array,
    Kinv: jax.Array,
    inv_lengthscales: jax.Array,
    z: jax.Array,
    lam2: jax.Array,
    tile_p: int = 0,
    tile_n: int = 128,
    mxu_precision=None,
):
    """Fused observation-weighting pass: (quad (P,), qres (P,)).

    quad = sum(Kstar * (Kinv Kstar), 0)           (variance quad term)
    qres = sum_j lambda_j^2 (mean_j - z_j)^2      (weighted residual)
    with mean = Kstar^T Ay computed in VMEM and never materialized in HBM
    (the unfused path writes a (P, Dpad) mean per frame — ~5 MB at P=10k).
    The caller turns these into the diagonal-Gaussian log-likelihood:
    ll = -qres/(2 var_c) - coeff*(D log var_c - 2 sum log lambda) - const,
    var_c = kdiag - quad.
    """
    N, P, D = Xtrain.shape[0], Xstar.shape[0], Ay.shape[1]
    d = Xtrain.shape[1]
    f32 = jnp.float32

    Npad = _round_up(max(N, 1), max(tile_n, 128))
    Dpad = _round_up(max(D, 1), 128)
    dpad = _round_up(max(d, 1), 128)
    mxu_precision = _canon_precision(mxu_precision)
    if tile_p == 0:
        tile_p = _default_tile_p(Npad, mxu_precision=mxu_precision, kernel="obs")
    Ppad = _round_up(max(P, 1), tile_p)

    xt = jnp.pad((Xtrain * inv_lengthscales).astype(f32),
                 ((0, Npad - N), (0, dpad - d)))
    xs = jnp.pad((Xstar * inv_lengthscales).astype(f32),
                 ((0, Ppad - P), (0, dpad - d)))
    ay = jnp.pad(Ay.astype(f32), ((0, Npad - N), (0, Dpad - D)))
    kinv = jnp.pad(Kinv.astype(f32), ((0, Npad - N), (0, Npad - N)))
    zl = jnp.zeros((8, Dpad), dtype=f32)
    zl = zl.at[0, :D].set(z.astype(f32))
    zl = zl.at[1, :D].set(lam2.astype(f32))

    grid = (Ppad // tile_p, Npad // tile_n)
    kernel = functools.partial(
        _obs_loglik_kernel, n_valid=N, n_dims=d, mxu_precision=mxu_precision
    )
    quad, qres = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, Dpad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, dpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Npad, dpad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Npad, Dpad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, Npad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_p, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Ppad, 128), f32),
            jax.ShapeDtypeStruct((Ppad, 128), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Npad, tile_p), f32),
            pltpu.VMEM((tile_p, Dpad), f32),
        ],
    )(zl, xs, xt, ay, kinv)
    return quad[:P, 0], qres[:P, 0]


@functools.partial(
    jax.jit, static_argnames=("tile_p", "tile_n", "mxu_precision")
)
def fused_rbf_posterior(
    Xtrain: jax.Array,
    Xstar: jax.Array,
    Ay: jax.Array,
    Kinv: jax.Array,
    inv_lengthscales: jax.Array,
    tile_p: int = 0,
    tile_n: int = 128,
    mxu_precision=None,
):
    """Fused observation-GP posterior: (mean (P, D), quad (P,)).

    tile_p=0 selects the on-device-validated default tile for the shape
    (see _VALIDATED_TILES; raises where none exists).

    mean = Kstar^T Ay,  quad = sum(Kstar * (Kinv Kstar), 0) with
    Kstar = exp(-sum_k ((xt-xs)/l)^2).  Equivalent to the unfused XLA path
    in core.predict_y (tested); var = kdiag - quad is applied by the caller.
    """
    xt = Xtrain * inv_lengthscales
    xs = Xstar * inv_lengthscales
    zeros_t = jnp.zeros_like(xt)
    zeros_s = jnp.zeros_like(xs)
    return _fused_posterior(
        xt, xs, zeros_t, zeros_s, 0.0, Ay, Kinv,
        n_valid=Xtrain.shape[0], has_linear=False,
        tile_p=tile_p, tile_n=tile_n, mxu_precision=mxu_precision,
    )


@functools.partial(
    jax.jit, static_argnames=("n_valid", "tile_p", "tile_n", "mxu_precision")
)
def fused_x_posterior(
    Xin_c: jax.Array,
    Xstar: jax.Array,
    Axc: jax.Array,
    Kxc_inv: jax.Array,
    inv_lengthscales: jax.Array,
    lin_w: jax.Array,
    n_valid: int,
    tile_p: int = 0,
    tile_n: int = 128,
    mxu_precision=None,
):
    """Fused dynamics-GP posterior for ONE class block: (mean (P, d),
    quad (P,)).

    Star kernel = RBF + homogeneous linear ([x,1] diag(w^2) [x',1]^T,
    reference gpmdm.py:520-548); ``lin_w = exp(x_log_lin_coeff)`` with the
    last entry the bias weight.  Star-kernel rows >= n_valid are masked to
    exactly zero.  Callers unroll the small class axis.

    Padding contract: callers whose valid count is only known as a traced
    value (e.g. the particle filter) pass ``n_valid = Xin_c.shape[0]``
    (mask disabled) and instead rely on ``core.precompute`` zero-padding
    ``Axc``/``Kxc_inv`` beyond the class's true pair count — zero weight
    rows annihilate the unmasked star-kernel rows, giving the same result.
    If that padding invariant ever changes, those call sites break.
    """
    xt = Xin_c * inv_lengthscales
    xs = Xstar * inv_lengthscales
    lt = Xin_c * lin_w[:-1]
    ls = Xstar * lin_w[:-1]
    bias = lin_w[-1] ** 2
    # linear features: lin = sum_k (w_k x_k)(w_k x'_k) needs both sides
    # scaled by w, i.e. lt@ls^T = sum w_k^2 x x'.
    return _fused_posterior(
        xt, xs, lt, ls, bias, Axc, Kxc_inv,
        n_valid=n_valid, has_linear=True,
        tile_p=tile_p, tile_n=tile_n, mxu_precision=mxu_precision,
    )
