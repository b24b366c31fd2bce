"""Switching-state particle filter over a trained GPMDM.

TPU-native re-design of the reference ``GPMDM_PF``
(`/root/reference/gpmdm/gpmdm_pf.py`): the same four-stage update —

1. Markov class transition   (reference _propogate_markov_switching, :137)
2. per-class GP dynamics propagation  (_propogate_dynamics, :153)
3. Gaussian observation weighting     (_update_weights, :170)
4. resampling                          (_resample, :206)

— but with every stage fully vectorized over particles:

- the per-class Python gather loop (gpmdm_pf.py:158-168) becomes one batched
  per-class GP evaluation for *all* particles x *all* classes (a single
  einsum; C is small, so computing all class predictions and selecting by
  particle class is cheaper than any dynamic gather on TPU — the
  expert-parallel pattern),
- the per-particle likelihood Python loop (gpmdm_pf.py:188-192, the
  reference's bottleneck) becomes one batched diagonal-Gaussian log-pdf,
- resampling defaults to systematic (single sorted-uniform pass, O(P),
  deterministic layout) with multinomial available for reference parity,
- a whole trial streams through ``lax.scan`` (:func:`pf_scan`), and banks of
  independent filters vmap over a leading axis (:func:`pf_scan_bank`).

Readouts (class posterior, observation log-likelihood, state mean) are
computed *before* resampling each step, so particle states/classes and the
likelihood weights they are paired with are coherent.  This is a **fixed
deviation** from the reference: its readouts, called after ``update()``,
pair POST-resample ``_particle_classes``/``_particle_states`` with
PRE-resample ``_log_likelihoods``/``_log_weights`` (``_resample`` permutes
the particles but not the weight arrays, gpmdm_pf.py:206-262).  In
expectation the two agree (resampling draws from the weighted distribution),
but per-step values differ; see docs/PARITY.md.

Known reference quirks, handled via PFConfig flags (see config.py):
- double-counted log-determinant in the observation likelihood
  (gpmdm_pf.py:189-191) -> ``compat_double_logdet``;
- weights reset to the current likelihood each frame instead of accumulating
  (gpmdm_pf.py:198-200) -> ``accumulate_weights``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GPMDMConfig, PFConfig
from ..models import core

_LOG_2PI = math.log(2.0 * math.pi)
_PREC = jax.lax.Precision.HIGHEST


def _use_pallas(post, pf_cfg, stage: str = "dyn") -> bool:
    """Fused-kernel policy: 'on' forces it (exact posterior only); 'auto'
    currently selects the XLA pipeline EVERYWHERE.  ``stage`` ('dyn' or
    'obs') names the pipeline stage being gated — the policy is identical
    for both (tests monkeypatch this to isolate one fused stage).

    Round-1's measured "fused wins at N >= 1k" was an artifact: Mosaic
    silently lowered the kernels' f32 dot_generals to single-pass bf16
    (fast but wrong — chance-level PF accuracy on trained models).  With
    correct math (tools/sweep_pallas_x.py, v5e, P=10k): at matching 3-pass
    'high' precision the fused kernels LOSE to XLA's unfused pipeline
    (dyn 0.52 vs 0.42 ms at N=1024; obs 1.60 vs 1.53 ms at N=2048) — the
    stage is MXU-bound, so fusing the (N, P) intermediates out of HBM buys
    less than the in-kernel cast overhead costs; at 'highest' it is a wash
    (0.88 vs 0.85 ms).  'on' remains available for experimentation — note
    that on models trained to near-singular posteriors (predictive
    var_common ~1e-4..1e-3) even the corrected fused weighting measures a
    frame-accuracy penalty vs XLA (0.72 vs 0.92 on the bench asset): at
    variances this sharp the two paths' f32 error patterns pick different
    winning particles, and the XLA pipeline is the arbitrated default."""
    if pf_cfg.pallas == "on":
        return isinstance(post, core.Posterior)
    return False


def _predictors(post):
    """Posterior-backend dispatch: the filter runs unchanged on the exact GP
    posterior (core.Posterior), the sparse SGPR posterior
    (sparse.SparsePosterior), or the low-rank-quad compressed posterior
    (compressed.CompressedPosterior) — all expose the same (mean, per-dim
    var) prediction contract.  Resolved at trace time (type check, no
    runtime branch)."""
    if isinstance(post, core.Posterior):
        return core.predict_y, core.predict_x_all_classes
    from ..models import compressed, sparse

    if isinstance(post, sparse.SparsePosterior):
        return sparse.predict_y, sparse.predict_x_all_classes
    if isinstance(post, compressed.CompressedPosterior):
        return compressed.predict_y, compressed.predict_x_all_classes
    raise TypeError(f"unknown posterior backend: {type(post)!r}")


def _effective_quad_precision(pf_cfg: "PFConfig", post):
    """Variance-quad precision handed to the posterior backend.

    Explicit ``PFConfig.quad_precision`` always wins ('trisolve' maps to
    None = the sparse backends' per-frame triangular-solve path; the
    exact/compressed backends treat it like unset).  With it UNSET, a
    post-hoc DISTILLED sparse posterior (``post.distilled``, static)
    defaults to the hoisted-inverse 'high' matmul path: the round-5
    interleaved grid measured it faster AND more accurate than tri-solve
    at every particle count on distilled deployments (10k: 4020 fps /
    guard 1.0 vs 3576 / 0.9758; 100k: 540 / 1.0 vs 417 / 0.9682 —
    docs/BENCHMARKS.md "distilled quad-precision grid"), while the
    natively-trained sparse FAMILY regresses under it (hourlong 0.9994 ->
    0.9817, round 4) and keeps tri-solve.  Resolved at trace time
    (``distilled`` is static metadata, no runtime branch)."""
    if pf_cfg.quad_precision is None and getattr(post, "distilled", False):
        return jax.lax.Precision.HIGH
    return pf_cfg.lax_quad_precision


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PFState:
    """Particle filter state (reference gpmdm_pf.py:78-82).

    ``x_prev`` carries x(t-1) for dyn_back_step=2 models (the reference PF
    silently assumes back_step=1; we support both).
    """

    x: jax.Array  # (P, d) latent states
    x_prev: jax.Array  # (P, d) previous latent states
    c: jax.Array  # (P,) int32 class of each particle
    log_w: jax.Array  # (P,) normalized log weights
    log_lik: jax.Array  # (P,) observation log-likelihood of each particle
    key: jax.Array  # PRNG key


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PFOutputs:
    """Per-step readouts."""

    class_probs: jax.Array  # (C,) posterior class probabilities
    log_likelihood: jax.Array  # () max-shifted weighted likelihood sum (reference
    # log_likelihood semantics: linear-space, correct only up to the max shift)
    state_mean: jax.Array  # (d,) weighted mean latent state
    most_likely_class: jax.Array  # () int32 argmax of class_probs


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PFNoise:
    """One frame's pre-generated randomness (see ``_pregen_noise``).

    Bit-identical to what ``pf_step`` would draw itself from
    ``state.key``: the key chain is pre-split outside the scan and the
    per-frame draws are vmapped over the chain's keys.  Per-frame RNG
    inside the scan measured ~0.05 ms/frame at P=10k (per-call threefry
    overhead, ~1.6 ns/value vs the bulk rate); hoisting the generation
    out of the scan amortizes it to near zero.
    """

    next_key: jax.Array  # the post-split carry key (becomes state.key)
    u_trans: jax.Array  # (P,) transition uniforms
    eps_dyn: jax.Array  # (P, d) dynamics-propagation normals
    k_res: jax.Array  # PRNG key for resampling


def _pregen_noise(key, T: int, P: int, d: int, dtype, trans_dtype=None) -> PFNoise:
    """Pre-generate T frames of PF randomness from ``key``'s split chain.

    Produces exactly the values T sequential ``pf_step`` calls would draw
    (tests/test_pf.py pins scan == sequential steps).  ``trans_dtype`` is
    the dtype the in-scan path draws its transition uniforms in (log_T's
    dtype via cum_T) — threading it through keeps the bit-identical
    pregen/in-scan guarantee even when log_T's dtype differs from the
    particle state's (ADVICE r2)."""
    if trans_dtype is None:
        trans_dtype = dtype

    def chain(k, _):
        k2, kt, kd, kr = jax.random.split(k, 4)
        return k2, (k2, kt, kd, kr)

    _, (next_keys, kts, kds, krs) = jax.lax.scan(chain, key, None, length=T)
    U = jax.vmap(lambda k: jax.random.uniform(k, (P,), dtype=trans_dtype))(kts)
    E = jax.vmap(lambda k: jax.random.normal(k, (P, d), dtype=dtype))(kds)
    return PFNoise(next_key=next_keys, u_trans=U, eps_dyn=E, k_res=krs)


# Above this many bytes of pre-generated noise, pf_scan falls back to
# in-scan RNG (T * P * (d + 1) * itemsize; ~1.5 GB keeps even
# 100k-particle 1000-frame f32 scans comfortably inside HBM).
_PREGEN_NOISE_MAX_BYTES = 1_500_000_000
# Below this particle count, in-scan RNG wins: a small-P step is
# overhead-bound and the extra per-frame noise slices from HBM cost more
# than the hoisted threefry saves (measured on v5e: 64x1k vmapped banks
# 20.3k agg fps in-scan vs 18.7k pregen; P=10k single filter 2892
# in-scan vs 2986 pregen).  Values are bit-identical either way.
_PREGEN_MIN_P = 4096


def _init_classes(num_particles: int, n_classes: int) -> np.ndarray:
    """Split particles evenly across classes; first ``P mod C`` classes get
    one extra (reference _divide_into_n_parts, gpmdm_pf.py:287-292)."""
    base, rem = divmod(num_particles, n_classes)
    counts = [base + (1 if i < rem else 0) for i in range(n_classes)]
    return np.repeat(np.arange(n_classes, dtype=np.int32), counts)


def pf_init(
    post: core.Posterior,
    y_class_offsets: np.ndarray,
    key: jax.Array,
    pf_cfg: PFConfig,
) -> PFState:
    """Initialize particles by sampling latent points (with replacement) from
    each class's training data (reference _init_particles,
    gpmdm_pf.py:87-115)."""
    P = pf_cfg.num_particles
    C = len(y_class_offsets) - 1
    classes = jnp.asarray(_init_classes(P, C))
    lo = jnp.asarray(y_class_offsets[:-1])[classes]  # (P,)
    count = jnp.asarray(np.diff(y_class_offsets))[classes]  # (P,)
    key, sub = jax.random.split(key)
    u = jax.random.uniform(sub, (P,))
    idx = lo + jnp.floor(u * count).astype(jnp.int32)
    x = post.X[idx]
    return PFState(
        x=x,
        x_prev=x,
        c=classes,
        log_w=jnp.full((P,), -jnp.log(float(P)), dtype=x.dtype),
        log_lik=jnp.zeros((P,), dtype=x.dtype),
        key=key,
    )


def _select_by_class(per_class: jax.Array, c: jax.Array) -> jax.Array:
    """Select per-particle rows from a (C, P, d) array by class index -> (P, d).

    One-hot broadcast-multiply-reduce instead of take_along_axis: C is
    tiny, and TPU runs the dense elementwise+sum on the VPU far faster than
    a per-row dynamic gather.  (Written as an explicit broadcast, NOT an
    einsum with p as a batch axis — that can lower to P tiny batched
    matmuls.)"""
    onehot = jax.nn.one_hot(c, per_class.shape[0], dtype=per_class.dtype)  # (P, C)
    sel = per_class * onehot.T[:, :, None]  # (C, P, d)
    return jnp.sum(sel, axis=0)


def observation_log_lik(
    z: jax.Array, mean: jax.Array, var: jax.Array, D: int, compat_double_logdet: bool
) -> jax.Array:
    """Batched diagonal-Gaussian observation log-likelihood (vectorized form
    of the reference per-particle loop, gpmdm_pf.py:188-192)."""
    quad = jnp.sum((z[None, :] - mean) ** 2 / var, axis=1)
    logdet = jnp.sum(jnp.log(var), axis=1)
    logdet_coeff = 1.0 if compat_double_logdet else 0.5
    return -0.5 * quad - logdet_coeff * logdet - 0.5 * D * _LOG_2PI


# Tile width of the MXU rank computation below; k=128 (one MXU tile) won
# the sweep at every P in {4k..100k} (tools/exp_resample_mxu.py).
_RANK_TILE_K = 128


#: Particle count at or above which the weight cumsum inside
#: ``systematic_resample_indices`` runs as the two-level MXU form
#: (``_blocked_cumsum``) instead of ``jnp.cumsum``: at extreme P the
#: single-lane cumsum is multi-pass VPU glue (round-4 VERDICT #3 stage
#: attribution), while two tiny triangular matmuls + a K-length cumsum
#: do the same adds on the MXU.  Below this the lowering difference is
#: noise; keeping small-P on jnp.cumsum preserves the f64 golden streams.
_BLOCKED_CUMSUM_MIN_P = 32_768


def _blocked_cumsum(w: jax.Array) -> jax.Array:
    """Inclusive cumsum of a (P,) vector as a two-level blocked form:
    within-block inclusive sums via a (k, k) upper-triangular 0/1 matmul
    on the MXU (f32 accumulate at HIGHEST precision — same adds as the
    lane cumsum, reassociated), plus an exclusive cumsum of the K block
    totals.  Exact up to f32 reassociation."""
    P = w.shape[0]
    k = _RANK_TILE_K
    K = -(-P // k)
    Wb = jnp.pad(w, (0, K * k - P)).reshape(K, k)
    U = jnp.triu(jnp.ones((k, k), dtype=w.dtype))
    within = jax.lax.dot(Wb, U, precision=_PREC)  # (K, k) inclusive
    totals = within[:, -1]
    offs = jnp.cumsum(totals) - totals  # (K,) exclusive block offsets
    return (within + offs[:, None]).reshape(K * k)[:P]


def systematic_resample_indices(
    key: jax.Array, log_w: jax.Array, w: jax.Array | None = None
) -> jax.Array:
    """Systematic (low-variance) resampling: one uniform draw, equally
    spaced positions, one sorted-vs-sorted rank computation.  TPU-friendly
    replacement for per-frame multinomial resampling (reference
    gpmdm_pf.py:206-213).

    The rank computation ``idx_i = #{j : cum_j < (u+i)/P}`` is lowering-
    sensitive on TPU.  ``jnp.searchsorted`` default binary search is
    log2(P) rounds of dynamic gathers (~1.1 ms/frame at P=10k); 'sort' is
    one merge-sort (~2.2 ms at P=100k); 'compare_all' — dense (P, P)
    comparisons on the VPU — was the round-2 default (~0.12 ms at 10k).

    The adopted lowering runs the counting on the MXU, exactly.  The
    count of systematic positions strictly below cum_j is
    ``s_j = floor(P*cum_j - u) + 1`` (u > 0 makes ties measure-zero), so
    ``idx_i = #{j : s_j <= i}``.  Factor targets as i = m*k + t:

        idx[m*k + t] = C[m] + (A @ B)[m, t]
        A[m, j] = [s_j // k == m]   (K x P, 0/1)
        B[j, t] = [s_j %  k <= t]   (P x k, 0/1)
        C[m]    = exclusive-cumsum of (A @ B)[:, k-1]   (block totals)

    A 0/1 matmul is EXACT on the MXU even at bf16 (products are 0/1,
    counts <= P << 2^24 accumulate in f32), so this rides the fast path
    that is a correctness trap for the posterior matmuls.  Measured on
    v5e in a scan context (tools/exp_resample_mxu.py): 0.033 ms at
    P=10k (3.7x compare_all) and 0.26 ms at P=100k (3.5x the
    histogram-scatter alternative, 8.6x 'sort').  Identical indices to
    searchsorted on every input (tests/test_pf.py)."""
    P = log_w.shape[0]
    k = _RANK_TILE_K
    # w/cum/s in at least f32 regardless of the model dtype: for bf16
    # weights, P*cum at P >= 1k is not representable (integers above 256
    # quantize in steps of up to 64) and the resulting ranks would skew
    # systematically.  promote_types (not a blanket f32 cast) keeps the
    # f32/f64 streams bit-identical to before (golden e2e pins them); the
    # 0/1 matmul below already runs bf16/f32, so this costs nothing.
    ct = jnp.promote_types(log_w.dtype, jnp.float32)
    if w is None:
        w = jax.nn.softmax(log_w.astype(ct))
    else:
        # caller-supplied normalized weights (pf_step already computes
        # exp(log_w - lse) for its readouts): skips a redundant
        # max+exp+sum+divide over P lanes per frame (round-4 VERDICT #3).
        # Sum may be 1 +- a few ulps instead of softmax's exact renorm —
        # the rank computation below clips s into [0, P], so a trailing
        # half-step of drift cannot push an index out of range.
        w = w.astype(ct)
    # the cumsum over P lanes is multi-pass VPU glue at extreme P; at
    # P >= _BLOCKED_CUMSUM_MIN_P do the same adds as two tiny MXU
    # triangular matmuls + a K-length cumsum (reassociated, f32-exact
    # scale: weights are <= 1 and counts << 2^24)
    if P >= _BLOCKED_CUMSUM_MIN_P:
        cum = _blocked_cumsum(w)
    else:
        cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=ct)
    s = jnp.clip(jnp.floor(P * cum - u).astype(jnp.int32) + 1, 0, P)
    K = -(-P // k)
    A = (s[None, :] // k == jnp.arange(K, dtype=jnp.int32)[:, None]).astype(
        jnp.bfloat16
    )
    B = ((s % k)[:, None] <= jnp.arange(k, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16
    )
    F = jax.lax.dot(A, B, preferred_element_type=jnp.float32)
    C = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(F[:, -1])[:-1]]
    )
    idx = (C[:, None] + F).reshape(K * k)[:P]
    return jnp.clip(idx, 0, P - 1).astype(jnp.int32)


def multinomial_resample_indices(key: jax.Array, log_w: jax.Array) -> jax.Array:
    """Multinomial resampling (reference parity, gpmdm_pf.py:211)."""
    P = log_w.shape[0]
    return jax.random.categorical(key, log_w, shape=(P,)).astype(jnp.int32)


@jax.custom_batching.custom_vmap
def _packed_gather(packed: jax.Array, idx: jax.Array) -> jax.Array:
    """The resample gather, with a bank-aware batching rule.

    Unbatched this is a plain row gather.  Under the bank vmap
    (pf_scan_bank), XLA's default batched-gather lowering costs ~3x the
    linear scaling of the single-filter gather; rewriting the batch as ONE
    flat (B*P)-row gather with per-bank index offsets measured 0.094 ->
    0.061 ms/bank-frame at 12 x 10k on v5e (tools/exp_sorted_gather.py
    --flat; `indices_are_sorted` hints measured no effect)."""
    return packed[idx]


@_packed_gather.def_vmap
def _packed_gather_vmap(axis_size, in_batched, packed, idx):
    packed_b, idx_b = in_batched
    if not idx_b:
        idx = jnp.broadcast_to(idx[None], (axis_size,) + idx.shape)
    if not packed_b:
        # shared particles, per-bank indices: nothing to flatten without
        # materializing B copies — keep the batched gather
        return jax.vmap(lambda i: packed[i])(idx), True
    B, P = idx.shape[0], idx.shape[1]
    flat_idx = (
        idx + (jnp.arange(B, dtype=idx.dtype) * P)[:, None]
    ).reshape(B * P)
    flat = packed.reshape((B * P,) + packed.shape[2:])[flat_idx]
    return flat.reshape((B, P) + packed.shape[2:]), True


@jax.custom_batching.custom_vmap
def _packed_gather_sorted(packed: jax.Array, idx: jax.Array) -> jax.Array:
    """_packed_gather for MONOTONE indices (systematic resampling: idx_i
    is a cumulative count, nondecreasing, clipped in-bounds).  The
    sorted+in-bounds hints measured -15% on an ISOLATED (P=100k, 8)
    gather (0.404 vs 0.474 ms) but neutral inside the full compiled step
    (535.8 vs 532.7 fps at 100k — the step overlaps the gather) and
    neutral at 10k banked (tools/exp_sorted_gather.py).  Kept: valid,
    free, and the isolated win says it can matter when the surrounding
    overlap changes.  Multinomial indices are NOT sorted; pf_step
    dispatches on the resampling mode."""
    return packed.at[idx].get(indices_are_sorted=True, mode="promise_in_bounds")


@_packed_gather_sorted.def_vmap
def _packed_gather_sorted_vmap(axis_size, in_batched, packed, idx):
    # same flat-bank rule as _packed_gather_vmap (bank offsets preserve
    # monotonicity within the flattened index vector)
    packed_b, idx_b = in_batched
    if not idx_b:
        idx = jnp.broadcast_to(idx[None], (axis_size,) + idx.shape)
    if not packed_b:
        return jax.vmap(
            lambda i: packed.at[i].get(
                indices_are_sorted=True, mode="promise_in_bounds"
            )
        )(idx), True
    B, P = idx.shape[0], idx.shape[1]
    flat_idx = (
        idx + (jnp.arange(B, dtype=idx.dtype) * P)[:, None]
    ).reshape(B * P)
    flat = packed.reshape((B * P,) + packed.shape[2:]).at[flat_idx].get(
        indices_are_sorted=True, mode="promise_in_bounds"
    )
    return flat.reshape((B, P) + packed.shape[2:]), True


#: Training-set size beyond which the exact posterior's f32 'high'-precision
#: quad matmul has a MEASURED accuracy collapse (Ny=5120: 0.547 frame
#: accuracy vs 1.000 for quad_precision='highest' or the compressed
#: posterior; docs/DEPLOY.md, docs/BENCHMARKS.md round 3).
_EXACT_QUAD_SAFE_N = 4096

#: Training-set size above which ``posterior='auto'`` deploys the exact
#: model through the compressed posterior (models/compressed.py): measured
#: 2.5x at Ny=2048 and 8x-at-better-accuracy at Ny=5120 (docs/DEPLOY.md).
#: Below it the exact quad is cheap and most accurate.
AUTO_COMPRESS_N = 1024

#: FLOP-parity bound for the auto policy: the compressed quad costs two
#: O(N q P) matmuls vs the exact quad's one O(N^2 P), so past q = N/2
#: compression mathematically cannot pay — 'auto' falls back to exact
#: there (a ~identity Gram, e.g. near-zero lengthscales).
AUTO_COMPRESS_MAX_Q_FRAC = 0.5

#: Flat-spectrum advisory band: q/N above this still compresses (measured
#: 1.5x at q/N=0.25 — consistent with the 2q/N FLOP ratio — and on the
#: healthy c8n5120 asset compressed also WON accuracy, 0.995 vs 0.9456
#: exact), but a rank this high usually means an early-stopped or
#: drifting model, so 'auto' warns that an accuracy guard is advised.
#: Round-3 history: this threshold briefly acted as an exact-fallback
#: gate, justified by ONE degenerate asset (the c8n5120 s60 cut, where
#: compression lost 0.07 accuracy); the healthy retrain at the same q/N
#: inverted the sign, and past Ny~4k exact-f32 carries its own measured
#: collapse risk (_EXACT_QUAD_SAFE_N) — so the fallback was demoted to
#: this advisory.  docs/BENCHMARKS.md "BASELINE configs at literal scale".
AUTO_COMPRESS_FLAT_Q_FRAC = 0.20


def resolve_posterior(gpmdm, posterior="auto"):
    """Deployment-policy posterior resolution (docs/DEPLOY.md).

    ``posterior`` may be:

    - ``'auto'`` (the ``GPMDM_PF`` default): a GUARD-BAKED deployment
      recommendation wins first — when the checkpoint carries one
      (``model._deploy_recommendation``, written by ``deploy --sparsify``
      / ``tools/eval_asset_guard.py --bake`` after measuring filter
      accuracy on held-out trials), 'auto' deploys exactly that posterior
      family; measured verdicts beat size heuristics (round-3's c8 asset
      scored 0.8966 through the threshold path while its own baked
      distillation scored 0.9864).  Without a recommendation, fall back
      to the size thresholds: the model's own posterior, except an exact
      ``core.Posterior`` with Ny > ``AUTO_COMPRESS_N`` is
      swapped for ``gpmdm.compressed_posterior()`` — at that scale the
      compressed quad is both faster AND safer (the exact f32 quad has a
      measured accuracy collapse past Ny~4k).  The O(N^3) host
      eigendecomposition this costs runs once, is cached on the model,
      and persists through save/load — a loaded checkpoint deploys
      without building the exact posterior at all (lazy, utils/io.py).
    - ``'exact'`` / ``None``: the model's own posterior unconditionally
      (reference semantics; ``warn_if_unsafe_exact`` still fires at
      deploy time when that is known-broken).
    - ``'compressed'``: force ``gpmdm.compressed_posterior()``.
    - any posterior object: used as-is.
    """
    if posterior is None or (isinstance(posterior, str) and posterior == "exact"):
        gpmdm._require_posterior()
        return gpmdm.posterior
    if isinstance(posterior, str):
        if posterior == "compressed":
            return gpmdm.compressed_posterior()
        if posterior != "auto":
            raise ValueError(
                f"posterior={posterior!r}: expected 'auto', 'exact', "
                "'compressed', or a posterior object"
            )
        rec = getattr(gpmdm, "_deploy_recommendation", None)
        if rec:
            fam = rec.get("family")
            if fam == "sparsified" and getattr(
                gpmdm, "_deploys_core_posterior", False
            ):
                return gpmdm.sparsified_posterior(
                    int(rec["M"]),
                    n_inducing_x=(
                        None if rec.get("Mx") is None else int(rec["Mx"])
                    ),
                    method=rec.get("method", "stride"),
                )
            if fam == "compressed":
                return gpmdm.compressed_posterior(
                    rank_y=rec.get("rank_y"), rank_x=rec.get("rank_x")
                )
            if fam == "exact":
                gpmdm._require_posterior()
                return gpmdm.posterior
            import warnings

            if fam == "sparsified":
                # known family, but this model can't honor it (post-hoc
                # distillation needs the exact-family core posterior) —
                # almost certainly a checkpoint/model mismatch, say so
                # instead of the generic unknown-family message.
                warnings.warn(
                    "deploy recommendation 'sparsified' requires an "
                    "exact-family model (GPMDM.sparsified_posterior); "
                    f"{type(gpmdm).__name__} cannot honor it — check for "
                    "a checkpoint/model mismatch.  Falling back to the "
                    "size-threshold policy.",
                    stacklevel=3,
                )
            else:
                warnings.warn(
                    f"ignoring unknown deploy recommendation {rec!r}; "
                    "falling back to the size-threshold policy",
                    stacklevel=3,
                )
        # Decide from STATIC model info (family marker + layout.Ny), not
        # from the built posterior: checkpoint loading defers the O(N^3)
        # exact precompute (GPMDM.posterior property), and an 'auto'
        # deployment that lands on the (persisted) compressed cache should
        # never force that build.
        layout = getattr(gpmdm, "layout", None)
        if (
            getattr(gpmdm, "_deploys_core_posterior", False)
            and hasattr(gpmdm, "compressed_posterior")
            and layout is not None
            and layout.Ny > AUTO_COMPRESS_N
        ):
            cp = gpmdm.compressed_posterior()
            N = layout.Ny
            if cp.rank_y > AUTO_COMPRESS_MAX_Q_FRAC * N:
                # past FLOP parity (2 O(NqP) vs 1 O(N^2 P)) compression
                # cannot pay; deploy exact (warn_if_unsafe_exact still
                # fires at deploy time where that is known-risky).  The
                # cache entry stays — GPMDM_PF re-resolves 'auto' per
                # call, so evicting would re-run the O(N^3) eigh every
                # frame; save_model instead skips persisting auto-key
                # entries past FLOP parity (utils/io.py).
                import warnings

                warnings.warn(
                    f"posterior='auto': spectral quad rank {cp.rank_y}/"
                    f"{N} is past the q=N/2 FLOP-parity bound "
                    "(near-identity Gram); compression cannot pay — "
                    "deploying the EXACT posterior.  Pass "
                    "posterior='compressed' or a "
                    "compressed_posterior(rank_y=...) object to override.",
                    stacklevel=3,
                )
                gpmdm._require_posterior()
                return gpmdm.posterior
            if cp.rank_y > AUTO_COMPRESS_FLAT_Q_FRAC * N:
                import warnings

                warnings.warn(
                    f"posterior='auto': spectral quad rank {cp.rank_y}/"
                    f"{N} is in the flat-spectrum band (> "
                    f"{AUTO_COMPRESS_FLAT_Q_FRAC:.0%} of Ny): compression "
                    "still deploys (it beat exact on both speed and "
                    "accuracy on the measured flat-spectrum asset) but a "
                    "rank this high usually means an early-stopped or "
                    "drifting model — validate with an accuracy guard "
                    "(tools/eval_asset_guard.py).",
                    stacklevel=3,
                )
            return cp
        gpmdm._require_posterior()
        return gpmdm.posterior
    return posterior


def warn_if_unsafe_exact(post, pf_cfg: PFConfig) -> None:
    """Warn when an exact posterior is deployed in the filter at a size
    where the default MXU precision is known to break classification."""
    import warnings

    # the EFFECTIVE quad precision is quad_precision falling back to
    # precision (config.py lax_quad_precision) — checking the two fields
    # independently would miss e.g. (precision='highest',
    # quad_precision='high'), which runs the quad at the unsafe level
    effective_quad = pf_cfg.quad_precision or pf_cfg.precision
    if (
        isinstance(post, core.Posterior)
        and post.X.shape[0] > _EXACT_QUAD_SAFE_N
        and effective_quad != "highest"
        and jnp.dtype(post.X.dtype) != jnp.dtype(jnp.float64)
    ):
        warnings.warn(
            f"exact GP posterior with Ny={post.X.shape[0]} > "
            f"{_EXACT_QUAD_SAFE_N} at MXU precision "
            f"'{pf_cfg.precision}': the variance-quad matmul's f32 error "
            "measurably breaks classification at this scale (0.547 frame "
            "accuracy at Ny=5120).  Use model.compressed_posterior() "
            "(10.8x faster than the 'highest'-precision fix at the same "
            "accuracy) or PFConfig(quad_precision='highest').  See "
            "docs/DEPLOY.md.",
            stacklevel=3,
        )


def pf_step(
    state: PFState,
    z: jax.Array,
    post: core.Posterior,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
    noise: PFNoise | None = None,
) -> tuple[PFState, PFOutputs]:
    """One full PF update (reference _update, gpmdm_pf.py:126-135).

    Pure function: (state, observation) -> (new state, readouts).
    ``noise`` (optional) supplies this frame's randomness pre-generated by
    ``_pregen_noise`` — bit-identical values, hoisted out of the scan.
    """
    P = state.x.shape[0]
    predict_y, predict_x_all_classes = _predictors(post)
    if noise is None:
        key, k_trans, k_dyn, k_res = jax.random.split(state.key, 4)
    else:
        key, k_trans, k_dyn, k_res = noise.next_key, None, None, noise.k_res

    # 1. Markov class transition: sample next class from T[c] per particle
    #    (reference gpmdm_pf.py:137-151).  Inverse-CDF sampling — one
    #    uniform per particle compared against the particle's cumulative
    #    transition row — instead of jax.random.categorical: Gumbel-max
    #    needs (P, C) noise + argmax and measured ~3x slower on TPU for
    #    the same distribution.
    C = log_T.shape[0]
    cum_T = jnp.cumsum(jnp.exp(log_T), axis=1)  # (C, C), rows end at 1
    onehot_c = jax.nn.one_hot(state.c, C, dtype=cum_T.dtype)  # (P, C)
    row_cum = jnp.matmul(onehot_c, cum_T, precision=_PREC)  # (P, C)
    if noise is None:
        u_trans = jax.random.uniform(k_trans, (P,), dtype=cum_T.dtype)
    else:
        u_trans = noise.u_trans.astype(cum_T.dtype)
    c = jnp.sum(u_trans[:, None] >= row_cum, axis=1).astype(jnp.int32)
    c = jnp.minimum(c, C - 1)

    # 2. Dynamics propagation: evaluate every class's GP for every particle,
    #    select by class, sample from the predictive Gaussian
    #    (reference gpmdm_pf.py:153-168; per-class math at gpmdm.py:1032-1068).
    if cfg.dyn_back_step == 1:
        xin = state.x
    else:
        xin = jnp.concatenate([state.x, state.x_prev], axis=1)
    use_pallas = _use_pallas(post, pf_cfg, "dyn")
    if use_pallas and isinstance(post, core.Posterior):
        from ..ops import kernels as _K
        from ..ops.pallas.gp_posterior import fused_x_posterior

        inv_ls = jnp.exp(-params.x_log_lengthscales)
        lin_w = jnp.exp(params.x_log_lin_coeff)
        diag_star = _K.x_diag_kernel(
            xin, params.x_log_lin_coeff, params.x_log_sigma_n, cfg.sigma_n_num_X, False
        )  # (P,)
        m_list, v_list = [], []
        for ci in range(post.Xin_c.shape[0]):  # static unroll; C is small
            # n_valid = n_max disables the kernel's row mask: the per-class
            # valid count is a traced quantity here (layout.class_x_counts
            # is host-side, Posterior is a jit pytree), so correctness
            # relies on precompute's zero-padding contract instead —
            # rows >= count of Axc[ci]/Kxc_inv[ci] are exactly zero, which
            # annihilates the unmasked star-kernel rows (see
            # fused_x_posterior's padding note and core.precompute).
            mean_ci, quad_ci = fused_x_posterior(
                post.Xin_c[ci],
                xin,
                post.Axc[ci],
                post.Kxc_inv[ci],
                inv_ls,
                lin_w,
                n_valid=post.Xin_c.shape[1],
                mxu_precision=pf_cfg.lax_precision,
            )
            var_common = diag_star - quad_ci
            m_list.append(mean_ci)
            v_list.append(
                var_common[:, None] * jnp.exp(params.x_log_lambdas)[None, :] ** -2
            )
        means = jnp.stack(m_list)  # (C, P, d)
        variances = jnp.stack(v_list)
    else:
        means, variances = predict_x_all_classes(
            post, params, xin, cfg, precision=pf_cfg.lax_precision,
            quad_precision=_effective_quad_precision(pf_cfg, post),
            recon_precision=pf_cfg.lax_recon_precision,
            fused=pf_cfg.fused_arg,
        )  # (C, P, d)
    mean = _select_by_class(means, c)
    var = jnp.maximum(_select_by_class(variances, c), 1e-12)
    if noise is None:
        eps = jax.random.normal(k_dyn, mean.shape, dtype=mean.dtype)
    else:
        eps = noise.eps_dyn.astype(mean.dtype)
    prop = mean + jnp.sqrt(var) * eps
    # 'full' uses the sampled prediction as the next state (what the
    # reference hard-codes); 'delta' adds it to the current state.
    x_new = state.x + prop if cfg.dyn_target == "delta" else prop

    # 3. Observation weighting (reference gpmdm_pf.py:170-204).  On TPU with
    #    the exact posterior, the WHOLE stage — star kernel, posterior mean,
    #    weighted residual, variance quad — runs as one fused Pallas kernel
    #    (fused_obs_loglik): the (P, D) mean never reaches HBM, only two
    #    (P,) vectors do, and the diagonal-Gaussian log-pdf reduces to
    #    elementwise math on those.
    if _use_pallas(post, pf_cfg, "obs"):
        from ..ops.pallas.gp_posterior import fused_obs_loglik
        from ..ops import kernels as _K

        quad, qres = fused_obs_loglik(
            post.X,
            x_new,
            post.Ay,
            post.Ky_inv,
            jnp.exp(-params.y_log_lengthscales),
            z,
            jnp.exp(2.0 * params.y_log_lambdas),
            mxu_precision=pf_cfg.lax_precision,
        )
        diag = _K.y_diag_kernel(
            x_new, params.y_log_sigma_n, cfg.sigma_n_num_Y,
            pf_cfg.obs_noise_in_weights,
        )
        var_c = jnp.maximum(diag - quad, 1e-12)
        coeff = 1.0 if pf_cfg.compat_double_logdet else 0.5
        logdet = cfg.D * jnp.log(var_c) - 2.0 * jnp.sum(params.y_log_lambdas)
        log_lik = -0.5 * qres / var_c - coeff * logdet - 0.5 * cfg.D * _LOG_2PI
    else:
        mean_y, var_y = predict_y(
            post, params, x_new, cfg,
            with_noise=pf_cfg.obs_noise_in_weights,
            precision=pf_cfg.lax_precision,
            quad_precision=_effective_quad_precision(pf_cfg, post),
            recon_precision=pf_cfg.lax_recon_precision,
            fused=pf_cfg.fused_arg,
        )  # (P, D)
        var_y = jnp.maximum(var_y, 1e-12)
        log_lik = observation_log_lik(
            z, mean_y, var_y, cfg.D, pf_cfg.compat_double_logdet
        )
    # Dead-particle guard: a particle that diverged off the manifold (the
    # linear dynamics kernel extrapolates, so |x| can grow exponentially
    # and overflow f32) gets likelihood zero instead of poisoning the
    # normalization with NaN; resampling then replaces it with a clone of a
    # live particle.
    log_lik = jnp.where(jnp.isfinite(log_lik), log_lik, -jnp.inf)
    if pf_cfg.accumulate_weights:
        log_w = log_lik + state.log_w
    else:
        log_w = log_lik
    lse = jax.scipy.special.logsumexp(log_w)
    # catastrophic-degeneracy fallback: if EVERY particle died this frame
    # (all -inf likelihoods), normalization would be NaN; fall back to
    # uniform weights so the filter survives and can re-lock.
    log_w = jnp.where(
        jnp.isfinite(lse), log_w - lse, jnp.full_like(log_w, -jnp.log(float(P)))
    )

    # Readouts BEFORE resampling (reference computes them from the
    # post-update, pre-resample weights).
    w = jnp.exp(log_w)
    # class posterior: sum over particles of exp(log_lik + log_w), per class
    # (reference class_probabilities, gpmdm_pf.py:224-248).
    lw = log_lik + log_w
    lw_max = jnp.max(lw)
    # all-dead fallback: with every lw == -inf the shift would be NaN; use
    # zeros (uniform scores) instead.
    lw = jnp.where(jnp.isfinite(lw_max), lw - lw_max, jnp.zeros_like(lw))
    onehot = jax.nn.one_hot(c, log_T.shape[0], dtype=w.dtype)  # (P, C)
    class_scores = jnp.matmul(jnp.exp(lw)[None, :], onehot, precision=_PREC)[0]
    class_probs = class_scores / jnp.sum(class_scores)
    # weighted observation log-likelihood, up to the max-shift scale exactly
    # like the reference (_weighted_sum_from_log_space, gpmdm_pf.py:302-312,
    # which never adds the subtracted max back).
    # linear-space max-shifted sum, exactly the reference's return value
    # (its _weighted_sum_from_log_space never re-applies the max or a log)
    log_likelihood = jnp.sum(jnp.exp(lw))
    # dead particles carry w == 0 but may hold inf/NaN states; 0 * inf is
    # NaN, so zero their states in the weighted mean explicitly.
    x_safe = jnp.where(jnp.isfinite(x_new), x_new, 0.0)
    state_mean = jnp.sum(x_safe * w[:, None], axis=0)
    outputs = PFOutputs(
        class_probs=class_probs,
        log_likelihood=log_likelihood,
        state_mean=state_mean,
        most_likely_class=jnp.argmax(class_probs).astype(jnp.int32),
    )

    # 4. Resampling (reference gpmdm_pf.py:206-213).  Row gathers are the
    #    single most expensive op of the whole step on TPU (~0.2 ms each at
    #    P=10k), so gather x / x_prev / c through ONE packed array instead
    #    of three separate gathers; with an ESS threshold the whole gather
    #    runs under lax.cond and is skipped on healthy frames.
    d = x_new.shape[1]
    # Packed width is a free variable: row-gather cost on TPU is FLAT in
    # the minor dimension up to one 128-lane tile (measured at P=100k:
    # widths 3/5/16/128 all ~0.52 ms incl. index computation — rows pad to
    # the lane tile regardless), so dropping x_prev for back_step=1 models
    # buys nothing and adding payload below 128 lanes costs nothing.
    packed = jnp.concatenate(
        [x_new, state.x, c.astype(x_new.dtype)[:, None]], axis=1
    )  # (P, 2d+1)
    uniform_log_w = jnp.full((P,), -jnp.log(float(P)), dtype=log_w.dtype)

    def do_resample(operand):
        packed, log_w, w, k = operand
        if pf_cfg.resampling == "systematic":
            # pass the readout-stage normalized weights: drops the
            # resampler's redundant per-frame softmax (VERDICT #3)
            idx = systematic_resample_indices(k, log_w, w=w)
            # systematic indices are monotone: the sorted-gather hints
            # measured -15% at P=100k (see _packed_gather_sorted)
            return _packed_gather_sorted(packed, idx), uniform_log_w
        idx = multinomial_resample_indices(k, log_w)
        return _packed_gather(packed, idx), uniform_log_w

    if pf_cfg.resample_threshold >= 1.0:
        packed_r, new_log_w = do_resample((packed, log_w, w, k_res))
    else:
        ess = 1.0 / jnp.maximum(jnp.sum(w * w), 1e-38)
        packed_r, new_log_w = jax.lax.cond(
            ess < pf_cfg.resample_threshold * P,
            do_resample,
            lambda operand: (operand[0], operand[1]),
            (packed, log_w, w, k_res),
        )
    new_state = PFState(
        x=packed_r[:, :d],
        x_prev=packed_r[:, d : 2 * d],
        c=packed_r[:, 2 * d].astype(jnp.int32),
        log_w=new_log_w,
        log_lik=log_lik,
        key=key,
    )
    return new_state, outputs


def pf_scan(
    state: PFState,
    Z: jax.Array,
    post: core.Posterior,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
    pregen: bool = True,
) -> tuple[PFState, PFOutputs]:
    """Stream a whole (T, D) observation sequence through the filter as one
    ``lax.scan`` — the compiled replacement for the reference's per-frame
    Python loop (test_gpmdm_pf.ipynb cell 4).

    All per-frame randomness is pre-generated outside the scan
    (``_pregen_noise``: bit-identical values, ~0.05 ms/frame of in-scan
    threefry overhead hoisted out) unless the noise tensors would exceed
    ``_PREGEN_NOISE_MAX_BYTES``."""
    T, P, d = Z.shape[0], state.x.shape[0], state.x.shape[1]
    nbytes = T * P * (d + 1) * jnp.dtype(state.x.dtype).itemsize
    if pregen and P >= _PREGEN_MIN_P and nbytes <= _PREGEN_NOISE_MAX_BYTES:
        noise = _pregen_noise(state.key, T, P, d, state.x.dtype, log_T.dtype)

        def step(s, inp):
            z, nz = inp
            return pf_step(s, z, post, params, log_T, cfg, pf_cfg, noise=nz)

        return jax.lax.scan(step, state, (Z, noise))

    def step(s, z):
        return pf_step(s, z, post, params, log_T, cfg, pf_cfg)

    return jax.lax.scan(step, state, Z)


def pf_scan_masked(
    state: PFState,
    Z: jax.Array,
    valid: jax.Array,
    post: core.Posterior,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
    pregen: bool = True,
) -> tuple[PFState, PFOutputs]:
    """``pf_scan`` over a padded (T_pad, D) sequence: frames where
    ``valid[t] == False`` are no-ops (state passes through unchanged, their
    outputs are garbage to be sliced off).  Lets callers bucket variable
    trial lengths into a handful of compiled shapes instead of recompiling
    the scan per length.

    Pre-generated noise is indexed by frame POSITION.  For the
    prefix-valid masks ``run()`` produces (all valid frames first,
    padding after) this is bit-identical to the sequential unmasked key
    chain — valid frame t is the t-th split, and masked frames revert
    the state (including the key) so the final key equals the chain
    after the last valid frame, exactly as before.  Interleaved masks
    would consume noise on masked positions (same distribution,
    different stream than the in-scan-RNG path); no caller does that."""
    T, P, d = Z.shape[0], state.x.shape[0], state.x.shape[1]
    nbytes = T * P * (d + 1) * jnp.dtype(state.x.dtype).itemsize
    use_pregen = (
        pregen and P >= _PREGEN_MIN_P and nbytes <= _PREGEN_NOISE_MAX_BYTES
    )
    noise = (
        _pregen_noise(state.key, T, P, d, state.x.dtype, log_T.dtype)
        if use_pregen
        else None
    )

    def step(s, inp):
        if use_pregen:
            z, v, nz = inp
            s2, out = pf_step(s, z, post, params, log_T, cfg, pf_cfg, noise=nz)
        else:
            z, v = inp
            s2, out = pf_step(s, z, post, params, log_T, cfg, pf_cfg)
        s_new = jax.tree.map(lambda a, b: jnp.where(v, a, b), s2, s)
        return s_new, out

    xs = (Z, valid, noise) if use_pregen else (Z, valid)
    return jax.lax.scan(step, state, xs)


def bucket_length(T: int, min_bucket: int = 64) -> int:
    """Smallest power-of-two bucket >= T (>= min_bucket)."""
    b = min_bucket
    while b < T:
        b *= 2
    return b


def _bank_pf_cfg(pf_cfg: PFConfig) -> PFConfig:
    """Resolve 'auto' knobs for the BANKED path.  The fused mean+quad
    grouping regresses under bank-vmap even at C=2 (measured 0.450 vs
    0.389 ms/bank-frame at 12x10k banks on v5e — batching the concatenated
    lhs breaks XLA's einsum tiling the same way the C=8 single-filter case
    does), so 'auto' means 'off' here; forced 'on'/'off' pass through.
    tools/exp_fused_mean_quad.py --banks reproduces the measurement."""
    if pf_cfg.fuse_mean_quad == "auto":
        return dataclasses.replace(pf_cfg, fuse_mean_quad="off")
    return pf_cfg


def pf_scan_bank(
    states: PFState,
    Z: jax.Array,
    post: core.Posterior,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
) -> tuple[PFState, PFOutputs]:
    """Run B independent filters at once: ``states`` has a leading bank axis
    on every leaf and Z is (B, T, D).  Model state is shared (broadcast)."""
    # pregen=False: under vmap the per-frame noise slices stream from HBM
    # and measured SLOWER than in-scan RNG at every bank size (v5e:
    # 64x1k banks 20.2k vs 18.7k agg fps; 12x10k banks 0.47 vs 0.54
    # ms/bank-frame) — the VPU threefry overlaps the MXU matmuls anyway.
    if _resolve_bank_impl(pf_cfg, post) == "flat":
        return _pf_scan_bank_flat(
            states, Z, None, post, params, log_T, cfg, pf_cfg
        )
    pf_cfg = _bank_pf_cfg(pf_cfg)
    return jax.vmap(
        lambda s, z: pf_scan(s, z, post, params, log_T, cfg, pf_cfg,
                             pregen=False)
    )(states, Z)


def pf_scan_bank_masked(
    states: PFState,
    Z: jax.Array,
    valid: jax.Array,
    post: core.Posterior,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
) -> tuple[PFState, PFOutputs]:
    """B independent filters over B padded sequences in one dispatch:
    ``Z`` is (B, T_pad, D), ``valid`` (B, T_pad) prefix masks.  The banked
    analogue of ``pf_scan_masked`` — this is how a whole test SET streams
    through the filter at once (evaluate_pf_banked), replacing the
    reference's per-trial Python loop (test_gpmdm_pf.ipynb cell 4) with
    one compiled call."""
    # pregen=False: see pf_scan_bank
    if _resolve_bank_impl(pf_cfg, post) == "flat":
        return _pf_scan_bank_flat(
            states, Z, valid, post, params, log_T, cfg, pf_cfg
        )
    pf_cfg = _bank_pf_cfg(pf_cfg)
    return jax.vmap(
        lambda s, z, v: pf_scan_masked(s, z, v, post, params, log_T, cfg,
                                       pf_cfg, pregen=False)
    )(states, Z, valid)


def pf_init_bank(
    post: core.Posterior,
    y_class_offsets: np.ndarray,
    key: jax.Array,
    pf_cfg: PFConfig,
    n_banks: int,
) -> PFState:
    """Initialize a bank of B independent filters (leading bank axis)."""
    keys = jax.random.split(key, n_banks)
    return jax.vmap(lambda k: pf_init(post, y_class_offsets, k, pf_cfg))(keys)


# ---------------------------------------------------------------------------
# Flat-bank formulation (round-4 VERDICT #4: the banked-vmap tax)
# ---------------------------------------------------------------------------


def _pf_step_flatbank(
    states: PFState,
    z_bank: jax.Array,
    post,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
) -> tuple[PFState, PFOutputs]:
    """One banked PF update as ONE flat P = B*Pb filter.

    The vmap bank (``jax.vmap(pf_step)``) pays a measured ~35% per-bank-
    frame tax at 12x10k banks: the GP posterior einsums gain a bank batch
    axis and XLA lowers them as B smaller matmuls with worse MXU tiling
    (docs/BENCHMARKS.md "bank tax").  Here the GP stages (dynamics
    predict, observation weighting — all the FLOPs) run on the flattened
    (B*Pb, d) particle set exactly as a single filter would, and only the
    cheap O(P) glue is bank-blocked: weight normalization, readouts, and
    resampling via per-bank systematic indices + ONE flat offset gather
    (the `_packed_gather_vmap` trick, applied directly).

    Per-bank RNG chains are preserved (each bank splits its own key
    exactly like ``pf_step`` with ``noise=None``), so draws match the
    vmap path bit-for-bit; outputs agree to matmul-reassociation noise
    (tests/test_pf.py pins them within one particle's weight).

    ``states`` leaves keep the banked (B, Pb, ...) layout of
    ``pf_init_bank`` — reshapes to/from flat are free bitcasts.
    """
    B, Pb = states.x.shape[0], states.x.shape[1]
    P = B * Pb
    d = states.x.shape[2]
    predict_y, predict_x_all_classes = _predictors(post)

    # per-bank RNG chain, bit-identical to pf_step's sequential splits
    keys4 = jax.vmap(lambda k: jax.random.split(k, 4))(states.key)  # (B,4,2)
    key, k_trans, k_dyn, k_res = (keys4[:, i] for i in range(4))

    # 1. Markov class transition (flat: the per-particle math has no bank
    #    coupling at all)
    C = log_T.shape[0]
    cum_T = jnp.cumsum(jnp.exp(log_T), axis=1)  # (C, C)
    c_prev = states.c.reshape(P)
    onehot_c = jax.nn.one_hot(c_prev, C, dtype=cum_T.dtype)  # (P, C)
    row_cum = jnp.matmul(onehot_c, cum_T, precision=_PREC)  # (P, C)
    u_trans = jax.vmap(
        lambda k: jax.random.uniform(k, (Pb,), dtype=cum_T.dtype)
    )(k_trans).reshape(P)
    c = jnp.sum(u_trans[:, None] >= row_cum, axis=1).astype(jnp.int32)
    c = jnp.minimum(c, C - 1)

    # 2. Dynamics propagation on the FLAT particle set — the einsums see
    #    one (P, d) query block, no bank axis (the whole point)
    x_flat = states.x.reshape(P, d)
    if cfg.dyn_back_step == 1:
        xin = x_flat
    else:
        xin = jnp.concatenate([x_flat, states.x_prev.reshape(P, d)], axis=1)
    means, variances = predict_x_all_classes(
        post, params, xin, cfg, precision=pf_cfg.lax_precision,
        quad_precision=_effective_quad_precision(pf_cfg, post),
        recon_precision=pf_cfg.lax_recon_precision,
        # the flat path IS a single filter to the backends: the vmap
        # fuse regression does not apply, so 'auto' gates on n_classes
        # exactly like pf_step
        fused=pf_cfg.fused_arg,
    )  # (C, P, d)
    mean = _select_by_class(means, c)
    var = jnp.maximum(_select_by_class(variances, c), 1e-12)
    eps = jax.vmap(
        lambda k: jax.random.normal(k, (Pb, d), dtype=mean.dtype)
    )(k_dyn).reshape(P, d)
    prop = mean + jnp.sqrt(var) * eps
    x_new = x_flat + prop if cfg.dyn_target == "delta" else prop

    # 3. Observation weighting: flat GP predict, per-bank observation
    mean_y, var_y = predict_y(
        post, params, x_new, cfg,
        with_noise=pf_cfg.obs_noise_in_weights,
        precision=pf_cfg.lax_precision,
        quad_precision=_effective_quad_precision(pf_cfg, post),
        recon_precision=pf_cfg.lax_recon_precision,
        fused=pf_cfg.fused_arg,
    )  # (P, D)
    var_y = jnp.maximum(var_y, 1e-12)
    D = cfg.D
    resid = z_bank[:, None, :] - mean_y.reshape(B, Pb, D)  # broadcast, fused
    quad = jnp.sum(resid**2 / var_y.reshape(B, Pb, D), axis=2).reshape(P)
    logdet = jnp.sum(jnp.log(var_y), axis=1)
    logdet_coeff = 1.0 if pf_cfg.compat_double_logdet else 0.5
    log_lik = -0.5 * quad - logdet_coeff * logdet - 0.5 * D * _LOG_2PI
    log_lik = jnp.where(jnp.isfinite(log_lik), log_lik, -jnp.inf)
    if pf_cfg.accumulate_weights:
        log_w = log_lik + states.log_w.reshape(P)
    else:
        log_w = log_lik
    log_wb = log_w.reshape(B, Pb)
    lse = jax.scipy.special.logsumexp(log_wb, axis=1, keepdims=True)  # (B,1)
    log_wb = jnp.where(
        jnp.isfinite(lse), log_wb - lse,
        jnp.full_like(log_wb, -jnp.log(float(Pb))),
    )

    # Readouts, bank-blocked (same pre-resample semantics as pf_step)
    w = jnp.exp(log_wb)  # (B, Pb)
    lw = log_lik.reshape(B, Pb) + log_wb
    lw_max = jnp.max(lw, axis=1, keepdims=True)
    lw = jnp.where(jnp.isfinite(lw_max), lw - lw_max, jnp.zeros_like(lw))
    elw = jnp.exp(lw)
    onehot = jax.nn.one_hot(c, C, dtype=w.dtype).reshape(B, Pb, C)
    class_scores = jnp.einsum("bp,bpc->bc", elw, onehot)
    class_probs = class_scores / jnp.sum(class_scores, axis=1, keepdims=True)
    log_likelihood = jnp.sum(elw, axis=1)  # (B,)
    x_safe = jnp.where(jnp.isfinite(x_new), x_new, 0.0).reshape(B, Pb, d)
    state_mean = jnp.sum(x_safe * w[:, :, None], axis=1)  # (B, d)
    outputs = PFOutputs(
        class_probs=class_probs,
        log_likelihood=log_likelihood,
        state_mean=state_mean,
        most_likely_class=jnp.argmax(class_probs, axis=1).astype(jnp.int32),
    )

    # 4. Resampling: per-bank indices (the rank computation is O(Pb) glue,
    #    vmapped), ONE flat offset gather for the payload
    packed = jnp.concatenate(
        [x_new, x_flat, c.astype(x_new.dtype)[:, None]], axis=1
    )  # (P, 2d+1)
    uniform_log_wb = jnp.full((B, Pb), -jnp.log(float(Pb)), dtype=log_wb.dtype)
    if pf_cfg.resampling == "systematic":
        idx_b = jax.vmap(
            lambda k, lw, ww: systematic_resample_indices(k, lw, w=ww)
        )(k_res, log_wb, w)
        sorted_hint = True  # per-bank monotone + increasing offsets
    else:
        idx_b = jax.vmap(multinomial_resample_indices)(k_res, log_wb)
        sorted_hint = False
    flat_idx = (
        idx_b + (jnp.arange(B, dtype=idx_b.dtype) * Pb)[:, None]
    ).reshape(P)
    if sorted_hint:
        packed_r = packed.at[flat_idx].get(
            indices_are_sorted=True, mode="promise_in_bounds"
        )
    else:
        packed_r = packed[flat_idx]
    if pf_cfg.resample_threshold >= 1.0:
        new_log_wb = uniform_log_wb
    else:
        # per-bank select (matches the vmap path exactly: vmapped
        # lax.cond evaluates both branches and selects)
        ess = 1.0 / jnp.maximum(jnp.sum(w * w, axis=1), 1e-38)  # (B,)
        do = ess < pf_cfg.resample_threshold * Pb
        packed_r = jnp.where(
            do.repeat(Pb)[:, None], packed_r, packed
        )
        new_log_wb = jnp.where(do[:, None], uniform_log_wb, log_wb)
    new_state = PFState(
        x=packed_r[:, :d].reshape(B, Pb, d),
        x_prev=packed_r[:, d : 2 * d].reshape(B, Pb, d),
        c=packed_r[:, 2 * d].astype(jnp.int32).reshape(B, Pb),
        log_w=new_log_wb,
        log_lik=log_lik.reshape(B, Pb),
        key=key,
    )
    return new_state, outputs


def _pf_scan_bank_flat(
    states: PFState,
    Z: jax.Array,
    valid: jax.Array | None,
    post,
    params: core.GPMDMParams,
    log_T: jax.Array,
    cfg: GPMDMConfig,
    pf_cfg: PFConfig,
) -> tuple[PFState, PFOutputs]:
    """Flat-bank scan over (B, T, D) observations (masked when ``valid``
    is given).  Emits the same (B, T, ...) output layout as the vmap
    path — one transpose of the small readout arrays at the end."""

    def step(s, inp):
        if valid is None:
            z = inp
            return _pf_step_flatbank(s, z, post, params, log_T, cfg, pf_cfg)
        z, v = inp
        s2, out = _pf_step_flatbank(s, z, post, params, log_T, cfg, pf_cfg)
        s_new = jax.tree.map(
            lambda a, b: jnp.where(
                v.reshape((v.shape[0],) + (1,) * (a.ndim - 1)), a, b
            ),
            s2,
            s,
        )
        return s_new, out

    Zt = jnp.swapaxes(Z, 0, 1)  # (T, B, D)
    xs = Zt if valid is None else (Zt, jnp.swapaxes(valid, 0, 1))
    final, outs = jax.lax.scan(step, states, xs)
    outs = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), outs)  # (B, T, ...)
    return final, outs


def _resolve_bank_impl(pf_cfg: PFConfig, post) -> str:
    """'auto' bank-impl policy: vmap, by MEASURED verdict.  The round-5
    interleaved TPU A/B (tools/exp_bank_flat.py, v5e, warm, best-of-4)
    read flat at 0.86x vmap on 12x10k and 0.91x on 64x1k — the flat
    formulation's fused (B*P) resample gather does not beat XLA's
    batched lowering of the vmapped scan, so the hypothesized "vmap
    tax" is not where the remaining bank overhead lives
    (docs/BENCHMARKS.md "Flat-bank A/B").  'flat' stays available
    explicitly.  The opt-in Pallas kernels (single observation vector,
    exact posterior only) stay on vmap in any case."""
    if pf_cfg.bank_impl != "auto":
        if (
            pf_cfg.bank_impl == "flat"
            and pf_cfg.pallas == "on"
            and isinstance(post, core.Posterior)
        ):
            raise ValueError(
                "bank_impl='flat' is incompatible with pallas='on' (the "
                "fused kernels take a single observation vector)"
            )
        return pf_cfg.bank_impl
    return "vmap"


@functools.lru_cache(maxsize=32)
def _instance_jits(cfg: GPMDMConfig, pf_cfg: PFConfig):
    """Jitted (step, masked-scan) pair shared across GPMDM_PF instances with
    the same static configs; log_T is a runtime argument.  Bounded LRU: an
    unbounded cache would retain every compiled executable for process
    lifetime across config sweeps."""

    @jax.jit
    def _step(state, z, post, params, log_T):
        return pf_step(state, z, post, params, log_T, cfg, pf_cfg)

    @jax.jit
    def _scan(state, Z, valid, post, params, log_T):
        return pf_scan_masked(state, Z, valid, post, params, log_T, cfg, pf_cfg)

    return _step, _scan


@functools.lru_cache(maxsize=32)
def _banked_scan_jit(cfg: GPMDMConfig, pf_cfg: PFConfig):
    """Jitted masked bank scan shared across callers with the same static
    configs (log_T is a runtime argument): repeated ``evaluate_pf_banked``
    calls with identical shapes reuse one compiled executable instead of
    recompiling per call (ADVICE r2)."""

    @jax.jit
    def _scan(states, Z, valid, post, params, log_T):
        return pf_scan_bank_masked(
            states, Z, valid, post, params, log_T, cfg, pf_cfg
        )

    return _scan


# ---------------------------------------------------------------------------
# Stateful wrapper (reference-API parity)
# ---------------------------------------------------------------------------


class GPMDM_PF:
    """Stateful wrapper mirroring the reference ``GPMDM_PF`` API
    (gpmdm_pf.py:7): construct from a trained GPMDM + Markov transition
    matrix + particle count; call ``update(z)`` per frame; read
    ``class_probabilities()`` / ``get_most_likely_class()`` /
    ``log_likelihood()`` / ``current_state_mean()``; ``reset()`` to restart.

    Additionally exposes ``run(Z)`` to stream a whole sequence in one
    compiled scan (orders of magnitude faster than per-frame updates).
    """

    def __init__(
        self,
        gpmdm,
        markov_switching_model,
        num_particles: int,
        config: Optional[PFConfig] = None,
        seed: int = 0,
        posterior="auto",
    ):
        """``posterior`` selects the deployed GP posterior via
        :func:`resolve_posterior`: ``'auto'`` (default) uses the model's
        own posterior but swaps an exact one for the low-rank-quad
        compressed posterior past Ny=``AUTO_COMPRESS_N`` (faster AND safer
        there — docs/DEPLOY.md); ``'exact'``/``None`` forces the model's
        own (reference semantics); ``'compressed'`` forces compression; or
        pass any posterior object (e.g. ``gpmdm.compressed_posterior(...)``
        with pinned ranks, or a ``SparsePosterior``)."""
        self._gpmdm = gpmdm
        # string modes ('auto'/'exact'/'compressed') and None stay
        # un-pinned: the _post property re-resolves them per call, so a
        # later model refresh (train_adam / _precompute_kernel_inverses)
        # is picked up live at EVERY model size — resolve_posterior's
        # per-model compression cache makes re-resolution free, and the
        # refresh clears that cache.  Only a posterior OBJECT is an
        # explicit pin.
        if posterior is None or isinstance(posterior, str):
            self._posterior_mode = posterior
            self._posterior_override = None
            resolve_posterior(gpmdm, posterior)  # validate + warm cache now
        else:
            self._posterior_mode = None
            self._posterior_override = posterior
        T = np.asarray(markov_switching_model, dtype=np.float64)
        if T.shape != (gpmdm.n_classes, gpmdm.n_classes):
            raise ValueError(
                "Number of classes in the GPMDM model and the Markov model do not match"
            )
        self._log_T = jnp.log(jnp.asarray(T, dtype=gpmdm.dtype))
        self.pf_config = (config or PFConfig()).__class__(
            **{
                **dataclasses.asdict(config or PFConfig()),
                "num_particles": num_particles,
            }
        )
        self._seed = seed
        self._last_outputs: Optional[PFOutputs] = None

        # jitted closures are shared across ALL filter instances with the
        # same (model config, PF config): the transition matrix is a traced
        # argument, so building a second filter (or one per trial, as eval
        # loops do) never recompiles.
        self._jit_step, self._jit_scan = _instance_jits(gpmdm.config, self.pf_config)
        warn_if_unsafe_exact(self._post, self.pf_config)
        self.reset()

    # ------------------------------------------------------------------ api

    @property
    def _post(self):
        if self._posterior_override is not None:
            return self._posterior_override
        return resolve_posterior(self._gpmdm, self._posterior_mode)

    def reset(self) -> None:
        """Re-initialize particles (reference reset, gpmdm_pf.py:264)."""
        self.state = pf_init(
            self._post,
            self._gpmdm.layout.y_class_offsets,
            jax.random.PRNGKey(self._seed),
            self.pf_config,
        )
        self._last_outputs = None

    def update(self, z) -> PFOutputs:
        """One per-frame update (reference update, gpmdm_pf.py:117-135)."""
        z = jnp.asarray(z, dtype=self._gpmdm.dtype).reshape(-1)
        self.state, out = self._jit_step(
            self.state, z, self._post, self._gpmdm.params, self._log_T
        )
        self._last_outputs = out
        return out

    def run(self, Z) -> PFOutputs:
        """Stream a whole (T, D) sequence in one compiled scan; returns
        stacked per-frame outputs.

        Sequences are padded to power-of-two length buckets so streaming
        many variable-length trials compiles only a handful of shapes
        (padded frames are masked no-ops and sliced off the outputs)."""
        Z = jnp.atleast_2d(jnp.asarray(Z, dtype=self._gpmdm.dtype))
        T = Z.shape[0]
        T_pad = bucket_length(T)
        valid = jnp.arange(T_pad) < T
        Zp = jnp.pad(Z, ((0, T_pad - T), (0, 0)))
        self.state, outs = self._jit_scan(
            self.state, Zp, valid, self._post, self._gpmdm.params,
            self._log_T,
        )
        outs = jax.tree.map(lambda a: a[:T], outs)
        self._last_outputs = jax.tree.map(lambda a: a[-1], outs)
        return outs

    def class_probabilities(self) -> np.ndarray:
        """Posterior class probabilities at the current frame (reference
        gpmdm_pf.py:224-248)."""
        self._require_update()
        return np.asarray(self._last_outputs.class_probs)

    def get_most_likely_class(self) -> int:
        self._require_update()
        return int(self._last_outputs.most_likely_class)

    def log_likelihood(self) -> float:
        """Max-shifted weighted likelihood sum — the reference's exact
        return value (gpmdm_pf.py:215-222 via _weighted_sum_from_log_space
        :302-312, which returns the linear-space sum and never re-applies
        the subtracted max; despite the name it is NOT a log)."""
        self._require_update()
        return float(self._last_outputs.log_likelihood)

    def current_state_mean(self) -> np.ndarray:
        self._require_update()
        return np.asarray(self._last_outputs.state_mean)

    def _require_update(self):
        if self._last_outputs is None:
            raise RuntimeError("no observation processed yet; call update() or run()")

    # ------------------------------------------------------------ properties

    @property
    def latent_dim(self) -> int:
        return self._gpmdm.d

    @property
    def observation_dim(self) -> int:
        return self._gpmdm.D

    @property
    def num_classes(self) -> int:
        return self._gpmdm.n_classes

    @property
    def num_particles(self) -> int:
        return self.pf_config.num_particles

    @property
    def dtype(self):
        return self._gpmdm.dtype
