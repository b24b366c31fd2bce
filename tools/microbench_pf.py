#!/usr/bin/env python
"""Microbenchmarks for PF step alternatives on TPU.

Each candidate runs as a 200-iteration lax.scan (one dispatch; per-frame
cost = wall / 200) so tunnel RTT doesn't pollute the numbers.

Candidates:
- resample-index computation: searchsorted method='sort' (current) vs
  'compare_all' vs scatter+cummax inverse vs counts-based
- RNG: threefry vs rbg key impl for the per-frame draw pattern
- class transition: categorical (gumbel) vs one-uniform + row-cumsum compare
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

P = 10_000
D_LAT = 2
FRAMES = 200
REPS = 5


def timed(name, step, carry0):
    """Marginal per-frame cost: difference two scan lengths to cancel fixed
    dispatch/RTT overhead (the tunnel costs ~25 ms per dispatch)."""
    import jax

    def run(n):
        f = jax.jit(lambda c: jax.lax.scan(step, c, None, length=n))
        c, o = f(carry0)
        jax.block_until_ready(o)
        best = np.inf
        for _ in range(REPS):
            t0 = time.perf_counter()
            c, o = f(carry0)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return best

    t_short, t_long = run(FRAMES), run(5 * FRAMES)
    ms = 1000.0 * (t_long - t_short) / (4 * FRAMES)
    print(f"{name:>40}: {ms:7.4f} ms/frame  (fixed ~{1000*t_short - ms*FRAMES:.1f} ms)")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    print(f"device={jax.devices()[0]} P={P}")
    rng = np.random.default_rng(0)
    log_w0 = jnp.asarray(np.log(rng.dirichlet(np.ones(P))), dtype=jnp.float32)

    # ---------- resample index candidates ----------
    def mk_resample(indexer):
        def step(carry, _):
            key, log_w = carry
            key, k = jax.random.split(key)
            idx = indexer(k, log_w)
            # fold idx back into log_w so nothing is DCE'd, keep values stable
            log_w = log_w + 1e-12 * idx.astype(log_w.dtype)
            return (key, log_w), jnp.sum(idx)

        return step

    def idx_sort(key, log_w):
        w = jax.nn.softmax(log_w)
        cum = jnp.cumsum(w)
        u = jax.random.uniform(key, (), dtype=w.dtype)
        pos = (u + jnp.arange(P, dtype=w.dtype)) / P
        return jnp.clip(
            jnp.searchsorted(cum, pos, method="sort"), 0, P - 1
        ).astype(jnp.int32)

    def idx_compare_all(key, log_w):
        w = jax.nn.softmax(log_w)
        cum = jnp.cumsum(w)
        u = jax.random.uniform(key, (), dtype=w.dtype)
        pos = (u + jnp.arange(P, dtype=w.dtype)) / P
        return jnp.clip(
            jnp.searchsorted(cum, pos, method="compare_all"), 0, P - 1
        ).astype(jnp.int32)

    def idx_scatter_cummax(key, log_w):
        # systematic points are equally spaced: particle i owns output slots
        # [ceil(P*cum_{i-1} - u), ceil(P*cum_i - u)); invert the staircase by
        # scatter-max of i at its start slot followed by a cummax.
        w = jax.nn.softmax(log_w)
        cum = jnp.cumsum(w)
        u = jax.random.uniform(key, (), dtype=w.dtype)
        start = jnp.ceil(P * jnp.concatenate([jnp.zeros(1, w.dtype), cum[:-1]]) - u)
        start = jnp.clip(start, 0, P - 1).astype(jnp.int32)
        iota = jnp.arange(P, dtype=jnp.int32)
        z = jnp.zeros((P,), jnp.int32).at[start].max(iota, mode="drop")
        return jax.lax.associative_scan(jnp.maximum, z)

    def idx_counts_repeat(key, log_w):
        w = jax.nn.softmax(log_w)
        cum = jnp.cumsum(w)
        u = jax.random.uniform(key, (), dtype=w.dtype)
        kfl = jnp.floor(P * cum - u)  # of positions <= cum_i
        counts = jnp.diff(jnp.concatenate([jnp.zeros(1, w.dtype), kfl])) \
            .astype(jnp.int32)
        return jnp.repeat(
            jnp.arange(P, dtype=jnp.int32), counts, total_repeat_length=P
        )

    carry0 = (jax.random.PRNGKey(0), log_w0)
    timed("searchsorted sort (current)", mk_resample(idx_sort), carry0)
    timed("searchsorted compare_all", mk_resample(idx_compare_all), carry0)
    timed("scatter+cummax", mk_resample(idx_scatter_cummax), carry0)
    timed("counts+repeat", mk_resample(idx_counts_repeat), carry0)

    # correctness cross-check (same key -> same indices)
    k = jax.random.PRNGKey(7)
    ref = np.asarray(idx_sort(k, log_w0))
    for name, fn in [
        ("compare_all", idx_compare_all),
        ("scatter_cummax", idx_scatter_cummax),
        ("counts_repeat", idx_counts_repeat),
    ]:
        got = np.asarray(fn(k, log_w0))
        ok = np.array_equal(ref, got)
        print(f"  {name} == sort: {ok}"
              + ("" if ok else f"  (mismatch {np.sum(ref != got)}/{P})"))

    # ---------- RNG impl candidates ----------
    def mk_rng(impl_key):
        def step(key, _):
            key, k1, k2, k3 = jax.random.split(key, 4)
            a = jax.random.uniform(k1, (P,), dtype=jnp.float32)
            b = jax.random.normal(k2, (P, D_LAT), dtype=jnp.float32)
            u = jax.random.uniform(k3, (), dtype=jnp.float32)
            return key, jnp.sum(a) + jnp.sum(b) + u

        return step

    timed("rng threefry (split+u+n+u)", mk_rng(None), jax.random.PRNGKey(0))
    timed("rng rbg (split+u+n+u)", mk_rng(None), jax.random.key(0, impl="rbg"))

    def step_rng_fused(key, _):
        key, k1 = jax.random.split(key)
        blk = jax.random.uniform(k1, (P, D_LAT + 2), dtype=jnp.float32)
        a = blk[:, 0]
        n = jax.scipy.special.ndtri(jnp.clip(blk[:, 1:1 + D_LAT], 1e-7, 1 - 1e-7))
        u = blk[0, D_LAT + 1]
        return key, jnp.sum(a) + jnp.sum(n) + u

    timed("rng threefry one-block + ndtri", step_rng_fused, jax.random.PRNGKey(0))
    timed("rng rbg one-block + ndtri", step_rng_fused, jax.random.key(0, impl="rbg"))

    # ---------- class transition candidates ----------
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=jnp.float32))
    c0 = jnp.asarray(rng.integers(0, 2, P), dtype=jnp.int32)

    def step_categorical(carry, _):
        key, c = carry
        key, k = jax.random.split(key)
        c = jax.random.categorical(k, log_T[c]).astype(jnp.int32)
        return (key, c), jnp.sum(c)

    def step_cumT(carry, _):
        key, c = carry
        key, k = jax.random.split(key)
        cumT = jnp.cumsum(jnp.exp(log_T), axis=1)  # (C, C)
        u = jax.random.uniform(k, (P,), dtype=jnp.float32)
        onehot = jax.nn.one_hot(c, 2, dtype=jnp.float32)  # (P, C)
        row_cum = onehot @ cumT  # (P, C) cumulative row of each particle
        c = jnp.sum(u[:, None] > row_cum, axis=1).astype(jnp.int32)
        return (key, c), jnp.sum(c)

    timed("transition categorical", step_categorical, (jax.random.PRNGKey(0), c0))
    timed("transition cumT compare", step_cumT, (jax.random.PRNGKey(0), c0))
    timed("transition cumT compare rbg",
          step_cumT, (jax.random.key(0, impl="rbg"), c0))


if __name__ == "__main__":
    main()
