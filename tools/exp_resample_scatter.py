"""Measure systematic-resample index strategies in-context on the TPU.

Candidates for ``idx = searchsorted(cum, (u + arange(P))/P)``:

- ``compare_all``: dense (P, P) comparison matrix (current default, O(P^2))
- ``sort``: merge-sort lowering (current fallback above 16k particles)
- ``scatter``: O(P) histogram trick.  Since both sides are sorted,
  ``idx_i = #{j : s_j <= i}`` with ``s_j = floor(P*cum_j - u) + 1``;
  a scatter-add of ones at s (a (P+1,) histogram) followed by a cumsum
  gives every count at once.

Run: python tools/exp_resample_scatter.py [--cpu]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--corr-only", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def positions_and_cum(key, log_w):
    P = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=w.dtype)
    return u, cum


def idx_searchsorted(key, log_w, method):
    P = log_w.shape[0]
    u, cum = positions_and_cum(key, log_w)
    pos = (u + jnp.arange(P, dtype=cum.dtype)) / P
    idx = jnp.searchsorted(cum, pos, method=method)
    return jnp.clip(idx, 0, P - 1).astype(jnp.int32)


def idx_scatter(key, log_w):
    P = log_w.shape[0]
    u, cum = positions_and_cum(key, log_w)
    # position_i = (u+i)/P < cum_j  <=>  i < P*cum_j - u; so the count of
    # positions strictly below cum_j is s_j = floor(P*cum_j - u) + 1 (u>0
    # makes ties measure-zero), and idx_i = #{j : s_j <= i}.
    s = jnp.clip(jnp.floor(P * cum - u).astype(jnp.int32) + 1, 0, P)
    hist = jnp.zeros((P + 1,), jnp.int32).at[s].add(1)
    idx = jnp.cumsum(hist)[:P]
    return jnp.clip(idx, 0, P - 1).astype(jnp.int32)


# ---- correctness: scatter == searchsorted on random weights
key = jax.random.PRNGKey(0)
for P in (64, 1000, 4096):
    for seed in range(5):
        k = jax.random.PRNGKey(seed)
        kw, ku = jax.random.split(k)
        log_w = 3.0 * jax.random.normal(kw, (P,), dtype=jnp.float32)
        a = np.asarray(idx_searchsorted(ku, log_w, "sort"))
        b = np.asarray(idx_scatter(ku, log_w))
        if not np.array_equal(a, b):
            nbad = int((a != b).sum())
            print(f"P={P} seed={seed}: {nbad} mismatches "
                  f"(max |d|={np.abs(a-b).max()})")
            assert nbad == 0
print("correctness: scatter == searchsorted on all checked inputs")
if args.corr_only:
    raise SystemExit(0)


# ---- timing: T index computations chained in one scan (single dispatch)
def timed(fn, P, T=2000, reps=3):
    def body(carry, _):
        key, log_w = carry
        key, k = jax.random.split(key)
        idx = fn(k, log_w)
        # data-dependent carry so nothing is hoisted out of the scan
        log_w = log_w + 1e-6 * idx.astype(log_w.dtype)
        return (key, log_w), idx[0]

    @jax.jit
    def run(key, log_w):
        (_, lw), outs = jax.lax.scan(body, (key, log_w), None, length=T)
        return lw.sum() + outs.sum()

    log_w = jax.random.normal(jax.random.PRNGKey(1), (P,), dtype=jnp.float32)
    run(key, log_w).block_until_ready()  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run(key, log_w).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / T)
    return best * 1e3  # ms per index computation


print(f"devices: {jax.devices()}")
for P in (10_000, 30_000, 100_000):
    row = {"compare_all": None, "sort": None, "scatter": None}
    if P <= 16384:
        row["compare_all"] = timed(
            lambda k, w: idx_searchsorted(k, w, "compare_all"), P)
    row["sort"] = timed(lambda k, w: idx_searchsorted(k, w, "sort"), P)
    row["scatter"] = timed(idx_scatter, P)
    fmt = {k: (f"{v:.4f}" if v is not None else "-") for k, v in row.items()}
    print(f"P={P:>7}: compare_all {fmt['compare_all']} ms | "
          f"sort {fmt['sort']} ms | scatter {fmt['scatter']} ms")
