"""Exact MXU-based systematic-resample rank computation.

Targets i = m*k + t.  With s_j = floor(P*cum_j - u) + 1 (the count of
systematic positions strictly below cum_j), the resampling indices are
``idx_i = #{j : s_j <= i} = C[m] + F[m, t]`` where

  F[m, t] = #{j : s_j//k == m and s_j%k <= t}  =  (A @ B)[m, t]
  A[m, j] = [s_j//k == m]     (K x P, 0/1)
  B[j, t] = [s_j%k <= t]      (P x k, 0/1)
  C[m]    = #{j : s_j//k < m} = exclusive-cumsum of F[:, k-1]

0/1 matmuls are EXACT in bf16 with an f32 accumulator (products are 0/1;
counts <= P << 2^24), so the MXU's fast path is safe here — unlike the
posterior matmuls, where bf16 was a correctness trap.

Run: python tools/exp_resample_mxu.py [--cpu]
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


def _s_of(key, log_w):
    P = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=w.dtype)
    return jnp.clip(jnp.floor(P * cum - u).astype(jnp.int32) + 1, 0, P), u


def idx_mxu(key, log_w, k=128):
    P = log_w.shape[0]
    s, _ = _s_of(key, log_w)
    K = -(-P // k)
    b = s // k
    o = s % k
    A = (b[None, :] == jnp.arange(K, dtype=jnp.int32)[:, None]).astype(
        jnp.bfloat16)
    B = (o[:, None] <= jnp.arange(k, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)
    F = jax.lax.dot(A, B, preferred_element_type=jnp.float32)
    C = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(F[:, -1])[:-1]])
    out = (C[:, None] + F).reshape(K * k)[:P]
    return jnp.clip(out, 0, P - 1).astype(jnp.int32)


def idx_cmp(key, log_w):
    P = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=w.dtype)
    pos = (u + jnp.arange(P, dtype=w.dtype)) / P
    idx = jnp.searchsorted(cum, pos, method="compare_all")
    return jnp.clip(idx, 0, P - 1).astype(jnp.int32)


def idx_scatter(key, log_w):
    P = log_w.shape[0]
    s, _ = _s_of(key, log_w)
    hist = jnp.zeros((P + 1,), jnp.int32).at[s].add(1)
    return jnp.clip(jnp.cumsum(hist)[:P], 0, P - 1).astype(jnp.int32)


# ---- correctness vs numpy searchsorted
for P in (64, 1000, 4096, 10000):
    for seed in range(4):
        key = jax.random.fold_in(jax.random.PRNGKey(7), 10 * P + seed)
        kw, ku = jax.random.split(key)
        log_w = 3.0 * jax.random.normal(kw, (P,), dtype=jnp.float32)
        got = np.asarray(idx_mxu(ku, log_w))
        w = np.asarray(jax.nn.softmax(log_w))
        cum = np.cumsum(w)
        u = float(jax.random.uniform(ku, (), dtype=log_w.dtype))
        # ground truth built from the same quantization s (float rounding
        # in cum reproduced identically)
        s = np.asarray(_s_of(ku, log_w)[0])
        want = np.clip(np.searchsorted(s, np.arange(P), side="right"),
                       0, P - 1)
        assert np.array_equal(got, want), (P, seed,
                                           int((got != want).sum()))
print("correctness: mxu == rank ground truth on all checked inputs")
if args.corr_only:
    raise SystemExit(0)


def timed(fn, P, T=2000, reps=3):
    def body(carry, _):
        key, log_w = carry
        key, k = jax.random.split(key)
        idx = fn(k, log_w)
        return (key, log_w + 1e-6 * idx.astype(log_w.dtype)), idx[0]

    @jax.jit
    def run(key, log_w):
        (_, lw), outs = jax.lax.scan(body, (key, log_w), None, length=T)
        return lw.sum() + outs.sum()

    key = jax.random.PRNGKey(0)
    log_w = jax.random.normal(jax.random.PRNGKey(1), (P,), jnp.float32)
    float(run(key, log_w))
    best = np.inf
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        float(run(k, log_w))
        best = min(best, (time.perf_counter() - t0) / T)
    return best * 1e3


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for P in (4096, 10000, 16384, 30000, 100000):
        r = {}
        if P <= 20000:
            r["cmp"] = timed(idx_cmp, P)
        r["scatter"] = timed(idx_scatter, P)
        for k in (128, 256, 512):
            r[f"mxu k={k}"] = timed(lambda kk, w: idx_mxu(kk, w, k), P)
        print(f"P={P:>7}: " +
              " | ".join(f"{n} {v:.4f} ms" for n, v in r.items()))
