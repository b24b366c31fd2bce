"""Pin the compare_all vs scatter crossover for systematic-resample
index computation on the TPU (see exp_resample_scatter.py).

Run: python tools/exp_resample_crossover.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def _prefix(key, log_w):
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=w.dtype)
    return u, cum


def idx_cmp(key, log_w):
    P = log_w.shape[0]
    u, cum = _prefix(key, log_w)
    pos = (u + jnp.arange(P, dtype=cum.dtype)) / P
    idx = jnp.searchsorted(cum, pos, method="compare_all")
    return jnp.clip(idx, 0, P - 1).astype(jnp.int32)


def idx_scatter(key, log_w):
    P = log_w.shape[0]
    u, cum = _prefix(key, log_w)
    s = jnp.clip(jnp.floor(P * cum - u).astype(jnp.int32) + 1, 0, P)
    hist = jnp.zeros((P + 1,), jnp.int32).at[s].add(1)
    return jnp.clip(jnp.cumsum(hist)[:P], 0, P - 1).astype(jnp.int32)


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
    float(run(key, log_w))  # compile + warm
    best = np.inf
    for i in range(reps):
        # fold the rep index into the key so no two dispatches are
        # byte-identical (this tunnel backend intermittently serves
        # repeat (executable, args) calls without recomputing), and time
        # the host fetch, which provably waits for the value.
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        float(run(k, log_w))
        best = min(best, (time.perf_counter() - t0) / T)
    return best * 1e3


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for P in (2048, 4096, 8192, 10000, 16384, 20000):
        a = timed(idx_cmp, P)
        b = timed(idx_scatter, P)
        win = "scatter" if b < a else "compare_all"
        print(f"P={P:>6}: compare_all {a:.4f} ms | scatter {b:.4f} ms "
              f"| winner {win}")
