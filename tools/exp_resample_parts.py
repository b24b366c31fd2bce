"""Break the systematic-resample index cost into parts on the TPU.

Measures, in the same scan-context protocol as exp_resample_scatter:
  a) softmax+cumsum only (the shared prefix of every method)
  b) blocked two-level cumsum variant of (a)
  c) full scatter method with the blocked cumsum

Run: python tools/exp_resample_parts.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def cumsum_flat(w):
    return jnp.cumsum(w)


def cumsum_blocked(w, bk=128):
    """Two-level cumsum: (P,) -> (bk, ceil(P/bk)) row-cumsum + row-offset.

    Zero-pads to a multiple of bk (padding does not change the first P
    prefix sums)."""
    P = w.shape[0]
    cols = -(-P // bk)
    wp = jnp.pad(w, (0, bk * cols - P))
    m = wp.reshape(bk, cols)
    within = jnp.cumsum(m, axis=1)
    offs = jnp.concatenate([jnp.zeros((1,), w.dtype),
                            jnp.cumsum(within[:, -1])[:-1]])
    return (within + offs[:, None]).reshape(bk * cols)[:P]


def prefix_only(key, log_w, cumsum_fn):
    w = jax.nn.softmax(log_w)
    cum = cumsum_fn(w)
    u = jax.random.uniform(key, (), dtype=w.dtype)
    return (cum[-1] + u).astype(jnp.float32), cum


def idx_scatter(key, log_w, cumsum_fn):
    P = log_w.shape[0]
    _, cum = prefix_only(key, log_w, cumsum_fn)
    u = jax.random.uniform(key, (), dtype=cum.dtype)
    s = jnp.clip(jnp.floor(P * cum - u).astype(jnp.int32) + 1, 0, P)
    hist = jnp.zeros((P + 1,), jnp.int32).at[s].add(1)
    return jnp.clip(jnp.cumsum(hist)[:P], 0, P - 1).astype(jnp.int32)


def idx_scatter_sorted(key, log_w, cumsum_fn):
    """Scatter variant telling XLA the indices are sorted + in-bounds."""
    P = log_w.shape[0]
    _, cum = prefix_only(key, log_w, cumsum_fn)
    u = jax.random.uniform(key, (), dtype=cum.dtype)
    s = jnp.clip(jnp.floor(P * cum - u).astype(jnp.int32) + 1, 0, P)
    hist = jnp.zeros((P + 1,), jnp.int32).at[s].add(
        1, indices_are_sorted=True, mode="promise_in_bounds")
    return jnp.clip(jnp.cumsum(hist)[:P], 0, P - 1).astype(jnp.int32)


def idx_segsum(key, log_w, cumsum_fn):
    """segment_sum with sorted segment ids."""
    P = log_w.shape[0]
    _, cum = prefix_only(key, log_w, cumsum_fn)
    u = jax.random.uniform(key, (), dtype=cum.dtype)
    s = jnp.clip(jnp.floor(P * cum - u).astype(jnp.int32) + 1, 0, P)
    hist = jax.ops.segment_sum(
        jnp.ones((P,), jnp.int32), s, num_segments=P + 1,
        indices_are_sorted=True)
    return jnp.clip(jnp.cumsum(hist)[:P], 0, P - 1).astype(jnp.int32)


def idx_compare_all(key, log_w, cumsum_fn):
    P = log_w.shape[0]
    _, cum = prefix_only(key, log_w, cumsum_fn)
    u = jax.random.uniform(key, (), dtype=cum.dtype)
    pos = (u + jnp.arange(P, dtype=cum.dtype)) / P
    idx = jnp.searchsorted(cum, pos, method="compare_all")
    return jnp.clip(idx, 0, P - 1).astype(jnp.int32)


def timed(make_out, P, T=2000, reps=3):
    def body(carry, _):
        key, log_w = carry
        key, k = jax.random.split(key)
        out = make_out(k, log_w)
        log_w = log_w + 1e-6 * out.astype(log_w.dtype)
        return (key, log_w), out[0] if out.ndim else out

    @jax.jit
    def run(key, log_w):
        (_, lw), outs = jax.lax.scan(body, (key, log_w), None, length=T)
        return lw.sum() + outs.sum()

    key = jax.random.PRNGKey(0)
    log_w = jax.random.normal(jax.random.PRNGKey(1), (P,), dtype=jnp.float32)
    run(key, log_w).block_until_ready()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run(key, log_w).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / T)
    return best * 1e3


# correctness of blocked cumsum variants
for P in (1024, 10_000 // 8 * 8):
    lw = jax.random.normal(jax.random.PRNGKey(2), (P,), jnp.float32)
    w = jax.nn.softmax(lw)
    a = np.asarray(cumsum_flat(w))
    b = np.asarray(cumsum_blocked(w, 8))
    assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()
print("blocked cumsum matches flat")

print(f"devices: {jax.devices()}")
for P in (10_000, 100_000):
    r = {}
    r["prefix flat"] = timed(
        lambda k, w: prefix_only(k, w, cumsum_flat)[0], P)
    r["prefix blocked"] = timed(
        lambda k, w: prefix_only(k, w, cumsum_blocked)[0], P)
    r["scatter flat"] = timed(
        lambda k, w: idx_scatter(k, w, cumsum_flat), P)
    r["scatter sorted"] = timed(
        lambda k, w: idx_scatter_sorted(k, w, cumsum_flat), P)
    r["segsum"] = timed(
        lambda k, w: idx_segsum(k, w, cumsum_flat), P)
    if P <= 16384:
        r["cmpall flat"] = timed(
            lambda k, w: idx_compare_all(k, w, cumsum_flat), P)
        r["cmpall blocked"] = timed(
            lambda k, w: idx_compare_all(k, w, cumsum_blocked), P)
    print(f"P={P:>7}: " + " | ".join(f"{k} {v:.4f} ms" for k, v in r.items()))
