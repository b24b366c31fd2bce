"""Measure threefry vs rbg PRNG for the PF's per-frame draw pattern.

Per frame the filter draws: split(key, 4), uniform (P,), normal (P, d),
uniform scalar.  Threefry is counter-based (bit-exact, reproducible,
expensive on TPU); 'rbg' uses the hardware random-bit generator (fast,
NOT bit-stable across backends/versions).

Run: python tools/exp_rng_impl.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

P, D_LAT, T = 10_000, 2, 2000


def draw_pattern(key):
    key, k1, k2, k3 = jax.random.split(key, 4)
    u = jax.random.uniform(k1, (P,), dtype=jnp.float32)
    n = jax.random.normal(k2, (P, D_LAT), dtype=jnp.float32)
    s = jax.random.uniform(k3, (), dtype=jnp.float32)
    return key, u.sum() + n.sum() + s


def timed(key0, reps=3):
    def body(carry, _):
        key, acc = carry
        key, v = draw_pattern(key)
        return (key, acc + v), None

    @jax.jit
    def run(key):
        (_, acc), _ = jax.lax.scan(body, (key, 0.0), None, length=T)
        return acc

    float(run(key0))
    best = np.inf
    for i in range(reps):
        t0 = time.perf_counter()
        float(run(key0))
        best = min(best, (time.perf_counter() - t0) / T)
    return best * 1e3


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        print(f"{impl:>12}: {timed(key):.4f} ms/frame for the PF draw pattern")
