"""Reproduce + localize the value-dependent PF slowdown on the TPU backend.

Round-1 observation: streaming frames through an UNTRAINED model (inf/NaN
-laden weights before the dead-particle guards existed) measured ~25x
slower than the same computation on trained values — on hardware whose
ALUs are fixed-latency.  This script isolates the mechanism by timing the
same jitted scan with inputs pushed through a value ladder:

  normal    — the trained bench asset, real observations
  large     — observations scaled 1e4 (quad terms overflow to inf in exp)
  inf       — observations = +inf
  nan       — observations = NaN

and then micro-ladders individual ops (exp overflow, inf matmul, NaN
matmul) to find which primitive carries the penalty.

Run: python tools/exp_value_dependent.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed_call(run, *args, reps=3):
    jax.block_until_ready(run(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def pf_ladder():
    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf

    m = GPMDM.load("bench_assets/bench_model.npz")
    _, _, test_seqs, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=1, seq_len=60, D=35, seed=0
    )
    Z0 = jnp.asarray(
        np.concatenate([np.asarray(s) for s in test_seqs] * 10, axis=0)[:500],
        dtype=m.dtype,
    )
    pfc = PFConfig(num_particles=10_000)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))
    scan = jax.jit(
        lambda s, Z: pf.pf_scan(s, Z, m.posterior, m.params, log_T, m.config, pfc)
    )
    state = pf.pf_init(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
    )

    def run(Z):
        _, outs = scan(state, Z)
        return outs.class_probs

    for name, Z in [
        ("normal", Z0),
        ("large(1e4)", Z0 * 1e4),
        ("inf", jnp.full_like(Z0, jnp.inf)),
        ("nan", jnp.full_like(Z0, jnp.nan)),
    ]:
        t = timed_call(run, Z)
        print(f"pf scan 500 frames, obs={name:>10}: {t*1e3:8.1f} ms "
              f"({t/500*1e3:.3f} ms/frame)")


def micro_ladder():
    P = 4096

    def make(val):
        A = jnp.ones((P, P), jnp.float32)
        return A * val

    @jax.jit
    def mm_scan(A, B):
        def body(c, _):
            c = jnp.tanh(jnp.matmul(A, B, precision=jax.lax.Precision.HIGH)[0, 0]) + c
            return c, None
        c, _ = jax.lax.scan(body, 0.0, None, length=20)
        return c

    @jax.jit
    def exp_scan(x):
        def body(c, _):
            c = c + jnp.exp(x).sum()
            return c, None
        c, _ = jax.lax.scan(body, 0.0, None, length=20)
        return c

    for name, val in [("1.0", 1.0), ("1e30", 1e30), ("inf", np.inf),
                      ("nan", np.nan)]:
        A = make(val)
        B = make(1.0)
        t = timed_call(mm_scan, A, B)
        print(f"matmul {P}x{P} x20, A={name:>5}: {t*1e3:8.1f} ms")
    x = jnp.linspace(-1, 1, P * P).reshape(P, P)
    for name, xs in [("normal", x), ("overflow(+800)", x + 800.0),
                     ("inf", jnp.full_like(x, jnp.inf)),
                     ("nan", jnp.full_like(x, jnp.nan))]:
        t = timed_call(exp_scan, xs)
        print(f"exp {P}x{P} x20, x={name:>14}: {t*1e3:8.1f} ms")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    pf_ladder()
    micro_ladder()
