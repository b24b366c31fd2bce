#!/usr/bin/env python
"""Sweep: fused Pallas posterior kernels vs the unfused XLA pipeline.

This tool produced the evidence that RETIRED the fused-kernel auto-gate
(particle_filter._use_pallas now always selects XLA; see the
"Pallas fused-posterior correction" section of docs/BENCHMARKS.md):
round-1's fused wins were a silent Mosaic bf16 1-pass downgrade, and with
correct matmul precision the fused path loses at 'high' and washes at
'highest' for every N in {1024, 2048, 4096}.  Kept for re-running if the
kernels or Mosaic change.  Compares, per N:

  - unfused XLA pipeline (star kernel -> mean + variance quad, the exact
    computation core.predict_x_all_classes does per class),
  - fused_x_posterior at several (tile_p, tile_n) choices,
  - fused_obs_loglik (the fully-fused observation weighting) vs its
    unfused equivalent at the same N.

Each candidate runs as marginal scan cost (difference of two scan lengths)
so the ~25 ms tunnel dispatch RTT cancels.  Values are random but finite
and well-scaled (the 25x value-dependent slowdown needs inf/NaN frames).

Usage: python tools/sweep_pallas_x.py [--particles 10000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FRAMES = 2000  # one long scan: the ~25 ms dispatch RTT adds ~0.013 ms/frame
REPS = 4


def timed(step, carry0):
    """Per-frame ms from ONE compiled long scan (tunnel compiles cost
    20-40 s each, so the two-length differencing protocol doubles compile
    cost for a correction that a 2000-frame scan makes negligible)."""
    import jax

    f = jax.jit(lambda c: jax.lax.scan(step, c, None, length=FRAMES))
    c, o = f(carry0)
    jax.block_until_ready(o)
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        c, o = f(carry0)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return 1000.0 * best / FRAMES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=10_000)
    ap.add_argument("--din", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gpmdm_tpu.ops import kernels as K
    from gpmdm_tpu.ops.pallas.gp_posterior import (
        fused_obs_loglik,
        fused_x_posterior,
    )

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    P, din = args.particles, args.din
    D = 35
    print(f"device={jax.devices()[0]} P={P} din={din} D={D}")
    rng = np.random.default_rng(0)
    f32 = jnp.float32

    log_ls = jnp.zeros((din,), f32)
    log_sn = jnp.asarray(-2.0, f32)
    log_lc = jnp.zeros((din + 1,), f32)
    inv_ls = jnp.exp(-log_ls)
    lin_w = jnp.exp(log_lc)

    for N in (1024, 2048, 4096):
        Xin = jnp.asarray(rng.normal(size=(N, din)), f32)
        A = jnp.asarray(rng.normal(size=(N, din)) / np.sqrt(N), f32)
        Ay = jnp.asarray(rng.normal(size=(N, D)) / np.sqrt(N), f32)
        # well-conditioned stand-in inverse (values finite & O(1))
        Kinv = jnp.asarray(
            np.eye(N) * 1.0 + rng.normal(size=(N, N)) / N, f32
        )
        Xs0 = jnp.asarray(rng.normal(size=(P, din)), f32)
        z = jnp.asarray(rng.normal(size=(D,)), f32)
        lam2 = jnp.ones((D,), f32)

        def rotate(Xs, out_vec):
            # fold a little of the output back in so nothing is DCE'd and
            # each frame's inputs differ (values stay O(1))
            return Xs * 0.999 + 1e-6 * out_vec[:, None]

        PRECS = [("high", jax.lax.Precision.HIGH),
                 ("highest", jax.lax.Precision.HIGHEST)]

        # ---- unfused XLA dynamics pipeline (one class block)
        for pname, prec in PRECS[:1]:  # high = the production setting
            def step_unfused(Xs, _, prec=prec):
                ks = K.x_kernel(Xin, Xs, log_ls, log_sn, log_lc,
                                with_noise=False, precision=prec)
                mean = jnp.matmul(ks.T, A, precision=prec)
                kik = jnp.matmul(Kinv, ks, precision=prec)
                quad = jnp.sum(ks * kik, axis=0)
                return rotate(Xs, quad), jnp.sum(mean)

            ms = timed(step_unfused, Xs0)
            print(f"N={N:5d}  x unfused XLA {pname:>8}      : {ms:7.4f} ms")

        for (tp, tn), (pname, prec) in [
            ((0, 128), PRECS[0]), ((0, 128), PRECS[1]),
            ((512, 128), PRECS[0]),
        ]:

            def step_fused(Xs, _, tp=tp, tn=tn, prec=prec):
                mean, quad = fused_x_posterior(
                    Xin, Xs, A, Kinv, inv_ls, lin_w, n_valid=N,
                    tile_p=tp, tile_n=tn, mxu_precision=prec,
                )
                return rotate(Xs, quad), jnp.sum(mean)

            label = ("auto" if tp == 0 else f"({tp},{tn})") + f" {pname}"
            try:
                ms = timed(step_fused, Xs0)
                print(f"N={N:5d}  x fused {label:>18}   : {ms:7.4f} ms")
            except Exception as e:  # VMEM overflow at large N
                print(f"N={N:5d}  x fused {label}: FAILED {type(e).__name__}")

        # ---- observation weighting at the same N
        for pname, prec in PRECS[:1]:
            def step_obs_unfused(Xs, _, prec=prec):
                ks = K.rbf_kernel(Xin, Xs, log_ls, precision=prec)
                mean = jnp.matmul(ks.T, Ay, precision=prec)
                kik = jnp.matmul(Kinv, ks, precision=prec)
                quad = jnp.sum(ks * kik, axis=0)
                qres = jnp.sum(lam2 * (mean - z) ** 2, axis=1)
                return rotate(Xs, quad), jnp.sum(qres)

            ms = timed(step_obs_unfused, Xs0)
            print(f"N={N:5d}  obs unfused XLA {pname:>8}    : {ms:7.4f} ms")

        for pname, prec in PRECS:
            def step_obs_fused(Xs, _, prec=prec):
                quad, qres = fused_obs_loglik(Xin, Xs, Ay, Kinv, inv_ls,
                                              z, lam2, mxu_precision=prec)
                return rotate(Xs, quad), jnp.sum(qres)

            try:
                ms = timed(step_obs_fused, Xs0)
                print(f"N={N:5d}  obs fused auto {pname:>8}    : {ms:7.4f} ms")
            except Exception as e:
                print(f"N={N:5d}  obs fused {pname}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
