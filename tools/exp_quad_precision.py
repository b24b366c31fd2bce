#!/usr/bin/env python
"""Measure the quad-precision lever: bf16 variance-quad matmuls.

The PF's two biggest matmuls are the variance-quad products
Kinv @ Kstar (observation) and its per-class dynamics analogue — together
~0.25 ms of the 0.43 ms frame at P=10k, N=480.  Quad errors perturb only
the predictive variance (never the mean), so unlike the star kernel —
where 1-pass bf16 measured chance-level accuracy — the quad matmul is a
candidate for bf16.

Runs the headline bench config (committed trained asset, so posterior
values are realistic) under three PFConfigs and reports fps + held-out
frame accuracy for each:

  high/high      — current default (precision='high')
  high/bf16      — precision='high', quad_precision='default'  (the lever)
  bf16/bf16      — precision='default'                (known-bad reference)

Usage: python tools/exp_quad_precision.py [--particles 10000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--sparsify", type=int, default=None, metavar="M",
                    help="measure the DISTILLED (SGPR M-inducing, kmeans) "
                         "backend instead of exact: quad_precision there "
                         "selects tri-solve ('trisolve' — the explicit "
                         "opt-out; distilled posteriors default to "
                         "hoisted-inverse 'high' since round 5) vs "
                         "hoisted-inverse matmuls at the given MXU "
                         "passes — the (M, M) solves are far better "
                         "conditioned than the exact quad, so bf16 is a "
                         "candidate (round-4 VERDICT #8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gpmdm_tpu import GPMDM, GPMDM_PF, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf

    m = GPMDM.load(REPO / "bench_assets" / "bench_model.npz")
    D = m.D
    from gpmdm_tpu.utils.profiling import warm_transport

    warm_transport()  # block_until_ready is a no-op before the first fetch
    print(f"device={jax.devices()[0]} P={args.particles} Ntrain={m.layout.Ny}")

    _, _, test_seqs, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=1, seq_len=60, D=D, seed=0
    )
    Z = np.concatenate([np.asarray(s) for s in test_seqs] * 10, axis=0)[: args.frames]
    Z = jnp.asarray(Z, dtype=m.dtype)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))

    _, _, q_seqs, q_labels = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=6, seq_len=60, D=D, seed=0
    )

    if args.sparsify:
        post = m.sparsified_posterior(args.sparsify, method="kmeans")
        variants = [
            # distilled posteriors now DEFAULT to inv-matmul 'high'
            # (round-5 grid verdict); 'trisolve' is the explicit opt-out
            # that keeps this arm a different compiled program from the
            # inv-matmul arms (CLAUDE.md: equal-reading A/B arms must be
            # verified to compile different executables)
            ("tri-solve (opt-out)", dict(precision="high",
                                         quad_precision="trisolve")),
            ("default (inv-matmul high)", dict(precision="high")),
            ("inv-matmul highest", dict(precision="high",
                                        quad_precision="highest")),
            ("inv-matmul high", dict(precision="high",
                                     quad_precision="high")),
            ("inv-matmul bf16", dict(precision="high",
                                     quad_precision="default")),
        ]
    else:
        post = m.posterior
        variants = [
            ("high/high", dict(precision="high")),
            # the committed asset scores 1.0 on this guard protocol on CPU
            # (true f32) vs 0.95 at TPU high/high — if the 6-pass quad
            # recovers it, the headline accuracy gap is quad bf16x3 error,
            # not model quality
            ("high/highest-quad", dict(precision="high",
                                       quad_precision="highest")),
            ("high/bf16-quad", dict(precision="high",
                                    quad_precision="default")),
            ("bf16/bf16", dict(precision="default")),
            # opt-in fused kernels forced on at the bench shape — measured
            # slower than XLA (1678 vs 2316 fps) and accuracy-lossy (0.715)
            # at this asset's near-singular posteriors; kept as the
            # regression arbitration for the 'on' path (_use_pallas)
            ("pallas-forced", dict(precision="high", pallas="on")),
        ]
    for name, kw in variants:
        pfc = PFConfig(num_particles=args.particles, **kw)
        scan = jax.jit(
            lambda s, Z, post, params, pfc=pfc: pf.pf_scan(
                s, Z, post, params, log_T, m.config, pfc
            )
        )
        state = pf.pf_init(
            post, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        _, outs = scan(state, Z, post, m.params)
        jax.block_until_ready(outs.class_probs)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _, outs = scan(state, Z, post, m.params)
            jax.block_until_ready(outs.class_probs)
            best = min(best, time.perf_counter() - t0)
        fps = args.frames / best

        # posterior='exact': this experiment measures the EXACT quad at
        # each MXU precision — the auto policy would swap in compression
        flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]],
                       num_particles=args.particles, config=pfc, seed=0,
                       posterior=post if args.sparsify else "exact")
        correct = total = 0
        for Zq, label in zip(q_seqs, q_labels):
            flt.reset()
            pred = np.asarray(flt.run(np.asarray(Zq)).most_likely_class)
            correct += (pred[5:] == label).sum()
            total += len(pred) - 5
        acc = correct / total
        print(f"{name:>16}: {fps:8.1f} fps  ({1000.0 / fps:6.4f} ms/frame)  "
              f"frame_acc={acc:.4f}")


if __name__ == "__main__":
    main()
