#!/usr/bin/env python
"""Sweep the compressed-posterior rank at the HEADLINE shape (Ny=480).

Round 3 measured the auto-rank (tol=1e-6 -> qy=80) compressed posterior at
4131 fps / 0.926 accuracy vs the exact path's 2991 / 0.958 — the same fps
as the rejected bf16-quad lever but +0.05 accuracy.  The open question for
the deployment policy (particle_filter.AUTO_COMPRESS_N = 1024): is there a
rank between 80 and N where the variance under-estimate stops costing
accuracy while the quad contraction still beats the exact O(N^2 P)?  If a
mid rank holds the exact path's accuracy at >3.3k fps, auto-compression
can cover the headline shape too.

Usage: python tools/exp_compressed_rank.py [--particles 10000]
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
    ap.add_argument("--ranks", default="auto,120,160,240,320")
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

    pfc = PFConfig(num_particles=args.particles)

    def bench_one(name, post):
        scan = jax.jit(
            lambda s, Z, post, params: pf.pf_scan(
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

        flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]],
                       num_particles=args.particles, config=pfc, seed=0,
                       posterior=post)
        correct = total = 0
        for Zq, label in zip(q_seqs, q_labels):
            flt.reset()
            pred = np.asarray(flt.run(np.asarray(Zq)).most_likely_class)
            correct += (pred[5:] == label).sum()
            total += len(pred) - 5
        acc = correct / total
        qy = post.rank_y if hasattr(post, "Uy") else m.layout.Ny
        qx = post.rank_x if hasattr(post, "Uxc") else "-"
        print(f"{name:>10}: qy={qy:>4} qx={qx:>4}  {fps:8.1f} fps  "
              f"({1000.0 / fps:6.4f} ms/frame)  frame_acc={acc:.4f}",
              flush=True)

    bench_one("exact", m.posterior)
    for spec in args.ranks.split(","):
        if spec == "auto":
            post = m.compressed_posterior()
        else:
            r = int(spec)
            post = m.compressed_posterior(rank_y=r, rank_x=r)
        bench_one(spec, post)


if __name__ == "__main__":
    main()
