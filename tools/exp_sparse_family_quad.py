#!/usr/bin/env python
"""Sparse-FAMILY variance-path A/B: tri-solve vs hoisted-inverse 'highest'.

Round 5 flipped the POST-HOC DISTILLED default to hoisted-inverse 'high'
(measured strictly better).  The natively-trained sparse family kept the
tri-solve default because 'high' regresses its hourlong deployment
(0.9994 -> 0.9817, round 4) — but hoisted inverses at **'highest'** MXU
precision were never measured there: if the regression is quad-matmul
error (not the hoisting itself), 'highest' should hold the guard while
still replacing two per-frame (M, M) triangular solves with matmuls
that XLA can hoist out of the scan.

Protocol (CLAUDE.md TPU A/B rules): one process, arms interleaved,
best-of-N timed rounds on a warm fetch, a banked guard accuracy per arm
as both the quality verdict AND the compiled-program fingerprint (the
tri-solve and hoisted arms produce different executables; equal fps with
equal fingerprints would mean a silent fallback — the PFConfig
'trisolve' pitfall this repo already hit once).

Usage: python tools/exp_sparse_family_quad.py [--particles 10000]
           [--frames 1000] [--rounds 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, "bench_assets", "jax_cache")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gpmdm_tpu import SparseGPMDM
    from gpmdm_tpu.config import PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf
    from gpmdm_tpu.utils.asset_guard import guard_trials
    from gpmdm_tpu.utils.metrics import evaluate_pf_banked

    m = SparseGPMDM.load(os.path.join(REPO, "bench_assets",
                                      "bench_model_hourlong.npz"))
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))
    _, _, seqs, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=1, n_test_seqs=2, seq_len=600, D=m.D, seed=1,
    )
    Z = jnp.asarray(
        np.concatenate([np.asarray(s) for s in seqs] * 10, axis=0)[: args.frames],
        dtype=m.dtype,
    )
    g_seqs, g_labels, g_T = guard_trials("hourlong")

    # warm the transfer path BEFORE any timing (CLAUDE.md: the first
    # device->host fetch measures tunnel init, not compute)
    np.asarray(jnp.zeros(1) + 0)

    arms = [
        ("trisolve (default)", PFConfig(num_particles=args.particles)),
        ("hoisted-highest", PFConfig(num_particles=args.particles,
                                     quad_precision="highest")),
        ("hoisted-high (known regression)",
         PFConfig(num_particles=args.particles, quad_precision="high")),
    ]
    runs = []
    for name, pfc in arms:
        scan = jax.jit(
            lambda s, Z, post, params, pfc=pfc: pf.pf_scan(
                s, Z, post, params, log_T, m.config, pfc
            )
        )
        state = pf.pf_init(
            m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        t0 = time.perf_counter()
        _, outs = scan(state, Z, m.posterior, m.params)
        jax.block_until_ready(outs.class_probs)
        compile_s = time.perf_counter() - t0
        runs.append({"name": name, "pfc": pfc, "scan": scan, "state": state,
                     "compile_s": compile_s, "best": np.inf})

    for _ in range(args.rounds):  # interleaved timing
        for r in runs:
            t0 = time.perf_counter()
            _, outs = r["scan"](r["state"], Z, m.posterior, m.params)
            jax.block_until_ready(outs.class_probs)
            r["best"] = min(r["best"], time.perf_counter() - t0)

    for r in runs:  # guard per arm (quality verdict + program fingerprint)
        rep = evaluate_pf_banked(
            m, g_T, g_seqs, g_labels, burn_in=5, seed=0, config=r["pfc"],
        )
        print(json.dumps({
            "arm": r["name"],
            "particles": args.particles,
            "fps": round(args.frames / r["best"], 1),
            "ms_per_frame": round(1e3 * r["best"] / args.frames, 4),
            "compile_s": round(r["compile_s"], 1),
            "guard_acc": round(float(rep.frame_metrics["accuracy"]), 4),
            "guard_f1": round(float(rep.frame_metrics["f1"]), 4),
        }))


if __name__ == "__main__":
    main()
