"""Looped vs banked evaluation latency on the real chip.

Streams B labeled trials through the filter both ways (bench asset,
10k particles) and reports warm wall time — the banked path collapses
B dispatches (each paying ~25 ms tunnel RTT here) into one.

Run: python tools/bench_banked_eval.py [--trials 12]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=12)
    ap.add_argument("--particles", type=int, default=10_000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gpmdm_tpu import GPMDM, GPMDM_PF, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.utils.metrics import evaluate_pf, evaluate_pf_banked

    m = GPMDM.load(str(REPO / "bench_assets" / "bench_model.npz"))
    _, _, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=args.trials // 2,
        seq_len=60, D=35, seed=0,
    )
    seqs = [np.asarray(Z) for Z in te][: args.trials]
    labels = list(tel)[: args.trials]
    T = [[0.9, 0.1], [0.1, 0.9]]
    pfc = PFConfig(num_particles=args.particles)

    # looped: warm once (compile), then time
    flt = GPMDM_PF(m, T, num_particles=args.particles, config=pfc, seed=0)
    evaluate_pf(flt, seqs, labels, n_classes=2, burn_in=5)
    flt = GPMDM_PF(m, T, num_particles=args.particles, config=pfc, seed=0)
    t0 = time.perf_counter()
    looped = evaluate_pf(flt, seqs, labels, n_classes=2, burn_in=5)
    looped_s = time.perf_counter() - t0

    # banked: warm once, then time
    evaluate_pf_banked(m, T, seqs, labels, burn_in=5, seed=0, config=pfc)
    t0 = time.perf_counter()
    banked = evaluate_pf_banked(m, T, seqs, labels, burn_in=5, seed=0,
                                config=pfc)
    banked_s = time.perf_counter() - t0

    print(json.dumps({
        "trials": len(seqs),
        "particles": args.particles,
        "looped_s": round(looped_s, 3),
        "banked_s": round(banked_s, 3),
        "speedup": round(looped_s / banked_s, 2),
        "looped_frame_acc": round(looped.frame_metrics["accuracy"], 4),
        "banked_frame_acc": round(banked.frame_metrics["accuracy"], 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
