"""Interleaved A/B: flat-bank vs vmap-bank PF throughput on the real chip.

Round-4 VERDICT #4 (the ~35% banked-vmap tax).  Arms share one process
and interleave rounds (run-to-run drift on the tunnel is ~6%); each arm
prints an accuracy fingerprint so a silently-identical compilation or a
numerically-broken win cannot pass as a verdict (the PFConfig
quad-precision post-mortem rule, docs/BENCHMARKS.md).

Configs measured (BASELINE bank shapes):
  12 x 10k on the headline asset   (round-3: vmap 0.47 vs single 0.34
                                    ms/bank-frame; target <= 0.38)
  64 x 1k  on the headline asset   (round-3 exact agg 21.9k fps;
                                    target >= 25k)

Run: python tools/exp_bank_flat.py [--frames 200] [--rounds 3]
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
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf

    m = GPMDM.load(str(REPO / "bench_assets" / "bench_model.npz"))
    _, _, te, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=2, seq_len=60, D=35, seed=0
    )
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))
    # warm transfer path before any timing (CLAUDE.md: block_until_ready
    # is a no-op before the first fetch)
    np.asarray(jnp.zeros(1) + 0)

    T = args.frames
    base = np.concatenate([np.asarray(s) for s in te])

    for B, Pb in ((12, 10_000), (64, 1_000)):
        Z1 = base[np.arange(T) % len(base)]
        Zb = jnp.asarray(np.broadcast_to(Z1, (B, T, m.D)).copy(), dtype=m.dtype)
        arms = {}
        for impl in ("vmap", "flat"):
            pfc = PFConfig(num_particles=Pb, bank_impl=impl)
            states = pf.pf_init_bank(
                m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0),
                pfc, B,
            )
            fn = jax.jit(
                lambda s, z, _pfc=pfc: pf.pf_scan_bank(
                    s, z, m.posterior, m.params, log_T, m.config, _pfc
                )
            )
            t0 = time.perf_counter()
            _, outs = fn(states, Zb)
            jax.block_until_ready(outs.class_probs)
            compile_s = time.perf_counter() - t0
            arms[impl] = dict(fn=fn, states=states, compile_s=compile_s,
                              best=np.inf, fp=None)
        for _ in range(args.rounds):
            for impl, arm in arms.items():
                t0 = time.perf_counter()
                _, outs = arm["fn"](arm["states"], Zb)
                jax.block_until_ready(outs.class_probs)
                arm["best"] = min(arm["best"], time.perf_counter() - t0)
                arm["fp"] = float(np.mean(np.asarray(outs.class_probs)[:, :, 0]))
        rec = {"bank": f"{B}x{Pb}", "frames": T}
        for impl, arm in arms.items():
            rec[f"{impl}_ms_per_bank_frame"] = round(
                arm["best"] / (T) * 1e3, 4
            )
            rec[f"{impl}_agg_fps"] = round(B * T / arm["best"], 1)
            rec[f"{impl}_fingerprint_p0"] = round(arm["fp"], 6)
            rec[f"{impl}_compile_s"] = round(arm["compile_s"], 1)
        rec["flat_speedup"] = round(
            arms["vmap"]["best"] / arms["flat"]["best"], 3
        )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
