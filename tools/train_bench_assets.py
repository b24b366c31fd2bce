"""Train and commit the large-N / sparse bench assets (round-3 VERDICT #2).

The headline bench asset covers Ntrain=480; the scale-regime datapoints
(exact PF at Ny in {2048, 5120}, sparse PF at Ny=10240) need their own
trained checkpoints — PF numerics on untrained models are degenerate and
the accuracy guard meaningless (bench_assets/README).  Training runs on
whatever device the session resolves (TPU via the tunnel: exact Ny=2048
~1.5 steps/s, sparse Ny=10240 ~4.9 steps/s — docs/BENCHMARKS.md).

Usage: python tools/train_bench_assets.py --config n2048|n5120|sparse10240
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# scratch compile cache (NOT the committed bench cache: training programs
# would bloat it and the driver's bench never trains)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Ny = n_classes * n_train_seqs * seq_len
CONFIGS = {
    # name: (family, n_train_seqs/class, seq_len, steps, extra)
    "n2048": ("exact", 16, 64, 200, {}),
    "n5120": ("exact", 32, 80, 150, {}),
    "sparse10240": ("sparse", 64, 80, 300, {"m_y": 128, "m_x": 128}),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, choices=sorted(CONFIGS))
    ap.add_argument("--steps", type=int, default=None)
    args = ap.parse_args()
    family, n_seqs, seq_len, steps, extra = CONFIGS[args.config]
    if args.steps is not None:
        steps = args.steps

    from gpmdm_tpu.data import synthetic

    D, d, C = 35, 2, 2
    tr, lb, _, _ = synthetic.make_dataset(
        n_classes=C, n_train_seqs=n_seqs, n_test_seqs=1, seq_len=seq_len,
        D=D, seed=0,
    )
    Ny = sum(len(Y) for Y in tr)
    print(f"[{args.config}] family={family} Ny={Ny} steps={steps}", flush=True)

    t0 = time.time()
    if family == "exact":
        from gpmdm_tpu import GPMDM

        m = GPMDM(
            D=D, d=d, n_classes=C, dtype="float32",
            y_sigma_n_init=0.1, x_sigma_n_init=0.1,
        )
    else:
        from gpmdm_tpu import SparseGPMDM

        m = SparseGPMDM(
            D=D, d=d, n_classes=C, dtype="float32",
            y_sigma_n_init=0.1, x_sigma_n_init=0.1,
            n_inducing_y=extra["m_y"], n_inducing_x=extra["m_x"],
        )
    for Y, c in zip(tr, lb):
        m.add_data(Y, c)
    m.init_X()
    losses = m.train_adam(num_opt_steps=steps, num_print_steps=max(steps // 5, 1), lr=0.01)
    out = os.path.join(REPO, "bench_assets", f"bench_model_{args.config}.npz")
    m.save(out)
    print(
        f"[{args.config}] trained in {time.time() - t0:.0f}s "
        f"(loss {losses[0]:.3e} -> {losses[-1]:.3e}), saved {out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
