"""CPU accuracy guard for bench assets (deployment-point selection).

Runs the same held-out banked-guard protocol as tools/bench_pf_largeN.py
but on CPU at a modest particle count — fast enough to sweep the
checkpoints `train_bench_assets.py --save-at` produces and pick the
deployment point by MEASURED filter accuracy instead of the NaN-freeze
point (measured: the params frozen at the f32 NaN cliff are degenerate —
hourlong step-319 scores 0.62 where step-159 scores 0.82).

Usage: python tools/eval_asset_guard.py --config hourlong \
           [--files bench_assets/bench_model_hourlong_s*.npz] [--particles 500]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
else:
    # TPU path: reuse the repo-committed bench cache (bench.py warms it;
    # the bench guard shapes are warm there — pass --particles 10000 to
    # hit them).  /tmp caches do not survive fresh containers (CLAUDE.md).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_assets", "jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from bench_pf_largeN import SHAPES  # sibling tool: guard protocol source

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, choices=sorted(SHAPES))
    ap.add_argument("--files", nargs="*", default=None)
    ap.add_argument("--particles", type=int, default=500)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the session TPU (handled at import)")
    args = ap.parse_args()

    from gpmdm_tpu import GPMDM, PFConfig, SparseGPMDM
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.utils.metrics import evaluate_pf_banked

    shape = SHAPES[args.config]
    C = shape.get("C", 2)
    Dd = shape.get("D", 35)
    data_kw = shape.get("data", dict(seed=0))
    guard_len = shape.get("guard_len", shape["seq_len"])
    files = args.files or sorted(
        glob.glob(
            os.path.join(REPO, "bench_assets",
                         f"bench_model_{args.config}_s*.npz")
        )
    ) or [os.path.join(REPO, "bench_assets",
                       f"bench_model_{args.config}.npz")]

    _, _, q_seqs, q_labels = synthetic.make_dataset(
        n_classes=C, n_train_seqs=1, n_test_seqs=6, seq_len=guard_len,
        D=Dd, **data_kw,
    )
    T_mat = np.full((C, C), 0.1 / (C - 1), dtype=np.float64)
    np.fill_diagonal(T_mat, 0.9)
    pfc = PFConfig(num_particles=args.particles)
    cls = GPMDM if shape["family"] == "exact" else SparseGPMDM
    for path in files:
        m = cls.load(path)
        rep = evaluate_pf_banked(
            m, T_mat, [np.asarray(s) for s in q_seqs], q_labels,
            burn_in=5, seed=0, config=pfc,
            max_banks=shape.get("guard_banks"),
        )
        print(
            json.dumps(
                {
                    "file": os.path.basename(path),
                    "particles": args.particles,
                    "frame_acc": round(rep.frame_metrics["accuracy"], 4),
                    "frame_f1": round(rep.frame_metrics["f1"], 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
