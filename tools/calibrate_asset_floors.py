"""One-shot calibration of the CI asset-accuracy floors.

Scores every committed bench asset on CPU at the CI guard settings
(P=500, auto deployment path) so tests/test_bench_assets.py floors are
set from MEASURED values, not guesses.  Run after retraining any asset.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# asset file -> guard config (gpmdm_tpu.utils.asset_guard.SHAPES)
ASSET_CONFIGS = {
    "bench_model.npz": "headlinef",
    "bench_model_headlinef.npz": "headlinef",
    "bench_model_d4.npz": "d4f",
    "bench_model_d4f.npz": "d4f",
    "bench_model_c8.npz": "c8",
    "bench_model_n2048.npz": "n2048",
    "bench_model_n5120.npz": "n5120",
    "bench_model_sparse10240.npz": "sparse10240",
    "bench_model_c8n5120.npz": "c8n5120",
    "bench_model_hourlong.npz": "hourlong",
    "bench_model_hourlongh.npz": "hourlong",
}


def main() -> None:
    import warnings

    from gpmdm_tpu.filter.particle_filter import resolve_posterior
    from gpmdm_tpu.utils.asset_guard import guard_score, load_asset

    for name, cfg in ASSET_CONFIGS.items():
        path = os.path.join(REPO, "bench_assets", name)
        if not os.path.exists(path):
            print(json.dumps({"file": name, "skipped": "missing"}), flush=True)
            continue
        t0 = time.perf_counter()
        m = load_asset(path)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            post = resolve_posterior(m, "auto")
        acc, f1 = guard_score(m, cfg, particles=500, posterior=post)
        print(
            json.dumps(
                {
                    "file": name,
                    "config": cfg,
                    "deploy": type(post).__name__,
                    "frame_acc": round(float(acc), 4),
                    "frame_f1": round(float(f1), 4),
                    "wall_s": round(time.perf_counter() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
