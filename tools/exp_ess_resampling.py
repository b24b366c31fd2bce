"""Measure ESS-gated resampling (VERDICT r2 #5): fps, accuracy, resample rate.

Config sweep on the committed bench asset (P=10k, trained d=2 model):
resample_threshold in {1.0 (always, the default), 0.7, 0.5, 0.3} x
systematic resampling, with accumulate_weights=True for the gated rows
(required: skipped frames must carry weights forward).  Reports

- headline-protocol throughput (1000-frame scan, best-of-3),
- banked-eval frame accuracy / F1 on held-out labeled trials,
- the fraction of frames that actually resampled (an instrumented scan:
  a frame resampled iff the post-step log-weights are uniform).

Adoption rule (VERDICT): gated resampling becomes the default only if
accuracy holds >= 0.92 at a measured speedup.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gpmdm_tpu import GPMDM, PFConfig  # noqa: E402
from gpmdm_tpu.data import synthetic  # noqa: E402
from gpmdm_tpu.filter import particle_filter as pf  # noqa: E402
from gpmdm_tpu.utils.metrics import evaluate_pf_banked  # noqa: E402

P, T_FRAMES, D = 10_000, 1000, 35
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    m = GPMDM.load(os.path.join(REPO, "bench_assets", "bench_model.npz"))
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))
    _, _, test_seqs, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=1, seq_len=60, D=D, seed=0
    )
    Z = np.concatenate([np.asarray(s) for s in test_seqs] * 10, axis=0)[:T_FRAMES]
    Z = jnp.asarray(Z, dtype=m.dtype)
    _, _, q_seqs, q_labels = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=6, seq_len=60, D=D, seed=0
    )

    rows = []
    for thresh in (1.0, 0.7, 0.5, 0.3):
        pfc = PFConfig(
            num_particles=P,
            resample_threshold=thresh,
            accumulate_weights=(thresh < 1.0),
        )
        scan = jax.jit(
            lambda s, Z, post, params, pfc=pfc: pf.pf_scan(
                s, Z, post, params, log_T, m.config, pfc
            )
        )
        state = pf.pf_init(
            m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        _, outs = scan(state, Z, m.posterior, m.params)
        jax.block_until_ready(outs.class_probs)
        wall = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _, outs = scan(state, Z, m.posterior, m.params)
            jax.block_until_ready(outs.class_probs)
            wall = min(wall, time.perf_counter() - t0)
        fps = T_FRAMES / wall

        # instrumented scan: resampled iff post-step log_w is uniform
        @jax.jit
        def flag_scan(s, Z, post, params, pfc=pfc):
            def step(s, z):
                s2, _ = pf.pf_step(s, z, post, params, log_T, m.config, pfc)
                resampled = jnp.all(s2.log_w == s2.log_w[0])
                return s2, resampled

            return jax.lax.scan(step, s, Z)

        _, flags = flag_scan(state, Z[:200], m.posterior, m.params)
        rate = float(jnp.mean(flags.astype(jnp.float32)))

        rep = evaluate_pf_banked(
            m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(s) for s in q_seqs],
            q_labels, burn_in=5, seed=0, config=pfc,
        )
        row = {
            "threshold": thresh,
            "accumulate": thresh < 1.0,
            "fps": round(fps, 1),
            "per_frame_ms": round(1000 * wall / T_FRAMES, 4),
            "resample_rate": round(rate, 3),
            "frame_acc": round(rep.frame_metrics["accuracy"], 4),
            "frame_f1": round(rep.frame_metrics["f1"], 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
