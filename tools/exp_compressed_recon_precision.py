"""Can the compressed quad's RECONSTRUCTION matmul run at fewer MXU passes?

The stable (vector-residual) compressed quad costs two O(N q P) matmuls
per GP: the eigenbasis projection ``a = U^T k`` and the reconstruction
``k - U a`` (docs/BENCHMARKS.md "cancellation bug" section).  At
quad_precision='highest' each is a 6-pass bf16 emulation, so the
reconstruction is ~half the quad's FLOP budget.  Its error enters the
quad damped by ||residual||/||k|| (unlike the scalar form's undamped
eps*||k||^2/s), so it MIGHT tolerate 'high' (3-pass) or 'default'
(1-pass bf16) — a potential ~1.2-1.4x on the large-N compressed rows.

This experiment grids recon_precision over {highest, high, default} on
the committed large-N assets, reporting fps AND the banked accuracy
guard per row (a fast-but-wrong setting cannot report a win).

MEASURED (one v5e chip, P=10k; docs/BENCHMARKS.md "recon-precision
grid"): the answer is config-dependent — n5120 (q/N=0.037) runs
'default' at +11% fps over 'high' at full accuracy (315.8 fps, 0.9989),
while the flat-spectrum c8n5120 (q/N=0.25) collapses to 0.43 accuracy
at 'default'.  'high' (= the quad fallback) stays the shipped default;
PFConfig(recon_precision=...) / eval --recon-precision is the opt-in.

Usage: python tools/exp_compressed_recon_precision.py [--configs n5120,c8n5120]
"""

from __future__ import annotations

import argparse
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
P, T_FRAMES = 10_000, 200

SHAPES = {
    "n2048": dict(n_seqs=16, seq_len=64, C=2, D=35, data=dict(seed=0)),
    "n5120": dict(n_seqs=32, seq_len=80, C=2, D=35, data=dict(seed=0)),
    "c8n5120": dict(n_seqs=8, seq_len=80, C=8, D=10, guard_banks=16,
                    data=dict(center_spread=3.0, class_signature=1.0,
                              seed=21)),
}

_PRECS = ("highest", "high", "default")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="n5120,c8n5120")
    ap.add_argument("--particles", type=int, default=P)
    args = ap.parse_args()

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf
    from gpmdm_tpu.utils.metrics import evaluate_pf_banked

    for name in args.configs.split(","):
        shape = SHAPES[name]
        C, Dd = shape["C"], shape["D"]
        path = os.path.join(REPO, "bench_assets", f"bench_model_{name}.npz")
        if not os.path.exists(path):
            print(json.dumps({"config": name, "skipped": "asset missing"}))
            continue
        m = GPMDM.load(path)
        cp = m.compressed_posterior()
        T_mat = np.full((C, C), 0.1 / (C - 1), dtype=np.float64)
        np.fill_diagonal(T_mat, 0.9)
        log_T = jnp.log(jnp.asarray(T_mat, dtype=m.dtype))
        _, _, test_seqs, _ = synthetic.make_dataset(
            n_classes=C, n_train_seqs=1, n_test_seqs=1,
            seq_len=shape["seq_len"], D=Dd, **shape["data"],
        )
        _, _, q_seqs, q_labels = synthetic.make_dataset(
            n_classes=C, n_train_seqs=1, n_test_seqs=6,
            seq_len=shape["seq_len"], D=Dd, **shape["data"],
        )
        Z = np.concatenate(
            [np.asarray(s) for s in test_seqs]
            * (T_FRAMES // shape["seq_len"] + 1),
            axis=0,
        )[:T_FRAMES]
        Z = jnp.asarray(Z, dtype=m.dtype)

        for rp_name in _PRECS:
            # recon_precision is a first-class PFConfig knob; distinct
            # configs hash differently, so each row traces fresh.
            pfc = PFConfig(num_particles=args.particles,
                           recon_precision=rp_name)
            scan = jax.jit(
                lambda s, Z, post, params, _cfg=m.config, _pfc=pfc: pf.pf_scan(
                    s, Z, post, params, log_T, _cfg, _pfc
                )
            )
            state = pf.pf_init(
                cp, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
            )
            _, outs = scan(state, Z, cp, m.params)
            jax.block_until_ready(outs.class_probs)
            wall = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                _, outs = scan(state, Z, cp, m.params)
                jax.block_until_ready(outs.class_probs)
                wall = min(wall, time.perf_counter() - t0)
            rep = evaluate_pf_banked(
                m, T_mat, [np.asarray(s) for s in q_seqs], q_labels,
                burn_in=5, seed=0, config=pfc, posterior=cp,
                max_banks=shape.get("guard_banks"),
            )
            print(json.dumps({
                "config": name,
                "recon_precision": rp_name,
                "rank_y": cp.rank_y,
                "fps": round(T_FRAMES / wall, 1),
                "per_frame_ms": round(1000 * wall / T_FRAMES, 4),
                "frame_acc": round(rep.frame_metrics["accuracy"], 4),
                "frame_f1": round(rep.frame_metrics["f1"], 4),
            }), flush=True)


if __name__ == "__main__":
    main()
