"""PF throughput + accuracy in the scale-N regimes (VERDICT r2 #2, #3).

Three datapoint families the headline bench (Ntrain=480) never covers:

- exact-GP PF at Ny in {2048, 5120} — where the O(N^2 P) variance-quad
  contraction dominates the frame budget,
- the same models deployed through the compressed posterior
  (models/compressed.py, O(N q P) quad) at the spectrally-selected rank,
- sparse-SGPR PF (SparsePosterior through the same pf_scan) at Ny=10240,
  M=128 — the "hour-long sequences" BASELINE regime.

Every row carries a banked-eval accuracy guard on held-out labeled trials
(same filter config), so a fast-but-wrong configuration cannot report a
win.  Assets come from tools/train_bench_assets.py (committed).

Usage: python tools/bench_pf_largeN.py [--configs n2048,n5120,sparse10240]
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
P, T_FRAMES, D = 10_000, 500, 35

# Guard shapes live in the package (one protocol, three consumers — the
# CI asset floor imports them too); re-exported here for the sibling
# tools that do `from bench_pf_largeN import SHAPES`.
from gpmdm_tpu.utils.asset_guard import SHAPES  # noqa: E402


def time_scan(scan, state, Z, post, params, reps=3):
    _, outs = scan(state, Z, post, params)
    jax.block_until_ready(outs.class_probs)
    wall = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs = scan(state, Z, post, params)
        jax.block_until_ready(outs.class_probs)
        wall = min(wall, time.perf_counter() - t0)
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="n2048,n5120,sparse10240")
    ap.add_argument("--particles", type=int, default=P)
    ap.add_argument("--sparsify", default="",
                    help="comma list of inducing counts M: ALSO measure "
                         "post-hoc distilled variants "
                         "(GPMDM.sparsified_posterior; exact family only)")
    ap.add_argument("--skip-base", action="store_true",
                    help="measure only the --sparsify variants")
    ap.add_argument("--sparsify-method", default="stride",
                    choices=["stride", "kmeans"],
                    help="inducing-input selection for --sparsify")
    args = ap.parse_args()

    from gpmdm_tpu import GPMDM, PFConfig, SparseGPMDM
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf
    from gpmdm_tpu.utils.metrics import evaluate_pf_banked

    pfc = PFConfig(num_particles=args.particles)

    for name in args.configs.split(","):
        shape = SHAPES[name]
        family, n_seqs, seq_len = shape["family"], shape["n_seqs"], shape["seq_len"]
        C = shape.get("C", 2)
        Dd = shape.get("D", D)
        data_kw = shape.get("data", dict(seed=0))
        guard_len = shape.get("guard_len", seq_len)
        path = os.path.join(REPO, "bench_assets", f"bench_model_{name}.npz")
        if not os.path.exists(path):
            print(json.dumps({"config": name, "skipped": "asset missing"}))
            continue
        cls = GPMDM if family == "exact" else SparseGPMDM
        m = cls.load(path)
        T_mat = np.full((C, C), 0.1 / (C - 1), dtype=np.float64)
        np.fill_diagonal(T_mat, 0.9)
        log_T = jnp.log(jnp.asarray(T_mat, dtype=m.dtype))
        _, _, test_seqs, _ = synthetic.make_dataset(
            n_classes=C, n_train_seqs=1, n_test_seqs=1, seq_len=guard_len,
            D=Dd, **data_kw,
        )
        _, _, q_seqs, q_labels = synthetic.make_dataset(
            n_classes=C, n_train_seqs=1, n_test_seqs=6, seq_len=guard_len,
            D=Dd, **data_kw,
        )
        Z = np.concatenate(
            [np.asarray(s) for s in test_seqs] * (T_FRAMES // guard_len + 1),
            axis=0,
        )[:T_FRAMES]
        Z = jnp.asarray(Z, dtype=m.dtype)

        variants = []
        if not args.skip_base:
            variants.append(
                ("exact" if family == "exact" else "sparse", m.posterior)
            )
            if family == "exact":
                cp = m.compressed_posterior()
                variants.append((f"compressed-q{cp.rank_y}", cp))
        if family == "exact":
            for Mtxt in filter(None, args.sparsify.split(",")):
                spp = m.sparsified_posterior(n_inducing_y=int(Mtxt),
                                             method=args.sparsify_method)
                tag = ("" if args.sparsify_method == "stride"
                       else f"-{args.sparsify_method}")
                variants.append((f"sparsified-M{spp.Zy.shape[0]}{tag}", spp))

        for label, post in variants:
            scan = jax.jit(
                lambda s, Z, post, params: pf.pf_scan(
                    s, Z, post, params, log_T, m.config, pfc
                )
            )
            state = pf.pf_init(
                post, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
            )
            t0 = time.perf_counter()
            wall = time_scan(scan, state, Z, post, m.params)
            compile_s = time.perf_counter() - t0 - 4 * wall
            row = {
                "config": name,
                "variant": label,
                "Ny": int(m.layout.Ny),
                "particles": args.particles,
                "fps": round(T_FRAMES / wall, 1),
                "per_frame_ms": round(1000 * wall / T_FRAMES, 4),
                "compile_s": round(compile_s, 1),
            }
            try:
                rep = evaluate_pf_banked(
                    m, T_mat, [np.asarray(s) for s in q_seqs], q_labels,
                    burn_in=5, seed=0, config=pfc, posterior=post,
                    max_banks=shape.get("guard_banks"),
                )
                row["frame_acc"] = round(rep.frame_metrics["accuracy"], 4)
                row["frame_f1"] = round(rep.frame_metrics["f1"], 4)
            except Exception as e:  # keep the timing row on guard failure
                row["guard_error"] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
