"""CPU accuracy guard for bench assets (deployment-point selection).

Runs the same held-out banked-guard protocol as tools/bench_pf_largeN.py
but on CPU at a modest particle count — fast enough to sweep the
checkpoints `train_bench_assets.py --save-at` produces and pick the
deployment point by MEASURED filter accuracy instead of the NaN-freeze
point (measured: the params frozen at the f32 NaN cliff are degenerate —
hourlong step-319 scores 0.62 where step-159 scores 0.82).

Usage: python tools/eval_asset_guard.py --config hourlong \
           [--files bench_assets/bench_model_hourlong_s*.npz] [--particles 500]

Distillation-deployment selection (guard-arbitrated, docs/DEPLOY.md):
sweep (M, method) grid points of the post-hoc SGPR distillation under
the same guard and bake the cheapest point meeting an accuracy bar:

    python tools/eval_asset_guard.py --config c8n5120 \
        --sparsify-grid 128,256,384 --methods kmeans,stride \
        --bar 0.99 --bake [--tpu]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from gpmdm_tpu.utils.asset_guard import SHAPES, guard_score

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, choices=sorted(SHAPES))
    ap.add_argument("--files", nargs="*", default=None)
    ap.add_argument("--particles", type=int, default=500)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the session TPU (handled at import)")
    ap.add_argument("--sparsify-grid", default="",
                    help="comma list of inducing counts M: sweep post-hoc "
                         "distillations (GPMDM.sparsified_posterior) under "
                         "the guard instead of the model's own posterior")
    ap.add_argument("--methods", default="stride,kmeans",
                    help="selection methods to cross with --sparsify-grid")
    ap.add_argument("--bar", type=float, default=None,
                    help="accuracy bar for --bake selection: the cheapest "
                         "(smallest-M) grid point meeting it wins")
    ap.add_argument("--bake", action="store_true",
                    help="re-save the checkpoint with ONLY the winning "
                         "grid point's factors persisted (guard-arbitrated "
                         "deployment selection, docs/DEPLOY.md)")
    ap.add_argument("--stamp", action="store_true",
                    help="write the measured score into the checkpoint as "
                         "a guard receipt (meta guard_receipt: platform, "
                         "particles, acc/f1, params sha256).  CI "
                         "(tests/test_bench_assets.py) refuses committed "
                         "assets whose params changed without a fresh "
                         "receipt — run with --tpu for deployment assets.")
    args = ap.parse_args()
    if args.bake and (not args.sparsify_grid or args.bar is None):
        ap.error("--bake requires --sparsify-grid and --bar")

    from gpmdm_tpu import GPMDM, SparseGPMDM

    shape = SHAPES[args.config]
    files = args.files or sorted(
        glob.glob(
            os.path.join(REPO, "bench_assets",
                         f"bench_model_{args.config}_s*.npz")
        )
    ) or [os.path.join(REPO, "bench_assets",
                       f"bench_model_{args.config}.npz")]

    cls = GPMDM if shape["family"] == "exact" else SparseGPMDM

    def guard(m, posterior=None):
        return guard_score(m, args.config, particles=args.particles,
                           posterior=posterior)

    for path in files:
        m = cls.load(path)
        if not args.sparsify_grid:
            if args.stamp:
                # a receipt certifies the asset AS DEPLOYED: score through
                # resolve_posterior('auto') (baked recommendation / size
                # policy), the path bench.py and the CLI eval serve on —
                # not the raw exact posterior a recommendation supersedes.
                import warnings

                from gpmdm_tpu.filter.particle_filter import resolve_posterior

                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    deploy_post = resolve_posterior(m, "auto")
                acc, f1 = guard(m, posterior=deploy_post)
            else:
                acc, f1 = guard(m)
            row = {
                "file": os.path.basename(path),
                "particles": args.particles,
                "frame_acc": round(acc, 4),
                "frame_f1": round(f1, 4),
            }
            if args.stamp:
                from gpmdm_tpu.utils.asset_guard import make_receipt

                m._guard_receipt = make_receipt(
                    m, args.config, args.particles, acc, f1
                )
                m._guard_receipt["posterior"] = type(deploy_post).__name__
                m.save(path)
                row["stamped"] = m._guard_receipt["platform"]
            print(json.dumps(row), flush=True)
            continue
        # distillation-deployment sweep: score every (M, method) grid
        # point with the SAME guard, then (--bake) persist only the
        # cheapest point meeting --bar.  Smallest M = fastest filter
        # (star kernel is (M, P)); methods tie-break in --methods order.
        if not getattr(m, "_deploys_core_posterior", False):
            print(json.dumps({"file": os.path.basename(path),
                              "skipped": "not exact family"}))
            continue
        best = None  # (M, method_index, acc, key)
        methods = [s for s in args.methods.split(",") if s]
        for M in [int(x) for x in args.sparsify_grid.split(",") if x]:
            for mi, meth in enumerate(methods):
                sp = m.sparsified_posterior(M, method=meth)
                acc, f1 = guard(m, posterior=sp)
                print(
                    json.dumps(
                        {
                            "file": os.path.basename(path),
                            "variant": f"sparsified-M{sp.Zy.shape[0]}-{meth}",
                            "particles": args.particles,
                            "frame_acc": round(acc, 4),
                            "frame_f1": round(f1, 4),
                        }
                    ),
                    flush=True,
                )
                if args.bar is not None and acc >= args.bar:
                    cand = (M, mi, acc)
                    if best is None or cand[:2] < best[:2]:
                        key = (int(M), None) if meth == "stride" \
                            else (int(M), None, meth)
                        best = (M, mi, acc, key)
        if args.bar is not None:
            if best is None:
                print(json.dumps({"file": os.path.basename(path),
                                  "selected": None,
                                  "note": f"no grid point met bar {args.bar}"}),
                      flush=True)
                continue
            M, mi, acc, key = best
            print(json.dumps({"file": os.path.basename(path),
                              "selected": f"M={M} method={methods[mi]}",
                              "frame_acc": round(acc, 4)}), flush=True)
            if args.bake:
                # persist ONLY the winner: the sweep's other factors
                # would otherwise all ride along in the checkpoint
                m._sparsified_cache = {key: m._sparsified_cache[key]}
                # guard-arbitrated deployment recommendation: the
                # checkpoint's 'auto' deployments now resolve to this
                # measured winner instead of the size thresholds
                # (resolve_posterior; round-4 VERDICT #2)
                m._deploy_recommendation = {
                    "family": "sparsified", "M": int(M),
                    "method": methods[mi], "guard_frame_acc": float(acc),
                    "guard_particles": int(args.particles),
                }
                m.save(path)
                print(json.dumps({"file": os.path.basename(path),
                                  "baked": list(key)}), flush=True)


if __name__ == "__main__":
    main()
