"""PF throughput vs particle count on the real chip (bench asset).

Run: python tools/bench_pf_scaling.py [--particles 1000 3000 10000 30000 100000]
Prints one JSON line per P with best-of-3 fps over a 500-frame scan.
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
    ap.add_argument("--particles", type=int, nargs="+",
                    default=[1000, 3000, 10_000, 30_000, 100_000])
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--compressed", action="store_true",
                    help="deploy the low-rank compressed posterior "
                         "(models/compressed.py) instead of the exact one")
    ap.add_argument("--sparsify", type=int, default=0, metavar="M",
                    help="deploy the post-hoc SGPR distillation "
                         "(GPMDM.sparsified_posterior) at M inducing points")
    ap.add_argument("--quad-precision", default=None,
                    choices=["default", "high", "highest"],
                    help="PFConfig.quad_precision (sparse backends: the "
                         "hoisted-inverse MXU variance path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf

    m = GPMDM.load(str(REPO / "bench_assets" / "bench_model.npz"))
    _, _, te, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=1, seq_len=60, D=35, seed=0
    )
    Z = jnp.asarray(
        np.concatenate([np.asarray(s) for s in te] * 20, axis=0)[: args.frames],
        dtype=m.dtype,
    )
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))
    if args.sparsify:
        post = m.sparsified_posterior(args.sparsify)
        post_label = f"sparsified-M{args.sparsify}"
    elif args.compressed:
        post, post_label = m.compressed_posterior(), "compressed"
    else:
        post, post_label = m.posterior, "exact"

    for P in args.particles:
        pfc = PFConfig(num_particles=P, quad_precision=args.quad_precision)
        scan = jax.jit(
            lambda s, Z, post, params, pfc=pfc: pf.pf_scan(
                s, Z, post, params, log_T, m.config, pfc
            )
        )
        state = pf.pf_init(
            post, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        _, outs = scan(state, Z, post, m.params)
        jax.block_until_ready(outs.class_probs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, outs = scan(state, Z, post, m.params)
            jax.block_until_ready(outs.class_probs)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "particles": P,
            "posterior": post_label,
            "fps": round(args.frames / best, 1),
            "ms_per_frame": round(best / args.frames * 1e3, 4),
            "device": str(jax.devices()[0]),
        }), flush=True)


if __name__ == "__main__":
    main()
