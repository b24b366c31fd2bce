"""Measure the fused mean+quad posterior matmul vs the unfused split.

The exact/compressed posterior hot paths can fuse the GP mean matmul
into the variance-quad/projection matmul against the shared (N, P) star
kernel (models/core.py predict_y / predict_x_all_classes;
models/compressed.py; gated by PFConfig.fuse_mean_quad):

  [A^T; K_inv] @ Kstar  ->  (D+N, P), split rows

one MXU call instead of two, one fewer HBM read of Kstar per GP per
frame.  Measured (one v5e, P=10k, 1000-frame scans) the win is
CONFIG-DEPENDENT: headline C=2 Ny=480 both-fused +4.3% (3229 vs 3096
fps) at bit-identical variances, but the C=8 Ny=960 asset loses ~23%
whenever the per-class x-GP is fused (1163/1195 vs 1558 fps; y-only
-3.6%) — the batched (C, d+n, n) lhs breaks XLA's einsum tiling.  Hence
the auto gate: fuse iff n_classes <= 2 (docs/BENCHMARKS.md).

This tool forces each GP's grouping via the predict functions' ``fused``
kwarg and measures all requested modes, so the comparison stays
reproducible after adoption.  Supports any committed asset and the
banked scan.

Usage:
  python tools/exp_fused_mean_quad.py                    # headline asset
  python tools/exp_fused_mean_quad.py --model bench_model_c8.npz --skip-guard
  python tools/exp_fused_mean_quad.py --banks 12         # banked mode
  python tools/exp_fused_mean_quad.py --modes fused,unfused,y-only,x-only
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bench_model.npz")
    ap.add_argument("--particles", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--banks", type=int, default=0,
                    help="measure a B-bank vmapped scan instead of a single filter")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-guard", action="store_true")
    ap.add_argument(
        "--modes", default="fused,unfused",
        help="comma list of {auto,fused,unfused,y-only,x-only}: which GP "
             "predictions use the fused matmul (auto = the shipped "
             "n_classes gate)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf
    from gpmdm_tpu.models import core
    from gpmdm_tpu.utils.metrics import evaluate_pf_banked

    # ---- per-GP fusion forcing via the predict functions' kwarg -----------
    def force(fn, val):
        def wrapped(*a, **kw):
            kw["fused"] = val
            return fn(*a, **kw)

        return wrapped

    # ---- statically-unrolled per-class x-GP variant -----------------------
    # Hypothesis from the C=8 fusion loss: the batched (C, d+n, n) einsum lhs
    # is what breaks XLA's tiling, not the concatenation itself.  Unrolling
    # the class axis into C separate (d+n, n) @ (n, P) matmuls (C is static)
    # gives XLA one plain matmul per class to tile.
    from gpmdm_tpu.ops import kernels as K

    def make_unrolled_x(fuse_per_class: bool):
        def predict_x_unrolled(post, params, Xstar, cfg, with_noise=False,
                               precision=None, quad_precision=None,
                               recon_precision=None, fused=None):
            precision = precision if precision is not None else core._PREC
            if quad_precision is None:
                quad_precision = precision
            kst = jax.vmap(
                lambda Xin_blk: K.x_kernel(
                    Xin_blk, Xstar, params.x_log_lengthscales,
                    params.x_log_sigma_n, params.x_log_lin_coeff,
                    with_noise=False, precision=precision,
                )
            )(post.Xin_c)
            kst = kst * post.mask_c[:, :, None]  # (C, n_max, P)
            C = kst.shape[0]
            d = post.Axc.shape[2]
            means, KiKs = [], []
            for c in range(C):  # static unroll: one plain matmul per class
                if fuse_per_class:
                    lhs = jnp.concatenate([post.Axc[c].T, post.Kxc_inv[c]], axis=0)
                    out = jnp.matmul(lhs, kst[c], precision=precision)
                    means.append(out[:d].T)
                    KiKs.append(out[d:])
                else:
                    means.append(jnp.matmul(kst[c].T, post.Axc[c],
                                            precision=precision))
                    KiKs.append(jnp.matmul(post.Kxc_inv[c], kst[c],
                                           precision=quad_precision))
            mean = jnp.stack(means)  # (C, P, d)
            KiK = jnp.stack(KiKs)  # (C, n_max, P)
            diag_star = K.x_diag_kernel(
                Xstar, params.x_log_lin_coeff, params.x_log_sigma_n,
                cfg.sigma_n_num_X, with_noise,
            )
            diag_common = jnp.maximum(
                diag_star[None, :] - jnp.sum(kst * KiK, axis=1), 1e-9
            )
            var = diag_common[:, :, None] * jnp.exp(
                params.x_log_lambdas
            )[None, None, :] ** -2
            return mean, var

        return predict_x_unrolled

    # ---- measurement --------------------------------------------------------
    m = GPMDM.load(REPO / "bench_assets" / args.model)
    C = m.config.n_classes
    pfc = PFConfig(num_particles=args.particles)
    cfg = m.config
    T_mat = np.full((C, C), 0.1 / max(C - 1, 1))
    np.fill_diagonal(T_mat, 0.9)
    log_T = jnp.log(jnp.asarray(T_mat, dtype=m.dtype))
    _, _, test_seqs, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=1, seq_len=60, D=cfg.D, seed=0
    )
    Z = jnp.asarray(
        np.concatenate([np.asarray(s) for s in test_seqs] * 20, axis=0)[: args.frames],
        dtype=m.dtype,
    )
    _, _, q_seqs, q_labels = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=6, seq_len=60, D=cfg.D, seed=0
    )
    np.asarray(jnp.zeros((1,)) + 0)  # warm transport (CLAUDE.md)

    def measure(tag):
        pf._instance_jits.cache_clear()
        pf._banked_scan_jit.cache_clear()
        if args.banks:
            B = args.banks
            sB = pf.pf_init_bank(m.posterior, m.layout.y_class_offsets,
                                 jax.random.PRNGKey(1), pfc, B)
            ZB = jnp.broadcast_to(Z[None], (B,) + Z.shape)
            # pf_scan_bank so 'auto' exercises the shipped banked gate
            # (_bank_pf_cfg); forced modes override via the fused kwarg
            scan = jax.jit(
                lambda s, Z: pf.pf_scan_bank(s, Z, m.posterior, m.params,
                                             log_T, cfg, pfc)
            )
            sI, ZI, denom = sB, ZB, B * args.frames
        else:
            sI = pf.pf_init(m.posterior, m.layout.y_class_offsets,
                            jax.random.PRNGKey(0), pfc)
            scan = jax.jit(
                lambda s, Z: pf.pf_scan(s, Z, m.posterior, m.params, log_T,
                                        cfg, pfc)
            )
            ZI, denom = Z, args.frames
        t0 = time.perf_counter()
        _, outs = scan(sI, ZI)
        jax.block_until_ready(outs.class_probs)
        compile_s = time.perf_counter() - t0
        wall = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _, outs = scan(sI, ZI)
            jax.block_until_ready(outs.class_probs)
            wall = min(wall, time.perf_counter() - t0)
        fps = denom / wall
        acc = float("nan")
        if not args.skip_guard and C == 2:
            rep = evaluate_pf_banked(
                m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(s) for s in q_seqs],
                q_labels, burn_in=5, seed=0, config=pfc,
            )
            acc = rep.frame_metrics["accuracy"]
        print(f"{tag:>10}: {fps:8.1f} fps  ({1000/fps:.4f} ms/frame)  "
              f"acc {acc:.4f}  [compile {compile_s:.1f}s]", flush=True)
        return fps, acc

    mode = f"banks={args.banks}" if args.banks else "single"
    print(f"{args.model} P={args.particles} frames={args.frames} {mode} "
          f"device={jax.devices()[0]}")
    orig = (core.predict_y, core.predict_x_all_classes)
    patches = {
        "auto": orig,  # the shipped gate: fuse iff n_classes <= 2
        "fused": (force(orig[0], True), force(orig[1], True)),
        "unfused": (force(orig[0], False), force(orig[1], False)),
        "y-only": (force(orig[0], True), force(orig[1], False)),
        "x-only": (force(orig[0], False), force(orig[1], True)),
        # statically-unrolled per-class x-GP (see make_unrolled_x):
        "xu-fused": (force(orig[0], True), make_unrolled_x(True)),
        "xu-plain": (force(orig[0], False), make_unrolled_x(False)),
    }
    try:
        for tag in args.modes.split(","):
            core.predict_y, core.predict_x_all_classes = patches[tag]
            measure(tag)
    finally:
        core.predict_y, core.predict_x_all_classes = orig
    pf._instance_jits.cache_clear()
    pf._banked_scan_jit.cache_clear()


if __name__ == "__main__":
    main()
