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
    # frozen-noise retrains of the HEADLINE-scale assets (the sigma_n
    # drift behind BENCHMARKS finding 4 also caps these: hourlong jumped
    # 0.933 -> 0.9994, c8n5120 0.829 -> 0.9456 when frozen); cut-select
    # with tools/eval_asset_guard.py and deploy as bench_model{,_d4,_c8}
    # if the guard beats the committed asset under the same protocol
    "headlinef": ("exact", 4, 60, 400,
                  {"model": {"flg_train_y_sigma_n": False,
                             "flg_train_x_sigma_n": False}}),
    "d4f": ("exact", 4, 60, 400,
            {"d": 4,
             "model": {"flg_train_y_sigma_n": False,
                       "flg_train_x_sigma_n": False}}),
    "c8f": ("exact", 2, 60, 400,
            {"C": 8, "D": 10, "d": 3,
             "model": {"flg_train_y_sigma_n": False,
                       "flg_train_x_sigma_n": False},
             "data": {"center_spread": 3.0, "class_signature": 1.0,
                      "seed": 21}}),
    "n2048": ("exact", 16, 64, 200, {}),
    "n5120": ("exact", 32, 80, 150, {}),
    "sparse10240": ("sparse", 64, 80, 300, {"m_y": 128, "m_x": 128}),
    # BASELINE config 3 at its literal scale: 8 classes x N~5k (the
    # signature task, tools/bench_multiclass_pf.py DATA_KW shape)
    # flg_train_x_lin_coeff=False: at this density the MAP optimum drives
    # the dynamics linear coefficients to 3-18 (healthy models: 0.4-2.5),
    # exploding particles off-manifold so the filter scores near chance
    # (measured: the fully-converged f64 model classifies at 0.19).
    # Round 4: the f32 TPU NaN cliff is FIXED (deflated x-NLL,
    # core.x_block_terms_deflated) — this trains on the chip in f32
    # end-to-end; --f64-cpu is no longer needed (docs/BENCHMARKS.md).
    "c8n5120": ("exact", 8, 80, 120,
                {"C": 8, "D": 10, "d": 3,
                 "model": {"flg_train_x_lin_coeff": False},
                 "data": {"center_spread": 3.0, "class_signature": 1.0,
                          "seed": 21}}),
    # c8n5120 variant: noise scales ALSO frozen — the s30..s120 guard
    # sweep showed monotone y_sigma_n shrink (0.074 -> 0.042) +
    # lambda/lengthscale growth sharpening the likelihood until the
    # filter starves (guard acc 0.71/0.83/0.29/0.44, best s60)
    "c8n5120f": ("exact", 8, 80, 120,
                 {"C": 8, "D": 10, "d": 3,
                  "model": {"flg_train_x_lin_coeff": False,
                            "flg_train_y_sigma_n": False,
                            "flg_train_x_sigma_n": False},
                  "data": {"center_spread": 3.0, "class_signature": 1.0,
                           "seed": 21}}),
    # c8n5120 with NOTHING frozen: pair with --hyperprior W — the round-4
    # recipe where the log-space prior (not flag freezes) bounds the MAP
    # drift; all kernel hyperparameters stay trainable
    "c8n5120h": ("exact", 8, 80, 120,
                 {"C": 8, "D": 10, "d": 3,
                  "data": {"center_spread": 3.0, "class_signature": 1.0,
                           "seed": 21}}),
    # BASELINE config 4 at its literal scale: "hour-long sequences" —
    # 2 classes x 2 sequences x 27,000 frames = 108k training frames
    # (an hour at 30 fps), trainable only by the sparse family
    "hourlong": ("sparse", 2, 27_000, 200, {"m_y": 128, "m_x": 128}),
    # hourlong variant with frozen noise scales: round-3's trained-noise
    # run NaN-froze at ~step 180 and deployed best at s140 (0.933).
    # Round 4: the freeze itself is FIXED (QR capacitance,
    # sparse._lb_via_qr) — hourlong trains 200/200 f32 on-chip; the
    # REMAINING reason for this variant is the sigma_n quality drift
    # (guard 0.68 -> 0.46 over the cuts), addressed without freezes by
    # --hyperprior on the 'h' configs below
    "hourlongf": ("sparse", 2, 27_000, 200,
                  {"m_y": 128, "m_x": 128,
                   "model": {"flg_train_y_sigma_n": False,
                             "flg_train_x_sigma_n": False}}),
    # hourlong, nothing frozen: pair with --hyperprior W (see c8n5120h)
    "hourlongh": ("sparse", 2, 27_000, 200, {"m_y": 128, "m_x": 128}),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, choices=sorted(CONFIGS))
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--f64-cpu", action="store_true",
                    help="train in float64 on CPU (stable Cholesky for "
                         "configs whose f32 TPU training NaNs), then save "
                         "a float32-config checkpoint for TPU deployment")
    ap.add_argument("--jitter", type=float, default=0.0,
                    help="sigma_n_num_{Y,X} numerical-noise floor: bounds "
                         "the trained Gram's condition so f32 TPU training "
                         "survives hyperparameter drift (the NaN-freeze "
                         "cliff is a failed f32 Cholesky)")
    ap.add_argument("--hyperprior", type=float, default=0.0, metavar="W",
                    help="log-space Gaussian hyperprior weight (see "
                         "GPMDMConfig.hyperprior_weight): bounds the MAP "
                         "hyperparameter drift behind the guard-score "
                         "non-monotonicity (docs/BENCHMARKS.md round 4)")
    ap.add_argument("--hyperprior-sigma", type=float, default=None,
                    metavar="WS",
                    help="per-group override: hyperprior weight on the two "
                         "sigma_n groups (the filter-starving drift needs "
                         "~100x the uniform weight — round-4 sweep)")
    ap.add_argument("--hyperprior-lin", type=float, default=None,
                    metavar="WL",
                    help="per-group override: hyperprior weight on "
                         "x_lin_coeff")
    ap.add_argument("--optimizer", default="adam", choices=["adam", "lbfgs"],
                    help="lbfgs = linesearch second-order steps (use ~5-10x "
                         "fewer --steps); cuts save as "
                         "bench_model_<config>_lbfgs_sN.npz so the guard "
                         "can compare optimizers on the same config")
    ap.add_argument("--out-suffix", default="",
                    help="append to the output stem (bench_model_<config>"
                         "<suffix>...): lets experiment arms (e.g. the "
                         "optimizer A/B) train a committed config without "
                         "overwriting the deployed, receipt-bound asset")
    ap.add_argument("--save-at", default=None,
                    help="comma list of step counts; saves "
                         "bench_model_<config>_s<N>.npz at each cut "
                         "(optimizer state resumes across segments) so the "
                         "deployment point can be chosen by measured PF "
                         "accuracy instead of the NaN-freeze point")
    args = ap.parse_args()
    if args.f64_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    family, n_seqs, seq_len, steps, extra = CONFIGS[args.config]
    if args.steps is not None:
        steps = args.steps

    from gpmdm_tpu.data import synthetic

    D = extra.get("D", 35)
    d = extra.get("d", 2)
    C = extra.get("C", 2)
    tr, lb, _, _ = synthetic.make_dataset(
        n_classes=C, n_train_seqs=n_seqs, n_test_seqs=1, seq_len=seq_len,
        D=D, **extra.get("data", {"seed": 0}),
    )
    Ny = sum(len(Y) for Y in tr)
    print(f"[{args.config}] family={family} Ny={Ny} steps={steps}", flush=True)

    t0 = time.time()
    train_dtype = "float64" if args.f64_cpu else "float32"

    def build(dtype):
        jit_kw = (
            {"sigma_n_num_Y": args.jitter, "sigma_n_num_X": args.jitter}
            if args.jitter > 0.0
            else {}
        )
        jit_kw.update(extra.get("model", {}))
        if args.hyperprior > 0.0:
            jit_kw["hyperprior_weight"] = args.hyperprior
        if args.hyperprior_sigma is not None or args.hyperprior_lin is not None:
            w = args.hyperprior
            ws = args.hyperprior_sigma if args.hyperprior_sigma is not None else w
            wl = args.hyperprior_lin if args.hyperprior_lin is not None else w
            jit_kw["hyperprior_weights"] = (w, w, ws, w, w, ws, wl)
        if family == "exact":
            from gpmdm_tpu import GPMDM

            mm = GPMDM(
                D=D, d=d, n_classes=C, dtype=dtype,
                y_sigma_n_init=0.1, x_sigma_n_init=0.1, **jit_kw,
            )
        else:
            from gpmdm_tpu import SparseGPMDM

            mm = SparseGPMDM(
                D=D, d=d, n_classes=C, dtype=dtype,
                y_sigma_n_init=0.1, x_sigma_n_init=0.1,
                n_inducing_y=extra["m_y"], n_inducing_x=extra["m_x"], **jit_kw,
            )
        for Y, c in zip(tr, lb):
            mm.add_data(Y, c)
        return mm

    m = build(train_dtype)
    m.init_X()

    def save_model(path):
        """Save ``m`` at ``path`` — through an f32-config rebuild when
        training ran in f64 (the npz load casts params to the saved config
        dtype, so the f64-trained parameters deploy at f32 with the
        host-f64 posterior precompute)."""
        if not args.f64_cpu:
            m.save(path)
            return
        import dataclasses as _dc

        import jax.numpy as jnp

        m32 = build("float32")
        m32.layout = m32._build_layout()
        m32.params = type(m.params)(
            **{
                f.name: jnp.asarray(
                    np.asarray(getattr(m.params, f.name), dtype=np.float64),
                    dtype=jnp.float32,
                )
                for f in _dc.fields(m.params)
            }
        )
        m32._precompute_kernel_inverses()
        m32.save(path)

    suffix = args.out_suffix + (
        "" if args.optimizer == "adam" else f"_{args.optimizer}"
    )
    if args.save_at:
        cuts = sorted(int(s) for s in args.save_at.split(","))
        losses, done = [], 0
        for cut in cuts:
            seg = m.train_adam(
                num_opt_steps=cut - done,
                num_print_steps=max((cut - done) // 2, 1), lr=args.lr,
                optimizer=args.optimizer,
            )
            losses.extend(np.asarray(seg).tolist())
            done = cut
            save_model(os.path.join(
                REPO, "bench_assets",
                f"bench_model_{args.config}{suffix}_s{cut}.npz"
            ))
            print(f"[{args.config}] saved s{cut} (loss {losses[-1]:.4e})",
                  flush=True)
            if not np.isfinite(losses[-1]):
                break  # frozen: later cuts would save identical params
        steps = done
    else:
        losses = m.train_adam(
            num_opt_steps=steps, num_print_steps=max(steps // 5, 1),
            lr=args.lr, optimizer=args.optimizer,
        )
    out = os.path.join(REPO, "bench_assets",
                       f"bench_model_{args.config}{suffix}.npz")
    if not np.isfinite(losses[-1]):
        # NaN-freeze: the frozen params are the measured-degenerate
        # checkpoint class (docstring) — never let them overwrite the
        # deployed asset; pick a _sN cut with tools/eval_asset_guard.py
        print(
            f"[{args.config}] training NaN-froze; NOT overwriting {out} — "
            "guard-select a saved cut instead",
            flush=True,
        )
        return
    save_model(out)
    print(
        f"[{args.config}] trained in {time.time() - t0:.0f}s "
        f"(loss {losses[0]:.3e} -> {losses[-1]:.3e}), saved {out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
