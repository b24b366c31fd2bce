"""Diagnose the f32 TPU training NaN cliff (round-4 VERDICT #1).

The large bench configs (hourlong, c8n5120) NaN-freeze when trained in f32
(docs/BENCHMARKS.md "Four training findings" #1).  The trainer's freeze
semantics disambiguate the mechanism:

- frozen params FINITE  -> the forward loss Cholesky itself failed at those
  params (loss NaN at current params keeps them);
- frozen params NaN     -> a step earlier had finite loss but non-finite
  GRADS (the loss-only guard let the NaN update through).

This tool trains the config with per-step instrumentation (loss, per-leaf
grad finiteness, hyperparameter magnitudes), stops at the first NaN, and
then runs a host-side f64 autopsy of every Gram matrix at the frozen
params: min eigenvalue, condition number, and the minimal relative jitter
at which a NUMPY f32 Cholesky succeeds.

Usage: python tools/diag_train_nan.py --config c8n5120 [--steps 80] [--chunk 5]
       [--cpu] [--hyperprior W]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402


def host_autopsy(m, label):
    """f64 host analysis of every loss Gram at the model's current params."""
    import scipy.linalg as sla

    from gpmdm_tpu.ops import kernels_host as KH

    p = KH.fetch_tree(m.params)
    X = KH.f64(p.X)
    cfg, layout = m.config, m.layout
    y_ls = np.exp(KH.f64(p.y_log_lengthscales))
    y_sn2 = float(np.exp(2.0 * KH.f64(p.y_log_sigma_n))) + cfg.sigma_n_num_Y**2
    x_ls = np.exp(KH.f64(p.x_log_lengthscales))
    x_sn2 = float(np.exp(2.0 * KH.f64(p.x_log_sigma_n))) + cfg.sigma_n_num_X**2
    x_w2 = np.exp(2.0 * KH.f64(p.x_log_lin_coeff))

    mats = {}
    if len(X) <= 8192:  # autopsy matrices must fit a quick eigvalsh
        mats["K_y"] = KH.rbf(X, X, y_ls) + y_sn2 * np.eye(len(X))
    else:
        print(json.dumps({"label": label, "matrix": "K_y",
                          "n": int(len(X)), "skipped": "too big"}))
    # per-class dynamics blocks, rebuilt on host from the fetched X
    from gpmdm_tpu.ops.layout import xin_xout

    Xin, _ = xin_xout(np.asarray(p.X), layout, cfg.dyn_target)
    Xin = KH.f64(np.asarray(Xin))
    for c in range(layout.n_classes):
        lo, hi = int(layout.x_class_offsets[c]), int(layout.x_class_offsets[c + 1])
        if hi - lo > 8192:
            continue
        B = Xin[lo:hi]
        mats[f"K_x[c{c}]"] = (
            KH.x_kernel(B, B, x_ls, x_w2) + x_sn2 * np.eye(hi - lo)
        )

    out = []
    for name, K in mats.items():
        dmean = float(np.mean(np.diag(K)))
        try:
            ev = sla.eigvalsh(K)
            emin, emax = float(ev[0]), float(ev[-1])
        except Exception:
            emin = emax = float("nan")
        rec = {
            "label": label, "matrix": name, "n": int(K.shape[0]),
            "diag_mean": round(dmean, 4), "eig_min": emin, "eig_max": emax,
            "cond": (emax / emin) if emin > 0 else float("inf"),
        }
        # minimal relative jitter for a numpy f32 Cholesky to succeed
        ok_at = None
        for rj in [0.0, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2]:
            K32 = (K + rj * dmean * np.eye(len(K))).astype(np.float32)
            try:
                np.linalg.cholesky(K32)
                ok_at = rj
                break
            except np.linalg.LinAlgError:
                continue
        rec["f32_chol_ok_at_rel_jitter"] = ok_at
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="c8n5120")
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hyperprior", type=float, default=0.0)
    ap.add_argument("--save-params", default=None,
                    help="npz path: save the frozen params for offline "
                         "probing (tools/exp_tpu_chol.py)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import optax

    from train_bench_assets import CONFIGS

    from gpmdm_tpu import GPMDM, SparseGPMDM
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.models import core
    from gpmdm_tpu.train import trainer

    family, n_seqs, seq_len, _, extra = CONFIGS[args.config]
    D = extra.get("D", 35)
    d = extra.get("d", 2)
    C = extra.get("C", 2)
    tr, lb, _, _ = synthetic.make_dataset(
        n_classes=C, n_train_seqs=n_seqs, n_test_seqs=1, seq_len=seq_len,
        D=D, **extra.get("data", {"seed": 0}),
    )
    kw = dict(extra.get("model", {}))
    if args.hyperprior:
        kw["hyperprior_weight"] = args.hyperprior
    if family == "exact":
        m = GPMDM(D=D, d=d, n_classes=C, dtype="float32",
                  y_sigma_n_init=0.1, x_sigma_n_init=0.1, **kw)
    else:
        m = SparseGPMDM(D=D, d=d, n_classes=C, dtype="float32",
                        y_sigma_n_init=0.1, x_sigma_n_init=0.1,
                        n_inducing_y=extra["m_y"], n_inducing_x=extra["m_x"],
                        **kw)
    for Y, c in zip(tr, lb):
        m.add_data(Y, c)
    m.init_X()
    print(f"[{args.config}] Ny={m.layout.Ny} device="
          f"{jax.devices()[0].platform}", flush=True)

    cfg, layout = m.config, m.layout
    kind = "exact" if family == "exact" else "sparse"
    mask, loss_fn = trainer._mask_and_loss(cfg, "all", kind)
    optimizer = optax.adam(args.lr)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.dtype(cfg.dtype))

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, Y, cfg, layout, 1.0)
        gfin = jnp.stack(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
        )
        gmax = jnp.stack([jnp.max(jnp.abs(g)) for g in jax.tree.leaves(grads)])
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(loss)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, params)
        new_opt = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_opt, opt_state)
        rec = dict(
            loss=loss, gfin=gfin, gmax=gmax,
            y_sn=jnp.exp(params.y_log_sigma_n),
            x_sn=jnp.exp(params.x_log_sigma_n),
            y_ls_max=jnp.max(jnp.exp(params.y_log_lengthscales)),
            x_ls_max=jnp.max(jnp.exp(params.x_log_lengthscales)),
            lin_max=jnp.max(jnp.exp(params.x_log_lin_coeff)),
            y_lam_max=jnp.max(jnp.exp(params.y_log_lambdas)),
            X_max=jnp.max(jnp.abs(params.X)),
        )
        return (new_params, new_opt), rec

    @jax.jit
    def run_chunk(params, opt_state, n=args.chunk):
        return jax.lax.scan(step, (params, opt_state), None, length=n)

    # register_dataclass preserves field order, so tree.leaves aligns 1:1
    # with dataclass fields
    leaf_names = [f.name for f in dataclasses.fields(m.params)]

    params, opt_state = m.params, optimizer.init(m.params)
    last_good = params
    done = 0
    froze = False
    while done < args.steps:
        prev = params
        (params, opt_state), recs = run_chunk(params, opt_state)
        recs = jax.tree.map(np.asarray, recs)
        for i in range(args.chunk):
            rec = {k: (v[i].tolist() if v[i].ndim else float(v[i]))
                   for k, v in recs.items()}
            step_no = done + i
            bad_leaves = [leaf_names[j] for j, f in enumerate(rec["gfin"])
                          if not f]
            print(json.dumps({
                "step": step_no, "loss": rec["loss"],
                "grad_nan_leaves": bad_leaves,
                "gmax": {leaf_names[j]: float(f"{g:.3e}")
                         for j, g in enumerate(rec["gmax"])},
                "hypers": {k: round(rec[k], 4) for k in
                           ("y_sn", "x_sn", "y_ls_max", "x_ls_max",
                            "lin_max", "y_lam_max", "X_max")},
            }), flush=True)
            if not np.isfinite(rec["loss"]) or bad_leaves:
                froze = True
        done += args.chunk
        if froze:
            break
        last_good = prev

    # autopsy at the final (frozen or last) params
    m.params = params
    finite = bool(np.all([np.all(np.isfinite(np.asarray(l)))
                          for l in jax.tree.leaves(params)]))
    print(json.dumps({"frozen_params_finite": finite}), flush=True)
    if args.save_params:
        from gpmdm_tpu.ops import kernels_host as KH

        host = KH.fetch_tree(params)
        np.savez(
            args.save_params,
            **{f.name: np.asarray(getattr(host, f.name))
               for f in dataclasses.fields(host)},
        )
        print(f"saved frozen params -> {args.save_params}", flush=True)
    host_autopsy(m, "at_freeze")


if __name__ == "__main__":
    main()
