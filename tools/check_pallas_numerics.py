#!/usr/bin/env python
"""Arbitrate the fused Pallas posteriors against XLA and f64 truth on the
TRAINED bench asset, on the real device.

Motivation: forcing pallas='on' at the bench shape (N=480) measured
chance-level PF accuracy (tools/exp_quad_precision.py) while the XLA path
holds 0.92 — either a kernel bug at these shapes/values or variance
cancellation at the trained model's near-singular posteriors.  This tool
separates the hypotheses:

1. numerics: per-stage max errors of fused vs unfused vs f64 truth for the
   observation map (mean, quad, var_common) and per-class dynamics map,
   on realistic particle positions (trained latents + jitter);
2. attribution: PF accuracy with ONLY the obs kernel fused, ONLY the
   dynamics kernel fused, and both.

Usage: python tools/check_pallas_numerics.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def stats(name, got, ref):
    got, ref = np.asarray(got, np.float64), np.asarray(ref, np.float64)
    ae = np.abs(got - ref)
    denom = np.maximum(np.abs(ref), 1e-12)
    print(f"  {name:>28}: max_abs={ae.max():.3e}  max_rel={(ae/denom).max():.3e}")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.models import core
    from gpmdm_tpu.ops import kernels as K
    import gpmdm_tpu.filter.particle_filter as pfmod
    from gpmdm_tpu.ops.pallas.gp_posterior import (
        fused_obs_loglik,
        fused_rbf_posterior,
        fused_x_posterior,
    )

    m = GPMDM.load(REPO / "bench_assets" / "bench_model.npz")
    post, params, cfg = m.posterior, m.params, m.config
    print(f"device={jax.devices()[0]} Ntrain={m.layout.Ny} d={m.d} D={m.D}")

    rng = np.random.default_rng(0)
    X = np.asarray(post.X, np.float64)
    P = 4096
    Xs = X[rng.integers(0, X.shape[0], P)] + 0.05 * rng.normal(size=(P, m.d))
    Xs32 = jnp.asarray(Xs, jnp.float32)

    # ---------------- observation map ----------------
    # f64 truth from the f32-cast posterior arrays (isolates kernel error)
    Ay = np.asarray(post.Ay, np.float64)
    Kinv = np.asarray(post.Ky_inv, np.float64)
    ls = np.exp(np.asarray(params.y_log_lengthscales, np.float64))
    diff = (X[:, None, :] - Xs[None, :, :]) / ls
    Kstar = np.exp(-np.sum(diff**2, axis=2))
    mean64 = Kstar.T @ Ay
    quad64 = np.sum(Kstar * (Kinv @ Kstar), axis=0)
    varc64 = 1.0 - quad64
    print(
        f"obs var_common (f64): min={varc64.min():.3e} "
        f"median={np.median(varc64):.3e} max={varc64.max():.3e}"
    )

    mean_hi, var_hi = jax.jit(
        lambda: core.predict_y(post, params, Xs32, cfg,
                               precision=jax.lax.Precision.HIGH)
    )()
    lam2inv = np.exp(np.asarray(params.y_log_lambdas, np.float64)) ** -2
    varc_hi = np.asarray(var_hi, np.float64)[:, 0] / lam2inv[0]
    print("XLA high vs f64:")
    stats("mean", mean_hi, mean64)
    stats("var_common", varc_hi, varc64)

    mean_f, quad_f = jax.jit(
        lambda: fused_rbf_posterior(
            post.X, Xs32, post.Ay, post.Ky_inv,
            jnp.exp(-params.y_log_lengthscales),
        )
    )()
    print("pallas fused_rbf vs f64:")
    stats("mean", mean_f, mean64)
    stats("var_common", 1.0 - np.asarray(quad_f, np.float64), varc64)

    z = jnp.asarray(np.asarray(m.get_Y(), np.float32)[100])
    lam2 = jnp.exp(2.0 * params.y_log_lambdas)
    quad_o, qres_o = jax.jit(
        lambda: fused_obs_loglik(
            post.X, Xs32, post.Ay, post.Ky_inv,
            jnp.exp(-params.y_log_lengthscales), z, lam2,
        )
    )()
    qres64 = np.sum(
        np.exp(2.0 * np.asarray(params.y_log_lambdas, np.float64))
        * (mean64 - np.asarray(z, np.float64)) ** 2, axis=1,
    )
    print("pallas fused_obs_loglik vs f64:")
    stats("quad", quad_o, quad64)
    stats("qres", qres_o, qres64)

    # log-lik comparison (the actual weight input)
    varc_f = np.maximum(1.0 - np.asarray(quad_o, np.float64), 1e-12)
    varc_x = np.maximum(varc_hi, 1e-12)
    D = m.D
    sumloglam = 2.0 * np.sum(np.asarray(params.y_log_lambdas, np.float64))
    ll_f = -0.5 * qres64 / varc_f - 0.5 * (D * np.log(varc_f) - sumloglam)
    ll_x = -0.5 * qres64 / varc_x - 0.5 * (D * np.log(varc_x) - sumloglam)
    print(
        f"  log-lik spread from var path alone: max|ll_f - ll_x|="
        f"{np.abs(ll_f - ll_x).max():.2f} nats"
    )

    # ---------------- dynamics map (class 0) ----------------
    Xin0 = np.asarray(post.Xin_c[0], np.float64)
    A0 = np.asarray(post.Axc[0], np.float64)
    Ki0 = np.asarray(post.Kxc_inv[0], np.float64)
    xls = np.exp(np.asarray(params.x_log_lengthscales, np.float64))
    lw = np.exp(np.asarray(params.x_log_lin_coeff, np.float64))
    diff = (Xin0[:, None, :] - Xs[None, :, :]) / xls
    Ks = np.exp(-np.sum(diff**2, axis=2)) + (
        (Xin0 * lw[:-1] ** 2) @ Xs.T + lw[-1] ** 2
    )
    mean64x = Ks.T @ A0
    quad64x = np.sum(Ks * (Ki0 @ Ks), axis=0)
    diag64x = 1.0 + np.sum(Xs * Xs * lw[:-1] ** 2, axis=1) + lw[-1] ** 2
    varc64x = diag64x - quad64x
    print(
        f"dyn var_common (f64): min={varc64x.min():.3e} "
        f"median={np.median(varc64x):.3e}"
    )

    means_hi, vars_hi = jax.jit(
        lambda: core.predict_x_all_classes(
            post, params, Xs32, cfg, precision=jax.lax.Precision.HIGH
        )
    )()
    lam2invx = np.exp(np.asarray(params.x_log_lambdas, np.float64)) ** -2
    varcx_hi = np.asarray(vars_hi[0], np.float64)[:, 0] / lam2invx[0]
    print("XLA high vs f64 (class 0):")
    stats("mean", means_hi[0], mean64x)
    stats("var_common", varcx_hi, varc64x)

    mean_fx, quad_fx = jax.jit(
        lambda: fused_x_posterior(
            post.Xin_c[0], Xs32, post.Axc[0], post.Kxc_inv[0],
            jnp.exp(-params.x_log_lengthscales),
            jnp.exp(params.x_log_lin_coeff),
            n_valid=post.Xin_c.shape[1],
        )
    )()
    print("pallas fused_x vs f64 (class 0):")
    stats("mean", mean_fx, mean64x)
    stats("var_common", np.asarray(diag64x) - np.asarray(quad_fx, np.float64),
          varc64x)

    # ---------------- attribution: PF accuracy per fused stage ----------
    import jax as _jax

    _, _, q_seqs, q_labels = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=6, seq_len=60, D=m.D, seed=0
    )
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))
    pfc = PFConfig(num_particles=10_000)

    def accuracy():
        scan = _jax.jit(
            lambda s, Z: pfmod.pf_scan(s, Z, post, params, log_T, cfg, pfc)
        )
        correct = total = 0
        for Zq, label in zip(q_seqs, q_labels):
            s = pfmod.pf_init(
                post, m.layout.y_class_offsets, _jax.random.PRNGKey(0), pfc
            )
            _, outs = scan(s, jnp.asarray(np.asarray(Zq), m.dtype))
            pred = np.asarray(outs.most_likely_class)
            correct += (pred[5:] == label).sum()
            total += len(pred) - 5
        return correct / total

    orig_gate = pfmod._use_pallas
    for name, dyn_on, obs_on in [
        ("xla both", False, False),
        ("fused dyn only", True, False),
        ("fused obs only", False, True),
        ("fused both", True, True),
    ]:
        pfmod._use_pallas = (
            lambda p, c, stage="dyn", d=dyn_on, o=obs_on:
            d if stage == "dyn" else o
        )
        print(f"PF accuracy [{name:>15}]: {accuracy():.4f}")
    pfmod._use_pallas = orig_gate


if __name__ == "__main__":
    main()
