#!/usr/bin/env python
"""Per-stage TPU timing of the particle-filter step.

Times cumulative variants of the PF step (each as its own 200-frame
lax.scan) on the real chip to attribute per-frame cost to stages:

  trans        — Markov class transition only
  dyn          — + dynamics propagation (per-class GP posterior + sample)
  weight       — + observation weighting (obs GP posterior + log-lik)
  readout      — + readouts (class probs / state mean)
  full         — + resampling (indices + packed gather) == pf_step

plus isolated micro-variants (resample indices alone, gather alone, RNG
alone).  Differences between consecutive rows ~= stage cost.  Run on the
bench asset so posterior values are realistic (untrained models measure
~25x slower, see CLAUDE.md).

Usage: python tools/profile_pf.py [--particles 10000] [--frames 200]
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
    ap.add_argument("--particles", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf
    from gpmdm_tpu.models import core

    m = GPMDM.load(REPO / "bench_assets" / "bench_model.npz")
    pfc = PFConfig(num_particles=args.particles)
    cfg = m.config
    post, params = m.posterior, m.params
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))

    _, _, test_seqs, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=1, seq_len=60, D=35, seed=0
    )
    Z = np.concatenate([np.asarray(s) for s in test_seqs] * 10, axis=0)[: args.frames]
    Z = jnp.asarray(Z, dtype=m.dtype)

    state0 = pf.pf_init(post, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc)
    P = pfc.num_particles
    use_pallas = pf._use_pallas(post, pfc)
    print(f"P={P} N={post.X.shape[0]} D={cfg.D} d={cfg.d} pallas={use_pallas} "
          f"device={jax.devices()[0]}")

    # ---- stage building blocks (mirrors pf_step's structure) -------------
    def stage_trans(state, z, key_parts):
        key, k_trans, k_dyn, k_res = key_parts
        logits = log_T[state.c]
        c = jax.random.categorical(k_trans, logits).astype(jnp.int32)
        return c

    def stage_dyn(state, c, k_dyn):
        from gpmdm_tpu.ops import kernels as _K
        from gpmdm_tpu.ops.pallas.gp_posterior import fused_x_posterior

        xin = state.x
        if use_pallas:
            inv_ls = jnp.exp(-params.x_log_lengthscales)
            lin_w = jnp.exp(params.x_log_lin_coeff)
            diag_star = _K.x_diag_kernel(
                xin, params.x_log_lin_coeff, params.x_log_sigma_n,
                cfg.sigma_n_num_X, False,
            )
            m_list, v_list = [], []
            for ci in range(post.Xin_c.shape[0]):
                mean_ci, quad_ci = fused_x_posterior(
                    post.Xin_c[ci], xin, post.Axc[ci], post.Kxc_inv[ci],
                    inv_ls, lin_w, n_valid=post.Xin_c.shape[1],
                )
                m_list.append(mean_ci)
                v_list.append(
                    (diag_star - quad_ci)[:, None]
                    * jnp.exp(params.x_log_lambdas)[None, :] ** -2
                )
            means, variances = jnp.stack(m_list), jnp.stack(v_list)
        else:
            means, variances = core.predict_x_all_classes(
                post, params, xin, cfg, precision=pfc.lax_precision
            )
        mean = pf._select_by_class(means, c)
        var = jnp.maximum(pf._select_by_class(variances, c), 1e-12)
        eps = jax.random.normal(k_dyn, mean.shape, dtype=mean.dtype)
        return mean + jnp.sqrt(var) * eps

    def stage_weight(x_new, z):
        from gpmdm_tpu.ops import kernels as _K
        from gpmdm_tpu.ops.pallas.gp_posterior import fused_rbf_posterior

        if use_pallas:
            mean_y, quad = fused_rbf_posterior(
                post.X, x_new, post.Ay, post.Ky_inv,
                jnp.exp(-params.y_log_lengthscales),
            )
            diag = _K.y_diag_kernel(
                x_new, params.y_log_sigma_n, cfg.sigma_n_num_Y, False
            )
            var_y = ((diag - quad)[:, None]
                     * jnp.exp(params.y_log_lambdas)[None, :] ** -2
                     ).astype(mean_y.dtype)
        else:
            mean_y, var_y = core.predict_y(
                post, params, x_new, cfg, precision=pfc.lax_precision
            )
        var_y = jnp.maximum(var_y, 1e-12)
        log_lik = pf.observation_log_lik(z, mean_y, var_y, cfg.D, False)
        log_lik = jnp.where(jnp.isfinite(log_lik), log_lik, -jnp.inf)
        lse = jax.scipy.special.logsumexp(log_lik)
        log_w = jnp.where(
            jnp.isfinite(lse), log_lik - lse,
            jnp.full_like(log_lik, -jnp.log(float(P))),
        )
        return log_lik, log_w

    def stage_readout(x_new, c, log_lik, log_w):
        w = jnp.exp(log_w)
        lw = log_lik + log_w
        lw_max = jnp.max(lw)
        lw = jnp.where(jnp.isfinite(lw_max), lw - lw_max, jnp.zeros_like(lw))
        onehot = jax.nn.one_hot(c, log_T.shape[0], dtype=w.dtype)
        class_scores = jnp.matmul(
            jnp.exp(lw)[None, :], onehot, precision=jax.lax.Precision.HIGHEST
        )[0]
        class_probs = class_scores / jnp.sum(class_scores)
        x_safe = jnp.where(jnp.isfinite(x_new), x_new, 0.0)
        state_mean = jnp.sum(x_safe * w[:, None], axis=0)
        return class_probs, state_mean

    def _idx_sort(k, log_w):
        return pf.systematic_resample_indices(k, log_w)

    def _idx_compare_all(k, log_w):
        w = jax.nn.softmax(log_w)
        cum = jnp.cumsum(w)
        u = jax.random.uniform(k, (), dtype=w.dtype)
        pos = (u + jnp.arange(P, dtype=w.dtype)) / P
        return jnp.clip(
            jnp.searchsorted(cum, pos, method="compare_all"), 0, P - 1
        ).astype(jnp.int32)

    def _idx_scatter_cummax(k, log_w):
        w = jax.nn.softmax(log_w)
        cum = jnp.cumsum(w)
        u = jax.random.uniform(k, (), dtype=w.dtype)
        start = jnp.ceil(
            P * jnp.concatenate([jnp.zeros(1, w.dtype), cum[:-1]]) - u
        )
        start = jnp.clip(start, 0, P - 1).astype(jnp.int32)
        iota = jnp.arange(P, dtype=jnp.int32)
        z = jnp.zeros((P,), jnp.int32).at[start].max(iota, mode="drop")
        return jax.lax.associative_scan(jnp.maximum, z)

    def _idx_iota(k, log_w):
        return jnp.arange(P, dtype=jnp.int32)

    IDX_FNS = {
        "sort": _idx_sort,
        "compare_all": _idx_compare_all,
        "scatter_cummax": _idx_scatter_cummax,
        "iota(gather only)": _idx_iota,
    }

    def stage_resample(x_new, x_old, c, log_w, k_res, indexer=_idx_sort):
        d = x_new.shape[1]
        packed = jnp.concatenate(
            [x_new, x_old, c.astype(x_new.dtype)[:, None]], axis=1
        )
        idx = indexer(k_res, log_w)
        packed_r = packed[idx]
        return (packed_r[:, :d], packed_r[:, d:2 * d],
                packed_r[:, 2 * d].astype(jnp.int32))

    # ---- cumulative variants ---------------------------------------------
    def make_step(level: str, indexer=_idx_sort):
        def step(state, z):
            key, k_trans, k_dyn, k_res = jax.random.split(state.key, 4)
            c = stage_trans(state, z, (key, k_trans, k_dyn, k_res))
            out = jnp.sum(c.astype(state.x.dtype))
            x_new, log_lik, log_w = state.x, state.log_lik, state.log_w
            if level in ("dyn", "weight", "readout", "full"):
                x_new = stage_dyn(state, c, k_dyn)
                out = out + jnp.sum(x_new)
            if level in ("weight", "readout", "full"):
                log_lik, log_w = stage_weight(x_new, z)
                out = out + jnp.sum(log_w)
            if level in ("readout", "full"):
                cp, sm = stage_readout(x_new, c, log_lik, log_w)
                out = out + jnp.sum(cp) + jnp.sum(sm)
            if level == "full":
                x_new, x_prev, c = stage_resample(
                    x_new, state.x, c, log_w, k_res, indexer
                )
                log_w = jnp.full((P,), -jnp.log(float(P)), dtype=log_w.dtype)
            new_state = pf.PFState(
                x=x_new, x_prev=state.x, c=c, log_w=log_w,
                log_lik=log_lik, key=key,
            )
            return new_state, out

        return step

    def timed_scan(step):
        f = jax.jit(lambda s, Z: jax.lax.scan(step, s, Z))
        s, o = f(state0, Z)
        jax.block_until_ready(o)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s, o = f(state0, Z)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return 1000.0 * best / args.frames

    rows = []
    prev = 0.0
    for level in ("trans", "dyn", "weight", "readout", "full"):
        ms = timed_scan(make_step(level))
        rows.append((level, ms, ms - prev))
        prev = ms
        print(f"{level:>8}: {ms:7.4f} ms/frame  (+{rows[-1][2]:.4f})")

    base_readout = rows[-2][1]
    for name, fn in IDX_FNS.items():
        if name == "sort":
            continue  # already measured as 'full'
        ms = timed_scan(make_step("full", indexer=fn))
        print(f"full/{name:>18}: {ms:7.4f} ms/frame  "
              f"(resample +{ms - base_readout:.4f})")

    # ---- isolated micro-variants -----------------------------------------
    def micro(name, step):
        ms = timed_scan(step)
        print(f"{name:>20}: {ms:7.4f} ms/frame")

    def step_rng_only(state, z):
        key, k1, k2, k3 = jax.random.split(state.key, 4)
        a = jax.random.categorical(k1, log_T[state.c])
        b = jax.random.normal(k2, state.x.shape, dtype=state.x.dtype)
        u = jax.random.uniform(k3, (), dtype=state.x.dtype)
        new_state = pf.PFState(
            x=state.x, x_prev=state.x_prev, c=state.c,
            log_w=state.log_w, log_lik=state.log_lik, key=key,
        )
        return new_state, jnp.sum(b) + a.astype(b.dtype).sum() + u

    def step_resample_only(state, z):
        key, k_res = jax.random.split(state.key)
        x_new, x_prev, c = stage_resample(
            state.x, state.x_prev, state.c, state.log_w, k_res
        )
        new_state = pf.PFState(
            x=x_new, x_prev=x_prev, c=c, log_w=state.log_w,
            log_lik=state.log_lik, key=key,
        )
        return new_state, jnp.sum(x_new)

    def step_indices_only(state, z):
        key, k_res = jax.random.split(state.key)
        idx = pf.systematic_resample_indices(k_res, state.log_w)
        new_state = pf.PFState(
            x=state.x, x_prev=state.x_prev, c=state.c, log_w=state.log_w,
            log_lik=state.log_lik, key=key,
        )
        return new_state, jnp.sum(idx)

    micro("rng only", step_rng_only)
    micro("resample idx+gather", step_resample_only)
    micro("resample idx only", step_indices_only)


if __name__ == "__main__":
    main()
