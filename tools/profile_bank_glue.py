"""Attribute the banked-vmap glue tax by stage (VERDICT r2 #4).

Round-2 measured 12x10k vmapped banks at ~0.47 ms/bank-frame vs 0.34
single-filter, and ruled OUT resampling (+0.047) and the posterior
matmuls (vmapped predict_y == single).  This tool locates the residual
~0.09 ms: cumulative PF-step variants (trans / dyn / weight / readout /
full), each timed BOTH as a single filter and as a B-bank vmapped scan at
the same P.  The per-stage vmap tax is the difference of consecutive-row
deltas between the two columns.

Usage: python tools/profile_bank_glue.py [--banks 12] [--particles 10000]
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
    ap.add_argument("--banks", type=int, default=12)
    ap.add_argument("--particles", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=64)
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
    P, B, T = args.particles, args.banks, args.frames

    _, _, test_seqs, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=1, seq_len=60, D=35, seed=0
    )
    Z1 = jnp.asarray(
        np.concatenate([np.asarray(s) for s in test_seqs] * 10, axis=0)[:T],
        dtype=m.dtype,
    )
    ZB = jnp.broadcast_to(Z1[None], (B, T, 35))

    s1 = pf.pf_init(post, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc)
    sB = pf.pf_init_bank(post, m.layout.y_class_offsets, jax.random.PRNGKey(1), pfc, B)

    def make_step(level: str):
        def step(state, z):
            key, k_trans, k_dyn, k_res = jax.random.split(state.key, 4)
            # stage 1: transition (inverse-CDF, as pf_step)
            C = log_T.shape[0]
            cum_T = jnp.cumsum(jnp.exp(log_T), axis=1)
            onehot_c = jax.nn.one_hot(state.c, C, dtype=cum_T.dtype)
            row_cum = jnp.matmul(onehot_c, cum_T,
                                 precision=jax.lax.Precision.HIGHEST)
            u = jax.random.uniform(k_trans, (P,), dtype=cum_T.dtype)
            c = jnp.minimum(
                jnp.sum(u[:, None] >= row_cum, axis=1).astype(jnp.int32), C - 1
            )
            out = jnp.sum(c.astype(state.x.dtype))
            x_new, log_lik, log_w = state.x, state.log_lik, state.log_w
            if level in ("dyn", "weight", "readout", "full"):
                means, variances = core.predict_x_all_classes(
                    post, params, state.x, cfg, precision=pfc.lax_precision
                )
                mean = pf._select_by_class(means, c)
                var = jnp.maximum(pf._select_by_class(variances, c), 1e-12)
                eps = jax.random.normal(k_dyn, mean.shape, dtype=mean.dtype)
                x_new = mean + jnp.sqrt(var) * eps
                out = out + jnp.sum(x_new)
            if level in ("weight", "readout", "full"):
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
                out = out + jnp.sum(log_w)
            if level in ("readout", "full"):
                w = jnp.exp(log_w)
                lw = log_lik + log_w
                lw_max = jnp.max(lw)
                lw = jnp.where(jnp.isfinite(lw_max), lw - lw_max,
                               jnp.zeros_like(lw))
                onehot = jax.nn.one_hot(c, C, dtype=w.dtype)
                cs = jnp.matmul(jnp.exp(lw)[None, :], onehot,
                                precision=jax.lax.Precision.HIGHEST)[0]
                cp = cs / jnp.sum(cs)
                x_safe = jnp.where(jnp.isfinite(x_new), x_new, 0.0)
                sm = jnp.sum(x_safe * w[:, None], axis=0)
                out = out + jnp.sum(cp) + jnp.sum(sm)
            if level == "full":
                d = x_new.shape[1]
                packed = jnp.concatenate(
                    [x_new, state.x, c.astype(x_new.dtype)[:, None]], axis=1
                )
                idx = pf.systematic_resample_indices(k_res, log_w)
                packed = packed[idx]
                x_new = packed[:, :d]
                c = packed[:, 2 * d].astype(jnp.int32)
                log_w = jnp.full((P,), -jnp.log(float(P)), dtype=log_w.dtype)
            return pf.PFState(x=x_new, x_prev=state.x, c=c, log_w=log_w,
                              log_lik=log_lik, key=key), out

        return step

    def timed(fn, s, Z):
        f = jax.jit(fn)
        _, o = f(s, Z)
        jax.block_until_ready(o)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _, o = f(s, Z)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"B={B} P={P} T={T} device={jax.devices()[0]}")
    print(f"{'level':>8} {'single ms/f':>12} {'bank ms/bank-f':>15} {'vmap tax':>9}")
    prev1 = prevB = 0.0
    for level in ("trans", "dyn", "weight", "readout", "full"):
        step = make_step(level)
        ms1 = 1000 * timed(lambda s, Z: jax.lax.scan(step, s, Z), s1, Z1) / T
        msB = 1000 * timed(
            lambda s, Z: jax.vmap(lambda a, b: jax.lax.scan(step, a, b))(s, Z),
            sB, ZB,
        ) / (B * T)
        d1, dB = ms1 - prev1, msB - prevB
        print(f"{level:>8} {ms1:8.4f}(+{d1:6.4f}) {msB:8.4f}(+{dB:6.4f}) "
              f"{dB - d1:+8.4f}")
        prev1, prevB = ms1, msB




def micro_resample(args=None):
    """Isolate the banked resample halves: indices-only vs gather-only vs
    both, at the same (B, P).  Invoked via --micro."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--banks", type=int, default=12)
    ap.add_argument("--particles", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(args)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import time

    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.filter import particle_filter as pf

    m = GPMDM.load(REPO / "bench_assets" / "bench_model.npz")
    pfc = PFConfig(num_particles=args.particles)
    P, B, T = args.particles, args.banks, args.frames
    sB = pf.pf_init_bank(m.posterior, m.layout.y_class_offsets,
                         jax.random.PRNGKey(1), pfc, B)
    d = m.d

    def make(level):
        # every step's weights/states depend on the carry, so XLA cannot
        # hoist the resample out of the scan (the first draft measured
        # all-zeros: constant log_w made the whole loop body invariant)
        def step(state, _):
            key, k_w, k_res = jax.random.split(state.key, 3)
            log_w = state.log_w + 0.05 * jax.random.normal(
                k_w, state.log_w.shape, dtype=state.log_w.dtype
            )
            log_w = log_w - jax.scipy.special.logsumexp(log_w)
            x_new = state.x
            if level in ("idx", "both"):
                idx = pf.systematic_resample_indices(k_res, log_w)
            else:
                idx = jnp.arange(P, dtype=jnp.int32)
            if level in ("gather", "both"):
                packed = jnp.concatenate(
                    [state.x, state.x_prev,
                     state.c.astype(state.x.dtype)[:, None]], axis=1
                )
                packed = packed[idx]
                x_new = packed[:, :d] * 1.000001
            out = jnp.sum(x_new) + idx[0]
            return pf.PFState(x=x_new, x_prev=state.x, c=state.c,
                              log_w=log_w, log_lik=state.log_lik,
                              key=key), out

        return step

    import numpy as np

    def timed(fn, s):
        f = jax.jit(fn)
        _, o = f(s, None)
        jax.block_until_ready(o)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _, o = f(s, None)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"micro-resample B={B} P={P} T={T}")
    for level in ("none", "idx", "gather", "both"):
        step = make(level)
        msB = 1000 * timed(
            lambda s, _: jax.vmap(
                lambda a: jax.lax.scan(step, a, None, length=T)
            )(s), sB,
        ) / (B * T)
        s1 = jax.tree.map(lambda a: a[0], sB)
        ms1 = 1000 * timed(
            lambda s, _: jax.lax.scan(step, s, None, length=T), s1
        ) / T
        print(f"{level:>8}: single {ms1:7.4f}  bank {msB:7.4f} ms/bank-frame")


if __name__ == "__main__":
    import sys as _sys

    if "--micro" in _sys.argv:
        _sys.argv.remove("--micro")
        micro_resample()
    else:
        main()
