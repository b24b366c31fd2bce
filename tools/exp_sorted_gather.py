"""Does telling XLA the resample gather's indices are sorted help on TPU?

Systematic resampling produces MONOTONE indices (idx_i counts CDF steps),
so the packed-state gather qualifies for ``indices_are_sorted=True``
(``x.at[idx].get(...)``).  The banked profile attributes 0.10 ms/bank-frame
to the resample stage under vmap (tools/profile_bank_glue.py) — this
experiment times the in-scan gather both ways, single and 12-bank vmapped.

NOTE the transport trap this tool works around: ``block_until_ready`` is a
NO-OP on the axon tunnel until the process's first device->host fetch
initializes the transfer path — time nothing before one warm fetch
(bench.py warms it in a daemon thread; here we pay it synchronously).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.filter import particle_filter as pf
    from gpmdm_tpu.utils.profiling import warm_transport

    t0 = time.time()
    warm_transport()  # init the fetch path; 2-450 s
    print(f"transport init: {time.time() - t0:.1f}s; device {jax.devices()[0]}",
          flush=True)

    m = GPMDM.load(REPO / "bench_assets" / "bench_model.npz")
    P, B, T = 10_000, 12, 64
    pfc = PFConfig(num_particles=P)
    sB = pf.pf_init_bank(m.posterior, m.layout.y_class_offsets,
                         jax.random.PRNGKey(1), pfc, B)
    d = m.d

    def make(sorted_flag):
        def step(state, _):
            key, k_w, k_res = jax.random.split(state.key, 3)
            log_w = state.log_w + 0.05 * jax.random.normal(
                k_w, state.log_w.shape, dtype=state.log_w.dtype
            )
            log_w = log_w - jax.scipy.special.logsumexp(log_w)
            idx = pf.systematic_resample_indices(k_res, log_w)
            packed = jnp.concatenate(
                [state.x, state.x_prev,
                 state.c.astype(state.x.dtype)[:, None]], axis=1
            )
            if sorted_flag is None:  # no-gather baseline
                packed_r = packed * 1.000001
                live = jnp.sum(idx)
            elif sorted_flag:
                packed_r = packed.at[idx].get(
                    indices_are_sorted=True, unique_indices=False
                )
                live = 0
            else:
                packed_r = packed[idx]
                live = 0
            x_new = packed_r[:, :d] * 1.000001
            return pf.PFState(
                x=x_new, x_prev=state.x, c=state.c, log_w=log_w,
                log_lik=state.log_lik, key=key,
            ), jnp.sum(x_new) + live

        return step

    def timed(fn, s, reps=5):
        f = jax.jit(fn)
        _, o = f(s)
        jax.block_until_ready(o)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _, o = f(s)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return best

    s1 = jax.tree.map(lambda a: a[0], sB)
    for name, flag in (("no-gather", None), ("plain[idx]", False),
                       ("sorted.at[idx]", True)):
        step = make(flag)
        ms1 = 1000 * timed(lambda s: jax.lax.scan(step, s, None, length=T), s1) / T
        msB = 1000 * timed(
            lambda s: jax.vmap(lambda a: jax.lax.scan(step, a, None, length=T))(s),
            sB,
        ) / (B * T)
        print(f"{name:>15}: single {ms1:7.4f}  bank {msB:7.4f} ms/(bank-)frame",
              flush=True)





def flat_vs_batched() -> None:
    """Is ONE flat (B*P)-row gather faster than the vmapped batched gather?
    If yes, a bank-native resample (per-bank indices + bank offsets into a
    flattened particle axis) is the lever for the 0.063 ms/bank-frame
    banked gather tax; if no, the tax is the hardware cost of moving
    120k x 5 f32 rows."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp

    from gpmdm_tpu.utils.profiling import warm_transport

    t0 = time.time()
    warm_transport()
    print(f"transport init: {time.time() - t0:.1f}s", flush=True)

    P, B, T, W = 10_000, 12, 64, 5
    key = jax.random.PRNGKey(0)
    packed0 = jax.random.normal(key, (B, P, W), dtype=jnp.float32)
    # realistic systematic-style monotone indices, different per bank/frame
    def step_batched(carry, _):
        packed, k = carry
        k, k2 = jax.random.split(k)
        u = jax.random.uniform(k2, (B, P))
        idx = jnp.clip(
            (jnp.cumsum(u, axis=1) / jnp.sum(u, axis=1, keepdims=True) * P)
            .astype(jnp.int32), 0, P - 1,
        )
        packed = jax.vmap(lambda p, i: p[i])(packed, idx) * 1.000001
        return (packed, k), jnp.sum(packed[:, 0, 0])

    def step_flat(carry, _):
        packed, k = carry  # (B, P, W)
        k, k2 = jax.random.split(k)
        u = jax.random.uniform(k2, (B, P))
        idx = jnp.clip(
            (jnp.cumsum(u, axis=1) / jnp.sum(u, axis=1, keepdims=True) * P)
            .astype(jnp.int32), 0, P - 1,
        )
        flat_idx = (idx + (jnp.arange(B) * P)[:, None]).reshape(B * P)
        flat = packed.reshape(B * P, W)[flat_idx].reshape(B, P, W) * 1.000001
        return (flat, k), jnp.sum(flat[:, 0, 0])

    def timed(step):
        f = jax.jit(
            lambda c: jax.lax.scan(step, c, None, length=T)
        )
        c, o = f((packed0, key))
        jax.block_until_ready(o)
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            _, o = f((packed0, key))
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        return 1000 * best / (B * T)

    print(f"batched vmap gather: {timed(step_batched):.4f} ms/bank-frame")
    print(f"   flat B*P gather: {timed(step_flat):.4f} ms/bank-frame")


if __name__ == "__main__":
    import sys as _sys

    if "--flat" in _sys.argv:
        flat_vs_batched()
    else:
        main()
