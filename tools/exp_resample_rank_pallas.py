"""Fused Pallas rank kernel for systematic resampling at extreme P.

The adopted MXU rank computation (filter/particle_filter.py
systematic_resample_indices) materializes two 0/1 comparison tensors in
HBM before the matmul:

    A (K x P)  A[m, j] = [s_j // k == m]      bf16
    B (P x k)  B[j, t] = [s_j %  k <= t]      bf16

At P=100k / k=128 that is ~180 MB of HBM write+read per frame — the
dominant cost of the resample stage (exp_resample_parts measured the
softmax+cumsum prefix at only 0.06 ms; BENCHMARKS.md "Particle-count
scaling" attributes ~0.9 ms to this materialization).  The FLOPs
(K*P*k ~ 10 GMAC bf16) are ~0.05 ms on the v5e MXU — the stage is pure
HBM traffic.

This kernel fuses the comparison-tensor generation into the matmul:
tiles of A and B are built in VMEM from q = s//k and r = s%k via
broadcasted_iota comparisons and fed straight to the MXU; HBM traffic
drops to reading q/r (~0.8 MB) and writing F (~0.5 MB).  The counts are
exact (0/1 products, f32 accumulation, counts <= P << 2^24), so the
Mosaic bf16 precision trap that killed the fused posterior kernels
(docs/BENCHMARKS.md) does not apply: indices are bit-identical to the
XLA path by construction.

Run: python tools/exp_resample_rank_pallas.py [--corr-only]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--corr-only", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpmdm_tpu.filter import particle_filter as pf

K_LANES = 128  # inner tile width (t axis) — one lane register
TM = 128  # F row tile (m axis)
TJ = 2048  # reduction tile over particles


def _rank_kernel(q_ref, r_ref, out_ref):
    ji = pl.program_id(1)

    @pl.when(ji == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    mi = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, TJ), 0) + mi * TM
    a = (rows == q_ref[0]).astype(jnp.bfloat16)  # (TM, TJ)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TJ, K_LANES), 1)
    b = (cols >= r_ref[:]).astype(jnp.bfloat16)  # (TJ, K_LANES)
    out_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.float32)


def rank_pallas(s: jax.Array, P: int, interpret: bool = False) -> jax.Array:
    """idx_i = #{j : s_j <= i} for i in [0, P) via the fused tile kernel."""
    k = K_LANES
    K = -(-P // k)
    K_pad = -(-K // TM) * TM
    P_pad = -(-P // TJ) * TJ
    # padding rows must match no iota row: q_pad = K_pad is outside the grid
    q = jnp.full((P_pad,), K_pad, jnp.int32).at[:P].set(s // k)
    r = jnp.zeros((P_pad,), jnp.int32).at[:P].set(s % k)
    # (NJ, 1, TJ) so the block's trailing dims EQUAL the array's trailing
    # dims — Mosaic requires trailing block dims divisible by (8, 128) or
    # equal to the array dims (a (1, TJ) block over (NJ, TJ) is rejected).
    q3d = q.reshape(P_pad // TJ, 1, TJ)
    rcol = r.reshape(P_pad, 1)
    F = pl.pallas_call(
        _rank_kernel,
        grid=(K_pad // TM, P_pad // TJ),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TJ), lambda mi, ji: (ji, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((TJ, 1), lambda mi, ji: (ji, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TM, k), lambda mi, ji: (mi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K_pad, k), jnp.float32),
        interpret=interpret,
    )(q3d, rcol)
    C = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(F[:, -1])[:-1]]
    )
    idx = (C[:, None] + F)[:K].reshape(K * k)[:P]
    return jnp.clip(idx, 0, P - 1).astype(jnp.int32)


def idx_pallas(key, log_w):
    P = log_w.shape[0]
    ct = jnp.promote_types(log_w.dtype, jnp.float32)
    w = jax.nn.softmax(log_w.astype(ct))
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=ct)
    s = jnp.clip(jnp.floor(P * cum - u).astype(jnp.int32) + 1, 0, P)
    interpret = jax.devices()[0].platform != "tpu"
    return rank_pallas(s, P, interpret=interpret)


def rank_xla(s: jax.Array, P: int) -> jax.Array:
    """The adopted XLA lowering (particle_filter.py:293-305), from s."""
    k = K_LANES
    K = -(-P // k)
    A = (s[None, :] // k == jnp.arange(K, dtype=jnp.int32)[:, None]).astype(
        jnp.bfloat16
    )
    B = ((s % k)[:, None] <= jnp.arange(k, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16
    )
    F = jax.lax.dot(A, B, preferred_element_type=jnp.float32)
    C = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(F[:, -1])[:-1]]
    )
    idx = (C[:, None] + F).reshape(K * k)[:P]
    return jnp.clip(idx, 0, P - 1).astype(jnp.int32)


def main() -> None:
    print(f"devices: {jax.devices()}")
    interpret = jax.devices()[0].platform != "tpu"

    # correctness: identical ranks from identical s (the softmax/cumsum
    # prefix is shared code in the real integration; comparing full
    # pipelines across separate jits hits measure-zero floor ties instead)
    for P in (1000, 4096, 10_000, 100_000):
        both = jax.jit(
            lambda s, P=P: (rank_xla(s, P), rank_pallas(s, P, interpret))
        )
        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            lw = 3.0 * jax.random.normal(
                jax.random.fold_in(key, 1), (P,), jnp.float32
            )
            w = jax.nn.softmax(lw)
            s = jnp.clip(
                jnp.floor(
                    P * jnp.cumsum(w) - jax.random.uniform(key, ())
                ).astype(jnp.int32)
                + 1,
                0,
                P,
            )
            ref, got = (np.asarray(x) for x in both(s))
            bad = np.flatnonzero(ref != got)
            assert bad.size == 0, (P, seed, bad[:10], ref[bad[:10]], got[bad[:10]])
        print(f"P={P}: pallas rank == xla rank (5 seeds)")
    if args.corr_only:
        return

    def timed(make_out, P, T=2000, reps=3):
        def body(carry, _):
            key, log_w = carry
            key, k = jax.random.split(key)
            out = make_out(k, log_w)
            log_w = log_w + 1e-6 * out[0].astype(log_w.dtype)
            return (key, log_w), out[0]

        @jax.jit
        def run(key, log_w):
            (_, lw), outs = jax.lax.scan(body, (key, log_w), None, length=T)
            return lw.sum() + outs.sum()

        key = jax.random.PRNGKey(0)
        log_w = jax.random.normal(jax.random.PRNGKey(1), (P,), jnp.float32)
        run(key, log_w).block_until_ready()
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            run(key, log_w).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / T)
        return best * 1e3

    for P in (10_000, 30_000, 100_000):
        r = {}
        r["xla (current)"] = timed(pf.systematic_resample_indices, P)
        r["pallas fused"] = timed(idx_pallas, P)
        print(
            f"P={P:>7}: "
            + " | ".join(f"{k} {v:.4f} ms" for k, v in r.items())
        )


if __name__ == "__main__":
    main()
