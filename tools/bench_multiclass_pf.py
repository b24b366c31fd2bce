"""Real-chip PF throughput at the 8-class (EP-scale) config.

Two stages (separate processes — the jax platform can only be set once):

  python tools/bench_multiclass_pf.py --stage train   # CPU: train + save
  python tools/bench_multiclass_pf.py --stage bench   # TPU: PF scan + acc

Stage ``train`` fits an 8-class GPMDM (f32) on the per-class-signature
synthetic task (the tests/test_multiclass.py design: separable in posture
AND dynamics) and saves /tmp's asset.  Stage ``bench`` streams a
10k-particle filter and prints fps + frame accuracy.  Run ``all`` to do
both via subprocesses.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CKPT = "/tmp/gpmdm_c8_bench.npz"
C, D, d, SEQ, NSEQ = 8, 10, 3, 60, 2
DATA_KW = dict(n_classes=C, n_train_seqs=NSEQ, n_test_seqs=2, seq_len=SEQ,
               D=D, seed=21, center_spread=3.0, class_signature=1.0)


def stage_train() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.data import synthetic

    tr, tl, _, _ = synthetic.make_dataset(**DATA_KW)
    m = GPMDM(D=D, d=d, n_classes=C, dtype="float32",
              y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    losses = m.train_adam(num_opt_steps=200, num_print_steps=50, lr=0.01)
    m.save(CKPT)
    print(f"trained C={C} Ny={m.layout.Ny}; final loss {losses[-1]:.4e}; "
          f"saved {CKPT}")


def stage_bench() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM, GPMDM_PF, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf

    m = GPMDM.load(CKPT)
    _, _, te, tel = synthetic.make_dataset(**DATA_KW)
    P, frames = 10_000, 1000
    Z = jnp.asarray(
        np.concatenate([np.asarray(s) for s in te] * 10, axis=0)[:frames],
        dtype=m.dtype,
    )
    pfc = PFConfig(num_particles=P)
    T = np.full((C, C), 0.1 / (C - 1), dtype=np.float64)
    np.fill_diagonal(T, 0.9)
    log_T = jnp.log(jnp.asarray(T, dtype=m.dtype))
    scan = jax.jit(
        lambda s, Z, post, params: pf.pf_scan(
            s, Z, post, params, log_T, m.config, pfc
        )
    )
    state = pf.pf_init(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
    )
    _, outs = scan(state, Z, m.posterior, m.params)
    jax.block_until_ready(outs.class_probs)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, outs = scan(state, Z, m.posterior, m.params)
        jax.block_until_ready(outs.class_probs)
        best = min(best, time.perf_counter() - t0)
    fps = frames / best

    flt = GPMDM_PF(m, T, num_particles=P, config=pfc, seed=0)
    correct = total = 0
    for Zq, label in zip(te, tel):
        flt.reset()
        pred = np.asarray(flt.run(np.asarray(Zq)).most_likely_class)
        correct += (pred[5:] == label).sum()
        total += len(pred) - 5
    print(f"C={C} P={P} Ny={m.layout.Ny}: {fps:.1f} fps "
          f"({best/frames*1e3:.3f} ms/frame), frame_acc {correct/total:.4f} "
          f"on {jax.devices()[0]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["train", "bench", "all"],
                    default="all")
    args = ap.parse_args()
    if args.stage == "train":
        stage_train()
    elif args.stage == "bench":
        stage_bench()
    else:
        for st in ("train", "bench"):
            subprocess.run(
                [sys.executable, __file__, "--stage", st], check=True
            )


if __name__ == "__main__":
    main()
