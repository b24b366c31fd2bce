#!/usr/bin/env python
"""Accuracy + throughput attribution for the fused Pallas stages at the
auto-gate's scale (Ntrain >= 1024), on a model trained on-device.

The N=480 bench-asset attribution (tools/check_pallas_numerics.py) runs
below the gate, so it cannot validate what the gate actually enables.
This trains an Ny=1080 model (2 classes x 9 seqs x 60 frames), then for
each stage combination (XLA both / fused dyn / fused obs / fused both)
measures held-out PF frame accuracy over 3 filter seeds and the streaming
throughput at P=10k.

Usage: python tools/check_pallas_scale.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SEQ, NSEQ, D = 60, 9, 35


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    import gpmdm_tpu.filter.particle_filter as pfmod

    tr, tl, q_seqs, q_labels = synthetic.make_dataset(
        n_classes=2, n_train_seqs=NSEQ, n_test_seqs=6, seq_len=SEQ, D=D, seed=0
    )
    m = GPMDM(D=D, d=2, n_classes=2, dtype="float32",
              y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    t0 = time.perf_counter()
    losses = m.train_adam(num_opt_steps=300, lr=0.01)
    print(f"device={jax.devices()[0]} Ny={m.layout.Ny} "
          f"train 300 steps in {time.perf_counter() - t0:.0f}s "
          f"loss {losses[0]:.3e} -> {losses[-1]:.3e}")

    post, params, cfg = m.posterior, m.params, m.config
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))
    pfc = PFConfig(num_particles=10_000)
    Zfps = jnp.asarray(
        np.concatenate([np.asarray(s) for s in q_seqs[:3]] * 7, axis=0)[:1000],
        m.dtype,
    )

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

        scan = jax.jit(
            lambda s, Z: pfmod.pf_scan(s, Z, post, params, log_T, cfg, pfc)
        )
        accs = []
        for seed in (0, 1, 2):
            correct = total = 0
            for Zq, label in zip(q_seqs, q_labels):
                s = pfmod.pf_init(
                    post, m.layout.y_class_offsets, jax.random.PRNGKey(seed),
                    pfc,
                )
                _, outs = scan(s, jnp.asarray(np.asarray(Zq), m.dtype))
                pred = np.asarray(outs.most_likely_class)
                correct += (pred[5:] == label).sum()
                total += len(pred) - 5
            accs.append(correct / total)

        s = pfmod.pf_init(
            post, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        _, outs = scan(s, Zfps)
        jax.block_until_ready(outs.class_probs)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _, outs = scan(s, Zfps)
            jax.block_until_ready(outs.class_probs)
            best = min(best, time.perf_counter() - t0)
        print(
            f"[{name:>15}] acc per seed: "
            + " ".join(f"{a:.4f}" for a in accs)
            + f"   fps={1000 / best:8.1f}  ({best:.4f} ms/frame)"
        )


if __name__ == "__main__":
    main()
