"""Headline benchmark: particle-filter streaming throughput on one chip.

North-star target (BASELINE.md): a 10,000-particle switching filter at
>= 1000 fps on a single TPU chip.  The reference runs 100 particles at
12.78 fps on a laptop CPU (test_gpmdm_pf.ipynb cell 5) — ``vs_baseline``
reports the speedup over that published number.

Config mirrors the published experiment's shape (D=35 observation dims,
2 classes; d=2 latent — the synthetic stand-in manifold is 2-D) with the
committed pre-trained asset (bench_assets/).  Compile time is excluded
(one warm-up scan).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_FPS = 12.78  # reference published throughput (100 particles, CPU)

N_PARTICLES = 10_000
# 1000 frames per timed scan: each dispatch over the TPU tunnel costs
# ~25 ms RTT, which at 200 frames inflated per-frame time by ~0.13 ms
# (~20%); 1000 frames amortizes it below 3%.
N_FRAMES = 1000
D, d, N_CLASSES = 35, 2, 2
TRAIN_SEQS_PER_CLASS, SEQ_LEN = 4, 60  # Ntrain = 480 frames


def main() -> None:
    import os
    import sys

    import jax

    # Fail fast when the TPU tunnel is down: backend init (jax.devices())
    # hangs indefinitely in that state (observed 2026-08-17/18), which
    # would otherwise burn the driver's whole bench timeout with no
    # diagnostic.  A healthy init returns in seconds; 900 s is generous.
    import threading

    _probe_result: list = []

    def _probe_backend() -> None:
        try:
            _probe_result.append(jax.devices()[0])
        except Exception as e:  # pragma: no cover - env-dependent
            _probe_result.append(e)

    _probe = threading.Thread(target=_probe_backend, daemon=True)
    _probe.start()
    _probe.join(timeout=900)
    if not _probe_result:
        print(
            "bench.py: jax backend init did not respond within 900 s "
            "(TPU tunnel down?) — aborting without a measurement.",
            file=sys.stderr,
        )
        sys.stderr.flush()
        os._exit(3)  # plain sys.exit would block on the hung init thread
    if isinstance(_probe_result[0], Exception):
        print(f"bench.py: jax backend init failed: {_probe_result[0]!r}",
              file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    # Persistent compile cache lives IN THE REPO (committed), not /tmp:
    # round-2 diagnosis (tools/diag_cache.py) showed the cache key is fully
    # deterministic across processes (computation + jaxlib + the axon
    # platform_version string + flags — no session id), but the driver's
    # bench runs in a fresh container where /tmp is empty, which is exactly
    # why BENCH_r02 paid 174 s of compile on a "warm" cache.  Shipping the
    # cache entries with the repo makes the driver's cold process hit them.
    _cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_assets", "jax_cache"
    )
    # CPU-forced runs (local smoke tests via jax_platforms='cpu') must not
    # pollute the committed TPU cache with host-platform entries.  Decide
    # from the RESOLVED backend (the probe above already initialized it),
    # NOT the jax_platforms string: this environment's sitecustomize sets
    # jax_platforms='axon,cpu', so a substring test diverted real TPU runs
    # to /tmp — which in the driver's empty-/tmp container is exactly the
    # full-recompile miss the committed cache exists to prevent (caught
    # when a TPU bench run wrote zero repo-cache entries).
    if _probe_result[0].platform == "cpu":
        _cache_dir = "/tmp/jax_bench_cache"
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        _probe = os.path.join(_cache_dir, ".w")
        open(_probe, "w").close()
        os.remove(_probe)
    except OSError:  # read-only checkout: fall back to a scratch cache
        _cache_dir = "/tmp/jax_bench_cache"
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Staleness tripwire: entries WRITTEN during this run are cache MISSES
    # (a PF-path change invalidated the committed cache and it was not
    # re-captured — the round-4 compile-wall failure mode).  Counted at
    # the end into the result JSON as compile_cache.new_entries; anything
    # nonzero on a driver run means "rerun bench locally and commit the
    # new bench_assets/jax_cache entries" (CLAUDE.md rule).
    _cache_entries_before = set(os.listdir(_cache_dir)) if os.path.isdir(_cache_dir) else set()
    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf
    from gpmdm_tpu.utils.profiling import StageTimer

    import os

    # Warm the device->host transfer path concurrently with setup: the
    # FIRST device round-trip of the process pays a transport/handshake
    # cost measured anywhere from 2 s to 450 s on this tunnel (CLAUDE.md);
    # doing it in a daemon thread overlaps that wait with model load, and
    # JOINING it before the compile stage keeps the environmental wall
    # out of compile_s (it lands in the transport_handshake section
    # instead — otherwise the headline scan's first dispatch absorbs it
    # and a warm cache reads as a 268 s compile wall).
    import threading

    def _warm_fetch():
        try:
            np.asarray(jnp.zeros((1,), dtype=jnp.float32) + 0)
        except Exception:
            pass

    _warm_thread = threading.Thread(target=_warm_fetch, daemon=True)
    _warm_thread.start()

    timer = StageTimer()
    t_setup = time.perf_counter()
    # Wall attribution per bench section (driver-visible): setup_s is the
    # whole run, section_s says where it went — the environmental
    # first-fetch lands in whichever section first touches device->host.
    section_s = {}
    _t_sec = [t_setup]

    def _mark(name: str) -> None:
        now = time.perf_counter()
        section_s[name] = round(now - _t_sec[0], 2)
        _t_sec[0] = now
    _, _, test_seqs, _ = synthetic.make_dataset(
        n_classes=N_CLASSES,
        n_train_seqs=TRAIN_SEQS_PER_CLASS,
        n_test_seqs=1,
        seq_len=SEQ_LEN,
        D=D,
        seed=0,
    )
    # Load the committed pre-trained checkpoint: PF numerics on an
    # UNTRAINED model are degenerate (mostly dead particles, inf-laden
    # weights), which makes the accuracy guard meaningless (the compute
    # itself times value-independently — tools/exp_value_dependent.py).
    # Training here would cost ~7-25 min of
    # tunnel compile per run (the remote session id defeats the persistent
    # compile cache), so the checkpoint is trained offline
    # (bench_assets/README) and committed.
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_assets", "bench_model.npz")
    if os.path.exists(ckpt):
        m = GPMDM.load(ckpt)
    else:  # fallback: train from scratch
        train_seqs, train_labels, _, _ = synthetic.make_dataset(
            n_classes=N_CLASSES, n_train_seqs=TRAIN_SEQS_PER_CLASS,
            n_test_seqs=1, seq_len=SEQ_LEN, D=D, seed=0,
        )
        m = GPMDM(
            D=D, d=d, n_classes=N_CLASSES, dtype="float32",
            y_sigma_n_init=0.1, x_sigma_n_init=0.1,
        )
        for Y, c in zip(train_seqs, train_labels):
            m.add_data(Y, c)
        m.init_X()
        m.train_adam(num_opt_steps=300, lr=0.01)

    pfc = PFConfig(num_particles=N_PARTICLES)
    cfg = m.config
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))

    Z = np.concatenate([np.asarray(s) for s in test_seqs] * 10, axis=0)[:N_FRAMES]
    Z = jnp.asarray(Z, dtype=m.dtype)

    _mark("load_model_data")
    # Block until the transport handshake is done so the compile stage
    # times COMPILATION (see the warm-fetch comment above).  Total wall
    # is unchanged — the handshake always outlasts model load here; this
    # only moves the wait into its own honestly-labeled section.
    _warm_thread.join()
    _mark("transport_handshake")
    scan = jax.jit(
        lambda s, Z, post, params: pf.pf_scan(s, Z, post, params, log_T, cfg, pfc)
    )
    state = pf.pf_init(m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc)

    # warm-up (compile).  The FIRST jitted dispatch of the process pays a
    # one-time device/client handshake that is ENVIRONMENTAL, not a cache
    # property: measured on a fully-warm committed cache (new_entries=0),
    # dispatch1 = 176.7 s while the second-shape cached compile = 1.23 s
    # and the first host fetch = 0.44 s (round 5, /tmp probe; same
    # 2 s-450 s window CLAUDE.md documents for the first fetch — whichever
    # device round-trip goes first absorbs it, and the setup-thread warm
    # fetch cannot shield us when the handshake outlasts model load).  So
    # attribute the two dispatches separately: cached_compile_s is the
    # cache-warmth signal (≈1 s when the committed cache hits);
    # first_program_s is tunnel weather.  compile_s stays the whole-stage
    # wall for continuity with BENCH_r01-r04.
    t_compile = time.perf_counter()
    with timer.stage("compile"):
        _, outs = scan(state, Z[:2], m.posterior, m.params)
        first_program_s = time.perf_counter() - t_compile
        jax.block_until_ready(outs.class_probs)
        compile_s = time.perf_counter() - t_compile
        # second shape compile for the full-length scan
        t2 = time.perf_counter()
        _, outs = scan(state, Z, m.posterior, m.params)
        cached_compile_s = time.perf_counter() - t2
        jax.block_until_ready(outs.class_probs)

    # timed runs: best-of-reps — the min is the true compute floor; the
    # mean folds in tunnel/host jitter (observed ~6% run-to-run)
    reps = 4
    wall = np.inf
    for r in range(reps):
        with timer.stage("headline_scan"):
            t0 = time.perf_counter()
            _, outs = scan(state, Z, m.posterior, m.params)
            jax.block_until_ready(outs.class_probs)
            wall = min(wall, time.perf_counter() - t0)
    fps = N_FRAMES / wall
    _mark("headline")

    # quality guard: stream held-out labeled trials with the same config —
    # catches perf "wins" that silently destroy classification (e.g. bf16
    # star kernels measured 2700 fps at chance-level accuracy).
    from gpmdm_tpu import GPMDM_PF

    _, _, q_seqs, q_labels = synthetic.make_dataset(
        n_classes=N_CLASSES, n_train_seqs=TRAIN_SEQS_PER_CLASS,
        n_test_seqs=6, seq_len=SEQ_LEN, D=D, seed=0,
    )
    from gpmdm_tpu.utils.metrics import evaluate_pf_banked

    # banked evaluation: all guard trials stream in ONE compiled dispatch
    # (one filter bank row per trial) — the same metrics the reference's
    # per-trial loop produces, minus B-1 dispatches of tunnel RTT
    with timer.stage("quality_guard"):
        rep = evaluate_pf_banked(
            m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(Z) for Z in q_seqs],
            q_labels, burn_in=5, seed=0, config=pfc,
        )
    frame_acc = rep.frame_metrics["accuracy"]
    # F1 with class 0 positive — the reference's headline quality metric
    # (test_gpmdm_pf.ipynb cell 5; BASELINE.md: >=0.90 per-frame F1)
    frame_f1 = rep.frame_metrics["f1"]
    _mark("quality_guard")

    # secondary metric: the SAME headline model deployed through the
    # low-rank compressed posterior (models/compressed.py): the quad
    # contraction drops O(N^2 P) -> O(N q P).  Reported next to the exact
    # headline with its own accuracy guard — adoption is arbitrated here.
    cp = m.compressed_posterior()
    state_cp = pf.pf_init(cp, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc)
    _, outs_cp = scan(state_cp, Z, cp, m.params)
    jax.block_until_ready(outs_cp.class_probs)
    w_cp = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs_cp = scan(state_cp, Z, cp, m.params)
        jax.block_until_ready(outs_cp.class_probs)
        w_cp = min(w_cp, time.perf_counter() - t0)
    comp_fps = N_FRAMES / w_cp
    rep_cp = evaluate_pf_banked(
        m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(Zq) for Zq in q_seqs],
        q_labels, burn_in=5, seed=0, config=pfc, posterior=cp,
    )
    comp_acc = rep_cp.frame_metrics["accuracy"]
    comp_f1 = rep_cp.frame_metrics["f1"]
    _mark("compressed")

    # secondary metric: the published problem shape (d=4, the reference's
    # train_gpmdm.ipynb cell 2 config) on a second committed asset.
    d4_fps = d4_acc = d4_f1 = None
    ckpt4 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_assets", "bench_model_d4.npz")
    if os.path.exists(ckpt4):
        m4 = GPMDM.load(ckpt4)
        scan4 = jax.jit(
            lambda s, Z, post, params: pf.pf_scan(
                s, Z, post, params, log_T, m4.config, pfc
            )
        )
        state4 = pf.pf_init(
            m4.posterior, m4.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        _, o4 = scan4(state4, Z, m4.posterior, m4.params)
        jax.block_until_ready(o4.class_probs)
        w4 = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _, o4 = scan4(state4, Z, m4.posterior, m4.params)
            jax.block_until_ready(o4.class_probs)
            w4 = min(w4, time.perf_counter() - t0)
        d4_fps = N_FRAMES / w4

        rep4 = evaluate_pf_banked(
            m4, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(Z) for Z in q_seqs],
            q_labels, burn_in=5, seed=0, config=pfc,
        )
        d4_acc = rep4.frame_metrics["accuracy"]
        d4_f1 = rep4.frame_metrics["f1"]

    _mark("d4")
    # secondary metric: the 8-class EP-scale config (4x the classes, 2x
    # the training frames of the headline; per-class-signature synthetic
    # task, tools/bench_multiclass_pf.py protocol) — driver-visible so a
    # regression in the multi-class path can't hide in the docs.
    # Deployed through the DEFAULT policy (resolve_posterior 'auto'):
    # this asset carries a guard-baked recommendation (sparsified M=128
    # kmeans, TPU guard 0.9864 vs exact 0.8966 — round-4 VERDICT #2), so
    # the default path now measures what a user gets with no flags.
    c8_fps = c8_acc = None
    ckpt8 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_assets", "bench_model_c8.npz")
    if os.path.exists(ckpt8):
        m8 = GPMDM.load(ckpt8)
        post8 = pf.resolve_posterior(m8, "auto")
        C8 = m8.n_classes
        kw8 = dict(n_classes=C8, n_train_seqs=2, n_test_seqs=2, seq_len=60,
                   D=m8.D, seed=21, center_spread=3.0, class_signature=1.0)
        _, _, te8, tel8 = synthetic.make_dataset(**kw8)
        T8 = np.full((C8, C8), 0.1 / (C8 - 1), dtype=np.float64)
        np.fill_diagonal(T8, 0.9)
        log_T8 = jnp.log(jnp.asarray(T8, dtype=m8.dtype))
        Z8 = jnp.asarray(
            np.concatenate([np.asarray(s) for s in te8] * 10, axis=0)[:N_FRAMES],
            dtype=m8.dtype,
        )
        scan8 = jax.jit(
            lambda s, Z, post, params: pf.pf_scan(
                s, Z, post, params, log_T8, m8.config, pfc
            )
        )
        state8 = pf.pf_init(
            post8, m8.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        _, o8 = scan8(state8, Z8, post8, m8.params)
        jax.block_until_ready(o8.class_probs)
        w8 = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _, o8 = scan8(state8, Z8, post8, m8.params)
            jax.block_until_ready(o8.class_probs)
            w8 = min(w8, time.perf_counter() - t0)
        c8_fps = N_FRAMES / w8
        rep8 = evaluate_pf_banked(
            m8, T8, [np.asarray(s) for s in te8], tel8, burn_in=5, seed=0,
            config=pfc, posterior=post8,
        )
        c8_acc = rep8.frame_metrics["accuracy"]

        # baked kmeans-M128 distillation (deploy --sparsify 128
        # --sparsify-method kmeans): measured better than exact on BOTH
        # axes at this shape (BENCHMARKS.md "Post-hoc SGPR distillation").
        sp8 = m8.sparsified_posterior(128, method="kmeans")
        # quad_precision='high': the SGPR hoisted-inverse variance path —
        # +30% on batched shapes with the guard IMPROVING here
        # (BENCHMARKS.md "SGPR variance path")
        pfc_q = PFConfig(num_particles=N_PARTICLES, quad_precision="high")
        scan8s = jax.jit(
            lambda s, Z, post, params: pf.pf_scan(
                s, Z, post, params, log_T8, m8.config, pfc_q
            )
        )
        state8s = pf.pf_init(
            sp8, m8.layout.y_class_offsets, jax.random.PRNGKey(0), pfc_q
        )
        _, o8s = scan8s(state8s, Z8, sp8, m8.params)
        jax.block_until_ready(o8s.class_probs)
        w8s = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _, o8s = scan8s(state8s, Z8, sp8, m8.params)
            jax.block_until_ready(o8s.class_probs)
            w8s = min(w8s, time.perf_counter() - t0)
        c8_sp_fps = N_FRAMES / w8s
        rep8s = evaluate_pf_banked(
            m8, T8, [np.asarray(s) for s in te8], tel8, burn_in=5, seed=0,
            config=pfc_q, posterior=sp8,
        )
        c8_sp_acc = rep8s.frame_metrics["accuracy"]
    else:
        c8_sp_fps = c8_sp_acc = None

    _mark("c8")
    # secondary metric: the BASELINE 8-class config at its LITERAL scale
    # (8 classes x 8 x 80-frame sequences = Ny 5120, the signature task)
    # through the DEPLOYMENT POLICY posterior (resolve_posterior 'auto':
    # compressed past Ny=1024, with a flat-spectrum advisory on this
    # asset's q/N~0.25 — docs/BENCHMARKS.md "BASELINE configs at literal
    # scale"; measured 132.9 fps / 0.995 acc vs exact 86.9 / 0.9456).
    # Timed at 200 frames; guard on 2 held-out trials per class (one
    # banked dispatch).
    c8n5120_fps = c8n5120_acc = None
    ckpt85 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_assets", "bench_model_c8n5120.npz")
    if os.path.exists(ckpt85):
        import warnings as _warnings

        m85 = GPMDM.load(ckpt85)
        C85 = m85.n_classes
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")  # expected flat-spectrum note
            post85 = pf.resolve_posterior(m85, "auto")
        _, _, te85, tel85 = synthetic.make_dataset(
            n_classes=C85, n_train_seqs=1, n_test_seqs=6, seq_len=80,
            D=m85.D, seed=21, center_spread=3.0, class_signature=1.0,
        )
        T85 = np.full((C85, C85), 0.1 / (C85 - 1), dtype=np.float64)
        np.fill_diagonal(T85, 0.9)
        log_T85 = jnp.log(jnp.asarray(T85, dtype=m85.dtype))
        T_frames85 = 200
        Z85 = jnp.asarray(
            np.concatenate([np.asarray(s) for s in te85] * 10, axis=0)[:T_frames85],
            dtype=m85.dtype,
        )
        scan85 = jax.jit(
            lambda s, Z, post, params: pf.pf_scan(
                s, Z, post, params, log_T85, m85.config, pfc
            )
        )
        state85 = pf.pf_init(
            post85, m85.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        _, o85 = scan85(state85, Z85, post85, m85.params)
        jax.block_until_ready(o85.class_probs)
        w85 = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            _, o85 = scan85(state85, Z85, post85, m85.params)
            jax.block_until_ready(o85.class_probs)
            w85 = min(w85, time.perf_counter() - t0)
        c8n5120_fps = T_frames85 / w85
        # guard subset: first 2 trials per class (16 banks, one dispatch)
        keep, seen = [], {}
        for i, lb in enumerate(tel85):
            if seen.get(lb, 0) < 2:
                keep.append(i)
                seen[lb] = seen.get(lb, 0) + 1
        rep85 = evaluate_pf_banked(
            m85, T85, [np.asarray(te85[i]) for i in keep],
            [tel85[i] for i in keep], burn_in=5, seed=0, config=pfc,
            posterior=post85,
        )
        c8n5120_acc = rep85.frame_metrics["accuracy"]

        # the same asset through the post-hoc SGPR distillation baked into
        # the checkpoint (deploy --sparsify 384 --sparsify-method kmeans;
        # models/sparse.distill_host) — the guard-arbitrated serving
        # deployment: measured faster AND more accurate than
        # auto-compressed at this shape, and k-means selection beats the
        # strided subset at every M here (BENCHMARKS.md "Post-hoc SGPR
        # distillation").
        sp85 = m85.sparsified_posterior(384, method="kmeans")
        # quad_precision='high': guard holds at 1.0 with +30% fps here
        pfc85q = PFConfig(num_particles=N_PARTICLES, quad_precision="high")
        scan85s = jax.jit(
            lambda s, Z, post, params: pf.pf_scan(
                s, Z, post, params, log_T85, m85.config, pfc85q
            )
        )
        state_sp = pf.pf_init(
            sp85, m85.layout.y_class_offsets, jax.random.PRNGKey(0), pfc85q
        )
        _, osp = scan85s(state_sp, Z85, sp85, m85.params)
        jax.block_until_ready(osp.class_probs)
        wsp = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _, osp = scan85s(state_sp, Z85, sp85, m85.params)
            jax.block_until_ready(osp.class_probs)
            wsp = min(wsp, time.perf_counter() - t0)
        c8n5120_sp_fps = T_frames85 / wsp
        rep_sp = evaluate_pf_banked(
            m85, T85, [np.asarray(te85[i]) for i in keep],
            [tel85[i] for i in keep], burn_in=5, seed=0, config=pfc85q,
            posterior=sp85,
        )
        c8n5120_sp_acc = rep_sp.frame_metrics["accuracy"]
    else:
        c8n5120_sp_fps = c8n5120_sp_acc = None

    _mark("c8n5120")
    # secondary metric: the BASELINE "hour-long sequences" config at its
    # literal scale — 2 classes x 2 x 27,000-frame training sequences
    # (108k frames, an hour at 30 fps), sparse family (M=128), streaming
    # through the same pf_scan.  Asset selection: tools/train_bench_assets
    # --save-at + tools/eval_asset_guard (measured-best checkpoint).
    hl_fps = hl_acc = hl_f1 = None
    ckpt_hl = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_assets", "bench_model_hourlong.npz")
    if os.path.exists(ckpt_hl):
        from gpmdm_tpu import SparseGPMDM

        mhl = SparseGPMDM.load(ckpt_hl)
        scan_hl = jax.jit(
            lambda s, Z, post, params: pf.pf_scan(
                s, Z, post, params, log_T, mhl.config, pfc
            )
        )
        state_hl = pf.pf_init(
            mhl.posterior, mhl.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
        )
        Zhl = jnp.asarray(np.asarray(Z), dtype=mhl.dtype)
        _, ohl = scan_hl(state_hl, Zhl, mhl.posterior, mhl.params)
        jax.block_until_ready(ohl.class_probs)
        whl = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _, ohl = scan_hl(state_hl, Zhl, mhl.posterior, mhl.params)
            jax.block_until_ready(ohl.class_probs)
            whl = min(whl, time.perf_counter() - t0)
        hl_fps = N_FRAMES / whl
        _, _, qhl, qhl_l = synthetic.make_dataset(
            n_classes=2, n_train_seqs=1, n_test_seqs=6, seq_len=600,
            D=mhl.D, seed=0,
        )
        rep_hl = evaluate_pf_banked(
            mhl, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(s) for s in qhl],
            qhl_l, burn_in=5, seed=0, config=pfc,
        )
        hl_acc = rep_hl.frame_metrics["accuracy"]
        hl_f1 = rep_hl.frame_metrics["f1"]

    _mark("hourlong")
    # secondary metric: BASELINE's multi-filter config — 64 independent
    # banks x 1k particles streaming concurrently (dp-shardable across a
    # slice; measured here on the single available chip).
    B, P_bank, T_bank = 64, 1000, 64
    pfc_bank = PFConfig(num_particles=P_bank)
    bank_scan = jax.jit(
        lambda s, Z, post, params: pf.pf_scan_bank(
            s, Z, post, params, log_T, cfg, pfc_bank
        )
    )
    states = pf.pf_init_bank(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(1), pfc_bank, B
    )
    Zb = jnp.broadcast_to(Z[:T_bank][None], (B, T_bank, D))
    _, bouts = bank_scan(states, Zb, m.posterior, m.params)
    jax.block_until_ready(bouts.class_probs)
    t0 = time.perf_counter()
    for _ in range(3):
        _, bouts = bank_scan(states, Zb, m.posterior, m.params)
        jax.block_until_ready(bouts.class_probs)
    bank_wall = (time.perf_counter() - t0) / 3
    bank_agg_fps = B * T_bank / bank_wall

    # the same bank fleet through the baked post-hoc SGPR distillation
    # (deploy --sparsify 128): measured faster AND more accurate than the
    # exact banks at P=1k (BENCHMARKS.md "Post-hoc SGPR distillation").
    sp_head = m.sparsified_posterior(128)
    # quad_precision='high': +30% banked with the guard IMPROVING
    # (0.9833 -> 0.9985; BENCHMARKS.md "SGPR variance path")
    pfc_bank_q = PFConfig(num_particles=P_bank, quad_precision="high")
    bank_scan_sp = jax.jit(
        lambda s, Z, post, params: pf.pf_scan_bank(
            s, Z, post, params, log_T, cfg, pfc_bank_q
        )
    )
    states_sp = pf.pf_init_bank(
        sp_head, m.layout.y_class_offsets, jax.random.PRNGKey(1), pfc_bank_q, B
    )
    _, bsp = bank_scan_sp(states_sp, Zb, sp_head, m.params)
    jax.block_until_ready(bsp.class_probs)
    t0 = time.perf_counter()
    for _ in range(3):
        _, bsp = bank_scan_sp(states_sp, Zb, sp_head, m.params)
        jax.block_until_ready(bsp.class_probs)
    bank_sp_fps = B * T_bank * 3 / (time.perf_counter() - t0)
    rep_bsp = evaluate_pf_banked(
        m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(Zq) for Zq in q_seqs],
        q_labels, burn_in=5, seed=0, config=pfc_bank_q, posterior=sp_head,
    )
    bank_sp_acc = rep_bsp.frame_metrics["accuracy"]
    _mark("bank64")

    result = {
                "metric": "pf_throughput_10k_particles",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
                "particles": N_PARTICLES,
                "frames": N_FRAMES,
                "D": m.D,
                "d": m.d,
                "n_train_frames": int(m.layout.Ny),
                "per_frame_ms": round(1000.0 * wall / N_FRAMES, 4),
                "frame_acc": round(float(frame_acc), 4),
                "frame_f1": round(float(frame_f1), 4),
                # accuracy is on the synthetic walk/run stand-in at the
                # published problem shape: the CMU mocap download is
                # unreachable from this environment (zero egress; see
                # tools/fetch_cmu.py).  tests/golden pins end-to-end
                # parity vs the actual reference implementation instead.
                "dataset": "synthetic-2class (CMU egress blocked)",
                "compressed_fps": round(comp_fps, 1),
                "compressed_frame_acc": round(float(comp_acc), 4),
                "compressed_frame_f1": round(float(comp_f1), 4),
                "compressed_rank": int(cp.rank_y),
                "d4_fps": round(d4_fps, 1) if d4_fps is not None else None,
                "d4_frame_acc": round(float(d4_acc), 4) if d4_acc is not None else None,
                "d4_frame_f1": round(float(d4_f1), 4) if d4_f1 is not None else None,
                "bank64x1k_aggregate_fps": round(bank_agg_fps, 1),
                "bank64x1k_sparsified_fps": round(bank_sp_fps, 1),
                "bank64x1k_sparsified_frame_acc": round(float(bank_sp_acc), 4),
                "hourlong_fps": round(hl_fps, 1) if hl_fps is not None else None,
                "hourlong_Ny": 108000 if hl_fps is not None else None,
                "hourlong_frame_acc": (
                    round(float(hl_acc), 4) if hl_acc is not None else None
                ),
                "hourlong_frame_f1": (
                    round(float(hl_f1), 4) if hl_f1 is not None else None
                ),
                "c8_fps": round(c8_fps, 1) if c8_fps is not None else None,
                "c8_frame_acc": round(float(c8_acc), 4) if c8_acc is not None else None,
                "c8_sparsified_fps": (
                    round(c8_sp_fps, 1) if c8_sp_fps is not None else None
                ),
                "c8_sparsified_frame_acc": (
                    round(float(c8_sp_acc), 4) if c8_sp_acc is not None else None
                ),
                "c8n5120_fps": (
                    round(c8n5120_fps, 1) if c8n5120_fps is not None else None
                ),
                "c8n5120_frame_acc": (
                    round(float(c8n5120_acc), 4) if c8n5120_acc is not None else None
                ),
                "c8n5120_sparsified_fps": (
                    round(c8n5120_sp_fps, 1)
                    if c8n5120_sp_fps is not None else None
                ),
                "c8n5120_sparsified_frame_acc": (
                    round(float(c8n5120_sp_acc), 4)
                    if c8n5120_sp_acc is not None else None
                ),
                "device": str(jax.devices()[0]),
                "compile_s": round(compile_s, 2),
                # tunnel weather vs cache warmth (see the warm-up comment)
                "first_program_s": round(first_program_s, 2),
                "cached_compile_s": round(cached_compile_s, 2),
                "setup_s": round(time.perf_counter() - t_setup, 2),
                "stage_s": {
                    k: round(v / timer.counts[k], 3)
                    for k, v in timer.totals.items()
                },
                "section_s": section_s,
            }
    # Accuracy-regression tripwire (round-4 post-mortem: the broken
    # hourlong bake was only visible in the driver's OWN json a round
    # later).  Compare every accuracy field against the newest committed
    # BENCH_r*.json and surface drops > 0.02 as a loud field — a regressed
    # section becomes a single grep-able line instead of a diff exercise.
    try:
        _now = set(os.listdir(_cache_dir))
        result["compile_cache"] = {
            "dir": os.path.basename(os.path.dirname(_cache_dir)) + "/" +
                   os.path.basename(_cache_dir),
            "entries": len(_now),
            "new_entries": len(_now - _cache_entries_before),
        }
    except OSError:
        pass
    prev = _load_prev_bench()
    if prev:
        regressions = {}
        for k, v in result.items():
            if v is None or not (k.endswith("_acc") or k.endswith("_f1")):
                continue
            pv = prev.get(k)
            if isinstance(pv, (int, float)) and v < pv - 0.02:
                regressions[k] = {"now": v, "prev": pv}
        if regressions:
            result["accuracy_regressions"] = regressions
    print(json.dumps(result))


def _load_prev_bench():
    """Newest committed BENCH_r*.json's parsed payload (or None)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = None, -1
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        mt = re.search(r"BENCH_r(\d+)\.json$", p)
        if not mt:
            continue
        n = int(mt.group(1))
        if n > best_n:
            best, best_n = p, n
    if best is None:
        return None
    try:
        with open(best) as f:
            payload = json.load(f)
        return payload.get("parsed") or payload
    except Exception:
        return None


if __name__ == "__main__":
    main()
