"""Post-hoc SGPR distillation of trained exact models
(GPMDM.sparsified_posterior / models/sparse.py distill_host): near-exactness
at the full-M clamp, PF end-to-end quality at reduced M, cache semantics,
checkpoint persistence, and the family guard.

No reference counterpart (the reference family is exact-only); the spec is
agreement with the exact posterior plus the SGPR equations already
property-tested in tests/test_sparse.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpmdm_tpu import GPMDM, PFConfig
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.models import core, sparse
from gpmdm_tpu.utils.metrics import evaluate_pf_banked


@pytest.fixture(scope="module")
def trained():
    tr, tl, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=3, n_test_seqs=4, seq_len=50, D=12, seed=0
    )
    m = GPMDM(
        D=12, d=2, n_classes=2, dtype="float64",
        y_sigma_n_init=0.1, x_sigma_n_init=0.1,
    )
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    m.train_adam(num_opt_steps=120, lr=0.01)
    return m, te, tel


@pytest.fixture(scope="module")
def queries(trained):
    m, _, _ = trained
    rs = np.random.RandomState(1)
    return jnp.asarray(rs.randn(150, m.d) * 1.2)


def test_full_m_matches_exact(trained, queries):
    """With every training row kept as an inducing input (M clamped to the
    available counts), SGPR equals the exact posterior up to the Kuu
    jitter (Z=X makes Qnn=Knn); measured jitter-limited deltas are ~1e-3
    absolute on the mean and <0.2% on the variance in f64."""
    m, _, _ = trained
    sp = m.sparsified_posterior(n_inducing_y=10**9, n_inducing_x=10**9)
    assert sp.Zy.shape[0] == m.layout.Ny  # clamped
    my, vy = core.predict_y(m.posterior, m.params, queries, m.config)
    sy, svy = sparse.predict_y(sp, m.params, queries, m.config)
    np.testing.assert_allclose(np.asarray(sy), np.asarray(my), atol=5e-3)
    np.testing.assert_allclose(np.asarray(svy), np.asarray(vy), rtol=1e-2)
    mx, vx = core.predict_x_all_classes(m.posterior, m.params, queries, m.config)
    sx, svx = sparse.predict_x_all_classes(sp, m.params, queries, m.config)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(mx), atol=5e-3)
    np.testing.assert_allclose(np.asarray(svx), np.asarray(vx), rtol=1e-2)


def test_reduced_m_pf_accuracy(trained):
    """A distilled posterior at M ~ Ny/3 streams the held-out trials
    through the UNMODIFIED filter (backend dispatch by posterior type)
    above the reference's 0.9 accuracy bar."""
    m, te, tel = trained
    sp = m.sparsified_posterior(n_inducing_y=96, n_inducing_x=48)
    rep = evaluate_pf_banked(
        m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(Z) for Z in te], tel,
        burn_in=5, seed=0, config=PFConfig(num_particles=300),
        posterior=sp,
    )
    assert rep.frame_metrics["accuracy"] > 0.9


def test_cache_and_clamp_semantics(trained):
    """Same (My, Mx) key returns the cached object; the x default tracks
    My; a posterior refresh clears the cache."""
    m, _, _ = trained
    a = m.sparsified_posterior(n_inducing_y=64)
    b = m.sparsified_posterior(n_inducing_y=64)
    assert a is b
    assert a.Zx.shape[1] == 64  # Mx defaulted to My (both under the clamp)
    c = m.sparsified_posterior(n_inducing_y=64, n_inducing_x=32)
    assert c is not a and c.Zx.shape[1] == 32
    m._precompute_kernel_inverses()
    assert m.sparsified_posterior(n_inducing_y=64) is not a


def test_checkpoint_roundtrip_and_lazy_deploy(trained, tmp_path):
    """save() persists the sparsified cache; a loaded checkpoint deploys
    the SAME factors without building the exact posterior (the lazy
    O(N^3) precompute must stay deferred)."""
    m, te, tel = trained
    sp = m.sparsified_posterior(n_inducing_y=96, n_inducing_x=48)
    path = tmp_path / "m.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    assert getattr(m2, "_posterior_pending", False)  # exact build deferred
    sp2 = m2.sparsified_posterior(n_inducing_y=96, n_inducing_x=48)
    assert getattr(m2, "_posterior_pending", False)  # ...and still deferred
    for f in ("Zy", "Ly", "LBy", "beta_y", "Zx", "Lx", "LBx", "beta_x"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sp2, f)), np.asarray(getattr(sp, f))
        )
    # a NEW key on the loaded model distills from the lazy host params
    sp3 = m2.sparsified_posterior(n_inducing_y=64)
    assert sp3.Zy.shape[0] == 64
    assert getattr(m2, "_posterior_pending", False)


def test_sgpr_quad_precision_paths_agree(trained, queries):
    """The SGPR variance's hoisted-inverse matmul path
    (quad_precision set) equals the triangular-solve default to fp
    tolerance in f64 — same algebra, different op grouping — and threads
    through the PFConfig knob end to end."""
    m, te, tel = trained
    sp = m.sparsified_posterior(96, n_inducing_x=48)
    HI = jax.lax.Precision.HIGHEST
    my_t, vy_t = sparse.predict_y(sp, m.params, queries, m.config)
    my_i, vy_i = sparse.predict_y(sp, m.params, queries, m.config,
                                  quad_precision=HI)
    np.testing.assert_array_equal(np.asarray(my_t), np.asarray(my_i))
    np.testing.assert_allclose(np.asarray(vy_t), np.asarray(vy_i),
                               rtol=1e-9, atol=1e-12)
    mx_t, vx_t = sparse.predict_x_all_classes(sp, m.params, queries, m.config)
    mx_i, vx_i = sparse.predict_x_all_classes(sp, m.params, queries, m.config,
                                              quad_precision=HI)
    np.testing.assert_allclose(np.asarray(vx_t), np.asarray(vx_i),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(mx_t), np.asarray(mx_i))
    rep = evaluate_pf_banked(
        m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(Z) for Z in te], tel,
        burn_in=5, seed=0,
        config=PFConfig(num_particles=300, quad_precision="highest"),
        posterior=sp,
    )
    assert rep.frame_metrics["accuracy"] > 0.9


def test_kmeans_method(trained, tmp_path):
    """'kmeans' selection: deterministic, full-M degenerates to the data
    itself (== stride full-M), reduced-M filters above the bar, and the
    3-tuple cache key survives a checkpoint round-trip."""
    m, te, tel = trained
    a = m.sparsified_posterior(48, method="kmeans")
    m._sparsified_cache.clear()
    b = m.sparsified_posterior(48, method="kmeans")
    np.testing.assert_array_equal(np.asarray(a.Zy), np.asarray(b.Zy))
    # full-M: centroids of singleton clusters are the points themselves
    full_k = m.sparsified_posterior(10**9, method="kmeans")
    full_s = m.sparsified_posterior(10**9)
    np.testing.assert_allclose(
        np.asarray(full_k.Ly), np.asarray(full_s.Ly), atol=1e-12
    )
    rep = evaluate_pf_banked(
        m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(Z) for Z in te], tel,
        burn_in=5, seed=0, config=PFConfig(num_particles=300),
        posterior=m.sparsified_posterior(96, n_inducing_x=48, method="kmeans"),
    )
    assert rep.frame_metrics["accuracy"] > 0.9
    path = tmp_path / "mk.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    assert (48, None, "kmeans") in m2._sparsified_cache
    np.testing.assert_array_equal(
        np.asarray(m2._sparsified_cache[(48, None, "kmeans")].Zy),
        np.asarray(b.Zy),
    )
    with pytest.raises(ValueError, match="method"):
        m.sparsified_posterior(48, method="greedy")


def test_distill_back_step_2_full_m():
    """Second-order dynamics (dyn_back_step=2): the inducing inputs carry
    the concatenated [x_t, x_{t-1}] rows, and the full-M distillation
    still matches the exact posterior."""
    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=40, D=8, seed=3
    )
    m = GPMDM(
        D=8, d=2, n_classes=2, dyn_back_step=2, dtype="float64",
        y_sigma_n_init=0.1, x_sigma_n_init=0.1,
    )
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    m.train_adam(num_opt_steps=60, lr=0.01)
    sp = m.sparsified_posterior(n_inducing_y=10**9, n_inducing_x=10**9)
    assert sp.Zx.shape[2] == 2 * m.d  # concatenated back-step inputs
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(60, 2 * m.d) * 1.2)
    mx, vx = core.predict_x_all_classes(m.posterior, m.params, q, m.config)
    sx, svx = sparse.predict_x_all_classes(sp, m.params, q, m.config)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(mx), atol=5e-3)
    np.testing.assert_allclose(np.asarray(svx), np.asarray(vx), rtol=1e-2)


def test_distill_back_constrained():
    """BCGPMDM materializes X = K_b @ W; distillation runs on the
    materialized latents and stays a working filter backend."""
    from gpmdm_tpu import BCGPMDM

    tr, tl, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=2, seq_len=40, D=8, seed=1
    )
    m = BCGPMDM(
        D=8, d=2, n_classes=2, dtype="float64",
        y_sigma_n_init=0.1, x_sigma_n_init=0.1,
    )
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    m.train_adam(num_opt_steps=60, lr=0.01)
    sp = m.sparsified_posterior(n_inducing_y=48, n_inducing_x=32)
    rep = evaluate_pf_banked(
        m, [[0.9, 0.1], [0.1, 0.9]], [np.asarray(Z) for Z in te], tel,
        burn_in=5, seed=0, config=PFConfig(num_particles=200),
        posterior=sp,
    )
    assert rep.frame_metrics["accuracy"] > 0.8


def test_sparse_family_rejects_distillation():
    """SparseGPMDM deploys its own variational posterior; post-hoc
    distillation is an exact-family operation."""
    from gpmdm_tpu import SparseGPMDM

    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=1, n_test_seqs=1, seq_len=30, D=6, seed=0
    )
    m = SparseGPMDM(
        n_inducing_y=8, n_inducing_x=8, D=6, d=2, n_classes=2,
        dtype="float64", y_sigma_n_init=0.1, x_sigma_n_init=0.1,
    )
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    with pytest.raises(TypeError, match="own posterior"):
        m.sparsified_posterior(n_inducing_y=4)


def test_cli_eval_sparsify(trained, tmp_path, capsys):
    """CLI surface: eval --sparsify M deploys the distilled posterior."""
    from gpmdm_tpu.__main__ import main

    m, _, _ = trained
    path = tmp_path / "m.npz"
    m.save(path)
    rc = main(["eval", str(path), "--particles", "100", "--burn-in", "5",
               "--sparsify", "96", "--sparsify-x", "48", "--banked"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "sparsified posterior: M_y=96" in out


def test_deploy_recommendation_wins_over_thresholds(trained, tmp_path):
    """A guard-baked deployment recommendation beats the size-threshold
    'auto' policy (round-4 VERDICT #2): this model's Ny is below
    AUTO_COMPRESS_N, where the threshold path deploys EXACT — with a baked
    sparsified recommendation, resolve_posterior('auto') must return the
    persisted distilled factors instead, through a save/load round trip,
    without forcing the lazy exact build, and a posterior refresh must
    invalidate the verdict."""
    from gpmdm_tpu import GPMDM_PF
    from gpmdm_tpu.filter.particle_filter import (
        AUTO_COMPRESS_N,
        resolve_posterior,
    )

    m, _, _ = trained
    assert m.layout.Ny <= AUTO_COMPRESS_N  # threshold path would say exact
    sp = m.sparsified_posterior(64, method="kmeans")
    m._deploy_recommendation = {
        "family": "sparsified", "M": 64, "method": "kmeans",
        "guard_frame_acc": 0.99,
    }
    try:
        path = tmp_path / "rec.npz"
        m.save(path)
    finally:
        m._deploy_recommendation = None  # module-scoped fixture: keep clean
    m2 = GPMDM.load(path)
    post = resolve_posterior(m2, "auto")
    assert isinstance(post, sparse.SparsePosterior)
    assert post.Zy.shape[0] == 64
    assert getattr(m2, "_posterior_pending", False)  # exact build deferred
    np.testing.assert_array_equal(np.asarray(post.Zy), np.asarray(sp.Zy))
    # the GPMDM_PF default ('auto') deploys the recommendation too
    pf = GPMDM_PF(m2, [[0.9, 0.1], [0.1, 0.9]], num_particles=50)
    assert isinstance(pf._post, sparse.SparsePosterior)
    # a posterior refresh (retraining) clears the stale verdict: 'auto'
    # falls back to the size-threshold policy (exact at this Ny)
    m2._precompute_kernel_inverses()
    assert m2._deploy_recommendation is None
    assert isinstance(resolve_posterior(m2, "auto"), core.Posterior)


def test_distilled_flag_static_and_quad_default(trained, tmp_path):
    """distill_host marks its posteriors ``distilled=True`` as STATIC pytree
    metadata (not a leaf), the filter resolves the unset quad_precision to
    the hoisted-inverse 'high' path for them ONLY — the round-5 measured
    verdict (faster AND more accurate than tri-solve at every P on
    distilled deployments; the native sparse family keeps tri-solve) —
    'trisolve' is the explicit opt-out that still compiles a DIFFERENT
    program (the false-neutral-A/B guard, CLAUDE.md), and the flag
    survives the checkpoint roundtrip."""
    import dataclasses

    from gpmdm_tpu.filter import particle_filter as pfmod

    m, te, tel = trained
    sp = m.sparsified_posterior(96, n_inducing_x=48)
    assert sp.distilled is True
    # static: not a pytree leaf (array fields only), and trace-hashable
    n_data_fields = sum(
        1 for f in dataclasses.fields(sparse.SparsePosterior)
        if not f.metadata.get("static")
    )
    assert len(jax.tree_util.tree_leaves(sp)) == n_data_fields
    # natively-built posteriors default to distilled=False
    assert sparse.SparsePosterior.__dataclass_fields__["distilled"].default is False

    # resolution matrix: explicit always wins; unset-None promotes only
    # distilled posteriors; 'trisolve' opts back out
    HIGH = jax.lax.Precision.HIGH
    assert pfmod._effective_quad_precision(PFConfig(), sp) == HIGH
    assert pfmod._effective_quad_precision(
        PFConfig(quad_precision="trisolve"), sp) is None
    assert pfmod._effective_quad_precision(
        PFConfig(quad_precision="highest"), sp) == jax.lax.Precision.HIGHEST
    assert pfmod._effective_quad_precision(PFConfig(), m.posterior) is None
    native = dataclasses.replace(sp, distilled=False)
    assert pfmod._effective_quad_precision(PFConfig(), native) is None

    # the two arms compile DIFFERENT programs on a distilled posterior:
    # the hoisted path carries extra (M, M) @ (M, P) dot_generals where
    # the opt-out runs per-frame triangular solves
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=m.dtype))
    pfc = PFConfig(num_particles=100)
    state = pfmod.pf_init(
        sp, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc
    )
    Z = jnp.asarray(np.asarray(te[0])[:6], dtype=m.dtype)

    def dot_generals(pfc):
        jx = jax.make_jaxpr(
            lambda s, Z: pfmod.pf_scan(s, Z, sp, m.params, log_T, m.config, pfc)
        )(state, Z)

        def walk(jaxpr):
            c = 0
            for eqn in jaxpr.eqns:
                if eqn.primitive.name == "dot_general":
                    c += 1
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr"):
                        c += walk(v.jaxpr)
                    if isinstance(v, (list, tuple)):
                        for vi in v:
                            if hasattr(vi, "jaxpr"):
                                c += walk(vi.jaxpr)
            return c

        return walk(jx.jaxpr)

    n_default = dot_generals(PFConfig(num_particles=100))
    n_trisolve = dot_generals(
        PFConfig(num_particles=100, quad_precision="trisolve")
    )
    assert n_default > n_trisolve

    # ...and agree numerically (same algebra, different op grouping; f64)
    _, o_def = jax.jit(
        lambda s, Z: pfmod.pf_scan(s, Z, sp, m.params, log_T, m.config, pfc)
    )(state, Z)
    _, o_tri = jax.jit(
        lambda s, Z: pfmod.pf_scan(
            s, Z, sp, m.params, log_T, m.config,
            PFConfig(num_particles=100, quad_precision="trisolve"),
        )
    )(state, Z)
    np.testing.assert_allclose(
        np.asarray(o_def.class_probs), np.asarray(o_tri.class_probs),
        rtol=0, atol=1e-9,
    )

    # roundtrip: the persisted sparsified cache restores distilled=True
    # (old checkpoints without the field load as distilled via the cache
    # path too — the flag is implied by the cache, not stored)
    path = tmp_path / "distilled_flag.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    sp2 = m2.sparsified_posterior(96, n_inducing_x=48)
    assert sp2.distilled is True
