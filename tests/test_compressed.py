"""Low-rank-quad compressed posterior (models/compressed.py): exactness at
full rank, spectral-truncation quality, conservative failure direction,
filter-backend dispatch, and PF end-to-end parity with the exact path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu import GPMDM, GPMDM_PF, PFConfig
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.models import compressed, core


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


def test_full_rank_is_exact(trained, queries):
    """With every eigenpair kept, the compressed quad IS the exact quad
    (same matrix in factored form)."""
    m, _, _ = trained
    N = m.layout.Ny
    cp = m.compressed_posterior(rank_y=N, rank_x=m.layout.n_max)
    my, vy = core.predict_y(m.posterior, m.params, queries, m.config)
    cy, cvy = compressed.predict_y(cp, m.params, queries, m.config)
    np.testing.assert_allclose(np.asarray(cy), np.asarray(my), atol=1e-9)
    np.testing.assert_allclose(np.asarray(cvy), np.asarray(vy), rtol=1e-5, atol=1e-11)
    mx, vx = core.predict_x_all_classes(m.posterior, m.params, queries, m.config)
    cx, cvx = compressed.predict_x_all_classes(cp, m.params, queries, m.config)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(mx), atol=1e-9)
    # trained dynamics Grams sit at condition ~1e7: f64 eigh-vs-inverse
    # roundoff on the quad reaches ~1e-8 absolute, which is ~1e-4 relative
    # on the smallest variances — a conditioning artifact, not truncation
    np.testing.assert_allclose(np.asarray(cvx), np.asarray(vx), rtol=1e-3, atol=1e-11)


def test_spectral_truncation_quality(trained, queries):
    """tol-selected ranks keep the variance within 1% while cutting the
    factor well below N; the mean is bit-exact by construction."""
    m, _, _ = trained
    cp = m.compressed_posterior(tol=1e-6)
    assert cp.rank_y < m.layout.Ny  # actually compressed
    my, vy = core.predict_y(m.posterior, m.params, queries, m.config)
    cy, cvy = compressed.predict_y(cp, m.params, queries, m.config)
    np.testing.assert_allclose(np.asarray(cy), np.asarray(my), atol=1e-9)
    assert float(jnp.max(jnp.abs(cvy - vy) / vy)) < 1e-2
    mx, vx = core.predict_x_all_classes(m.posterior, m.params, queries, m.config)
    cx, cvx = compressed.predict_x_all_classes(cp, m.params, queries, m.config)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(mx), atol=1e-9)
    assert float(jnp.max(jnp.abs(cvx - vx) / vx)) < 1e-2


def test_truncation_direction_is_variance_underestimate(trained, queries):
    """Dropping eigenpairs can only GROW the quad, i.e. the compressed
    variance is <= the exact variance (up to the 1e-9 floor): the
    documented conservative-direction property."""
    m, _, _ = trained
    cp = m.compressed_posterior(rank_y=8, rank_x=8)  # aggressive truncation
    _, vy = core.predict_y(m.posterior, m.params, queries, m.config)
    _, cvy = compressed.predict_y(cp, m.params, queries, m.config)
    assert np.all(np.asarray(cvy) <= np.asarray(vy) * (1 + 1e-9) + 1e-8)


def test_pf_dispatch_and_end_to_end(trained):
    """The filter accepts the compressed posterior everywhere the exact one
    is accepted, and classification quality matches."""
    m, te, tel = trained
    T = [[0.9, 0.1], [0.1, 0.9]]
    from gpmdm_tpu.utils.metrics import evaluate_pf_banked

    rep_exact = evaluate_pf_banked(
        m, T, [np.asarray(Z) for Z in te], tel, num_particles=400, burn_in=5,
        seed=0,
    )
    cp = m.compressed_posterior(tol=1e-6)
    rep_comp = evaluate_pf_banked(
        m, T, [np.asarray(Z) for Z in te], tel, num_particles=400, burn_in=5,
        seed=0, posterior=cp,
    )
    assert rep_comp.frame_metrics["accuracy"] > 0.8
    assert (
        abs(rep_comp.frame_metrics["accuracy"] - rep_exact.frame_metrics["accuracy"])
        < 0.05
    )

    # stateful wrapper with the override
    flt = GPMDM_PF(m, T, 200, posterior=cp, seed=3)
    outs = flt.run(np.asarray(te[0]))
    assert np.asarray(outs.class_probs).shape == (len(te[0]), 2)
    flt.update(np.asarray(te[0][0]))  # per-frame path compiles + runs


def test_recon_precision_knob(trained):
    """PFConfig.recon_precision threads into every posterior backend
    without changing semantics (MXU precision is a no-op on CPU, so the
    outputs must be bit-identical to the default config), and the config
    validates its values.  The TPU-measured effect of the knob lives in
    tools/exp_compressed_recon_precision.py / docs/BENCHMARKS.md."""
    m, te, tel = trained
    T = [[0.9, 0.1], [0.1, 0.9]]
    Z = np.asarray(te[0][:20])
    with pytest.raises(ValueError):
        PFConfig(recon_precision="bf16")
    assert PFConfig().lax_recon_precision is None
    assert (
        PFConfig(recon_precision="high").lax_recon_precision
        == jax.lax.Precision.HIGH
    )
    for post in (None, m.compressed_posterior(tol=1e-6)):
        base = GPMDM_PF(m, T, 100, posterior=post, seed=3).run(Z)
        knob = GPMDM_PF(
            m, T, 100, posterior=post, seed=3,
            config=PFConfig(num_particles=100, recon_precision="default"),
        ).run(Z)
        np.testing.assert_array_equal(
            np.asarray(base.class_probs), np.asarray(knob.class_probs)
        )


def test_auto_posterior_policy(trained):
    """posterior='auto' (the GPMDM_PF default) deploys exact below
    AUTO_COMPRESS_N and the compressed posterior above it; 'exact'
    pins reference semantics; the compression is cached on the model."""
    from gpmdm_tpu.filter.particle_filter import (
        AUTO_COMPRESS_N,
        resolve_posterior,
    )
    from gpmdm_tpu.models.compressed import CompressedPosterior

    m_small, _, _ = trained  # Ny=300 < threshold
    assert resolve_posterior(m_small, "auto") is m_small.posterior

    # Ny=1200 > threshold: policy decision needs only shapes, not training
    tr, tl, te, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=3, n_test_seqs=1, seq_len=200, D=8, seed=4
    )
    m = GPMDM(D=8, d=2, n_classes=2, dtype="float64",
              y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    assert m.layout.Ny > AUTO_COMPRESS_N

    auto = resolve_posterior(m, "auto")
    assert isinstance(auto, CompressedPosterior)
    assert resolve_posterior(m, "auto") is auto  # cached on the model
    assert resolve_posterior(m, "exact") is m.posterior
    assert resolve_posterior(m, None) is m.posterior
    with pytest.raises(ValueError):
        resolve_posterior(m, "bogus")

    # the stateful wrapper default follows the policy end-to-end
    flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=50, seed=0)
    assert isinstance(flt._post, CompressedPosterior)
    flt.update(np.asarray(te[0][0]))
    flt_exact = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=50,
                         seed=0, posterior="exact")
    assert flt_exact._post is m.posterior

    # a posterior refresh invalidates the compression cache
    m._precompute_kernel_inverses()
    assert resolve_posterior(m, "auto") is not auto

    # GPMDM_PF's string modes stay LIVE across model refreshes at every
    # model size (a pinned stale compressed posterior would silently
    # classify with pre-refresh parameters); only object overrides pin
    flt_auto = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=50,
                        seed=0)
    first = flt_auto._post
    assert isinstance(first, CompressedPosterior)
    m._precompute_kernel_inverses()
    assert flt_auto._post is not first  # re-resolved after the refresh
    pinned = m.compressed_posterior()
    flt_pin = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=50,
                       seed=0, posterior=pinned)
    m._precompute_kernel_inverses()
    assert flt_pin._post is pinned  # explicit object stays pinned

    # FLOP-parity fallback: with a tiny observation lengthscale the
    # Gram is ~I + noise, the tol-selected rank blows past q = N/2
    # where the compressed quad (two O(NqP) matmuls) costs more than
    # the exact one (one O(N^2 P)), and 'auto' deploys EXACT with a
    # warning.  (The former 20% threshold is now only an advisory —
    # measured at q/N=0.25 compression won both speed and accuracy on
    # the healthy c8n5120 asset; docs/BENCHMARKS.md.)
    import dataclasses as _dc

    import jax.numpy as _jnp

    m.params = _dc.replace(
        m.params,
        y_log_lengthscales=_jnp.full_like(
            m.params.y_log_lengthscales, np.log(0.01)
        ),
    )
    m._precompute_kernel_inverses()
    with pytest.warns(UserWarning, match="FLOP-parity"):
        flat_resolved = resolve_posterior(m, "auto")
    assert flat_resolved is m.posterior  # exact fallback


def test_compressed_is_a_pytree(trained):
    m, _, _ = trained
    cp = m.compressed_posterior(tol=1e-6)
    leaves = jax.tree.leaves(cp)
    assert all(isinstance(l, jax.Array) for l in leaves)
    # jit through it
    f = jax.jit(lambda p, q: compressed.predict_y(p, m.params, q, m.config)[0])
    out = f(cp, jnp.zeros((3, m.d)))
    assert out.shape == (3, m.D)


def test_compressed_cache_persists_through_save_load(trained, tmp_path, monkeypatch):
    """Checkpoints carry the deployment-posterior cache: a loaded model's
    compressed_posterior() is a cache hit (no O(N^3) host eigendecomposition
    — 29 s at Ny=5120) and predicts identically to the pre-save factors."""
    m, _, _ = trained
    cp = m.compressed_posterior()  # default ('auto') key
    cp_pinned = m.compressed_posterior(rank_y=7, rank_x=5)
    path = tmp_path / "with_cache.npz"
    m.save(path)

    m2 = GPMDM.load(path)
    # any recompute attempt on the loaded model is a test failure
    monkeypatch.setattr(
        compressed, "compress_host",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("compressed cache missed after load")),
    )
    cp2 = m2.compressed_posterior()
    cp2_pinned = m2.compressed_posterior(rank_y=7, rank_x=5)
    assert cp2.rank_y == cp.rank_y and cp2_pinned.rank_y == 7
    for a, b in zip(jax.tree.leaves(cp), jax.tree.leaves(cp2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    q = jnp.zeros((4, m.d))
    my, vy = compressed.predict_y(cp_pinned, m.params, q, m.config)
    my2, vy2 = compressed.predict_y(cp2_pinned, m2.params, q, m2.config)
    np.testing.assert_allclose(np.asarray(my2), np.asarray(my), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vy2), np.asarray(vy), atol=1e-12)
    # a model saved WITHOUT a cache loads with an empty one (format compat)
    m._compressed_cache = {}
    path2 = tmp_path / "no_cache.npz"
    m.save(path2)
    monkeypatch.undo()
    m3 = GPMDM.load(path2)
    assert getattr(m3, "_compressed_cache") == {}


def test_lazy_posterior_on_load(tmp_path, monkeypatch):
    """Checkpoint loading defers the O(N^3) exact precompute: an 'auto'
    deployment that hits the persisted compressed cache never builds the
    exact posterior; first explicit access builds it on demand."""
    from gpmdm_tpu.filter.particle_filter import (
        AUTO_COMPRESS_N,
        resolve_posterior,
    )
    from gpmdm_tpu.models.compressed import CompressedPosterior

    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=3, n_test_seqs=1, seq_len=200, D=8, seed=4
    )
    m = GPMDM(D=8, d=2, n_classes=2, dtype="float64",
              y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    assert m.layout.Ny > AUTO_COMPRESS_N
    resolve_posterior(m, "auto")  # populate the compressed cache
    path = tmp_path / "lazy.npz"
    m.save(path)

    m2 = GPMDM.load(path)
    assert m2._posterior is None and m2._posterior_pending
    # any exact build during the cached-auto deployment is a failure
    monkeypatch.setattr(
        core, "precompute_host",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("exact posterior built during cached 'auto'")),
    )
    auto2 = resolve_posterior(m2, "auto")
    assert isinstance(auto2, CompressedPosterior)
    assert m2._posterior is None  # still deferred
    # a cache-MISS compressed build while still deferred must run from the
    # stashed numpy host params, not the device params (a device fetch
    # here would pay the 2-450 s first-fetch the stash exists to avoid)
    import gpmdm_tpu.models.compressed as _comp

    orig_ch = _comp.compress_host

    def _spy(params, *a, **k):
        assert isinstance(params.X, np.ndarray), (
            "device params reached compress_host on a lazily-loaded model"
        )
        return orig_ch(params, *a, **k)

    monkeypatch.setattr(_comp, "compress_host", _spy)
    pinned = m2.compressed_posterior(rank_y=5, rank_x=5)
    assert pinned.rank_y == 5
    assert m2._posterior is None  # the miss did not force the exact build
    monkeypatch.undo()
    p = m2.posterior  # first access builds from the stashed host params
    assert p is not None and not m2._posterior_pending
    np.testing.assert_allclose(
        np.asarray(p.Ky_inv), np.asarray(m.posterior.Ky_inv),
        rtol=0, atol=1e-12,
    )
    # explicit refresh still rebuilds eagerly and clears the cache
    m2._precompute_kernel_inverses()
    assert m2._compressed_cache == {}
    assert m2.posterior is not None


def test_flop_parity_fallback_cache_stays_but_save_skips(
    trained, tmp_path, monkeypatch
):
    """The q>N/2 fallback keeps the factors CACHED (GPMDM_PF re-resolves
    'auto' per call — evicting would re-run the O(N^3) eigh every frame)
    but save_model must NOT persist the auto-key entry: U at q>N/2 is
    O(N^2)-sized dead weight 'auto' will never deploy."""
    import dataclasses as _dc

    import jax.numpy as _jnp

    from gpmdm_tpu.filter import particle_filter as _pf
    from gpmdm_tpu.filter.particle_filter import resolve_posterior

    monkeypatch.setattr(_pf, "AUTO_COMPRESS_N", 10)  # fixture Ny < 1024
    m, _, _ = trained
    m.params = _dc.replace(
        m.params,
        y_log_lengthscales=_jnp.full_like(m.params.y_log_lengthscales, -6.0),
    )
    m._precompute_kernel_inverses()
    with pytest.warns(UserWarning, match="FLOP-parity"):
        resolve_posterior(m, "auto")
    # cached (cheap repeated resolves) ...
    assert (None, None, 1e-6) in m._compressed_cache
    with pytest.warns(UserWarning, match="FLOP-parity"):
        resolve_posterior(m, "auto")  # dict hit, no recompute (fast)
    # ... but not persisted
    path = tmp_path / "flat.npz"
    m.save(path)
    with np.load(path) as data:
        assert not [k for k in data.files if k.startswith("comp_")]
    m2 = GPMDM.load(path)
    assert m2._compressed_cache == {}
    # an EXPLICITLY pinned near-full rank is the user's choice: persists
    N = m.layout.Ny
    m.compressed_posterior(rank_y=N)
    m.save(path)
    with np.load(path) as data:
        assert [k for k in data.files if k.startswith("comp_")]
    # restore for any later module-fixture users
    m.params = _dc.replace(
        m.params,
        y_log_lengthscales=_jnp.zeros_like(m.params.y_log_lengthscales),
    )
    m._precompute_kernel_inverses()


def test_lazy_posterior_build_failure_is_retryable(trained, tmp_path, monkeypatch):
    """A failed deferred build must keep the pending state (and the host
    params stash) so a later access retries instead of silently
    returning None forever."""
    m, _, _ = trained
    path = tmp_path / "retry.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    assert m2._posterior_pending
    calls = {"n": 0}
    orig = core.precompute_host

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise np.linalg.LinAlgError("synthetic failure")
        return orig(*a, **k)

    monkeypatch.setattr(core, "precompute_host", flaky)
    with pytest.raises(np.linalg.LinAlgError):
        _ = m2.posterior
    assert m2._posterior_pending and m2._lazy_host_params is not None
    p = m2.posterior  # retry succeeds
    assert p is not None and calls["n"] == 2


def test_compressed_key_normalization_saves(trained, tmp_path):
    """numpy-integer ranks are valid cache keys and must not break the
    JSON key serialization in save_model."""
    m, _, _ = trained
    cp = m.compressed_posterior(rank_y=np.int64(6), rank_x=np.int32(5))
    assert (6, 5, 1e-6) in m._compressed_cache
    path = tmp_path / "npkeys.npz"
    m.save(path)  # must not raise
    m2 = GPMDM.load(path)
    cp2 = m2._compressed_cache[(6, 5, 1e-6)]
    np.testing.assert_array_equal(np.asarray(cp2.Uy), np.asarray(cp.Uy))


def test_fused_mean_quad_matches_unfused(trained, queries):
    """The fused [A^T; K_inv] @ Kstar grouping (PFConfig.fuse_mean_quad)
    must equal the unfused two-matmul path to fp tolerance in f64 on CPU —
    same algebra, different MXU call grouping."""
    m, _, _ = trained
    HI = jax.lax.Precision.HIGHEST
    for backend, post in (
        (core, m.posterior),
        (compressed, m.compressed_posterior(rank_y=8, rank_x=6)),
    ):
        my_f, vy_f = backend.predict_y(post, m.params, queries, m.config,
                                       precision=HI, fused=True)
        my_u, vy_u = backend.predict_y(post, m.params, queries, m.config,
                                       precision=HI, fused=False)
        np.testing.assert_allclose(np.asarray(my_f), np.asarray(my_u),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(vy_f), np.asarray(vy_u),
                                   rtol=1e-9, atol=1e-14)
        mx_f, vx_f = backend.predict_x_all_classes(
            post, m.params, queries, m.config, precision=HI, fused=True)
        mx_u, vx_u = backend.predict_x_all_classes(
            post, m.params, queries, m.config, precision=HI, fused=False)
        np.testing.assert_allclose(np.asarray(mx_f), np.asarray(mx_u),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(vx_f), np.asarray(vx_u),
                                   rtol=1e-9, atol=1e-14)


def test_fused_gate_split_precision_and_class_count(trained, queries):
    """fused=True with a split quad_precision must fall back to the unfused
    branch (the fused matmul cannot honor two precisions), and the auto
    gate must resolve by n_classes: this C=2 fixture defaults to the fused
    grouping, so fused=None == fused=True results exactly."""
    m, _, _ = trained
    assert m.config.n_classes == 2
    HI = jax.lax.Precision.HIGHEST
    my_a, vy_a = core.predict_y(m.posterior, m.params, queries, m.config,
                                precision=HI)  # auto -> fused at C=2
    my_f, vy_f = core.predict_y(m.posterior, m.params, queries, m.config,
                                precision=HI, fused=True)
    np.testing.assert_array_equal(np.asarray(my_a), np.asarray(my_f))
    np.testing.assert_array_equal(np.asarray(vy_a), np.asarray(vy_f))
    # split precisions: fused=True is silently ignored; result must match
    # the explicit unfused path bit-for-bit (identical op sequence)
    my_s, vy_s = core.predict_y(m.posterior, m.params, queries, m.config,
                                precision=HI,
                                quad_precision=jax.lax.Precision.HIGH,
                                fused=True)
    my_u, vy_u = core.predict_y(m.posterior, m.params, queries, m.config,
                                precision=HI,
                                quad_precision=jax.lax.Precision.HIGH,
                                fused=False)
    np.testing.assert_array_equal(np.asarray(my_s), np.asarray(my_u))
    np.testing.assert_array_equal(np.asarray(vy_s), np.asarray(vy_u))
