"""Pallas fused GP-posterior kernel vs the unfused XLA path (interpret mode
on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_fused_rbf_posterior_matches_reference():
    from gpmdm_tpu.ops.pallas.gp_posterior import fused_rbf_posterior

    rng = np.random.default_rng(0)
    N, P, D, d = 100, 70, 9, 3
    Xt = rng.normal(size=(N, d)).astype(np.float32)
    Xs = rng.normal(size=(P, d)).astype(np.float32)
    Ay = rng.normal(size=(N, D)).astype(np.float32)
    M = rng.normal(size=(N, N)).astype(np.float32)
    Kinv = (M @ M.T / N + np.eye(N)).astype(np.float32)
    inv_ls = np.exp(rng.normal(size=(d,))).astype(np.float32)

    mean, quad = fused_rbf_posterior(
        jnp.asarray(Xt), jnp.asarray(Xs), jnp.asarray(Ay), jnp.asarray(Kinv),
        jnp.asarray(inv_ls), tile_p=128, tile_n=128,
    )

    # reference (unfused)
    diff = (Xt[:, None, :] - Xs[None, :, :]) * inv_ls
    Kstar = np.exp(-np.sum(diff**2, axis=2))  # (N, P)
    mean_ref = Kstar.T @ Ay
    quad_ref = np.sum(Kstar * (Kinv @ Kstar), axis=0)

    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(quad), quad_ref, rtol=2e-3, atol=2e-3)


def test_fused_rbf_posterior_pad_exactness():
    """Padded rows/cols must not leak into results (N, P, D not multiples of
    the tile sizes)."""
    from gpmdm_tpu.ops.pallas.gp_posterior import fused_rbf_posterior

    rng = np.random.default_rng(1)
    N, P, D, d = 33, 17, 5, 2
    Xt = rng.normal(size=(N, d)).astype(np.float32)
    Xs = rng.normal(size=(P, d)).astype(np.float32)
    Ay = rng.normal(size=(N, D)).astype(np.float32)
    Kinv = np.eye(N, dtype=np.float32)
    inv_ls = np.ones(d, dtype=np.float32)

    mean, quad = fused_rbf_posterior(
        jnp.asarray(Xt), jnp.asarray(Xs), jnp.asarray(Ay), jnp.asarray(Kinv),
        jnp.asarray(inv_ls), tile_p=128, tile_n=128,
    )
    diff = (Xt[:, None, :] - Xs[None, :, :])
    Kstar = np.exp(-np.sum(diff**2, axis=2))
    np.testing.assert_allclose(np.asarray(mean), Kstar.T @ Ay, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(quad), np.sum(Kstar * Kstar, axis=0), rtol=2e-3, atol=2e-3
    )


def _small_model():
    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.data import synthetic

    tr, tl, te, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=20, D=6, seed=2
    )
    m = GPMDM(D=6, d=2, n_classes=2, dtype="float32")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    return m, te


def test_fused_y_posterior_matches_core(_interpret):
    """Fused observation posterior == core.predict_y on a real model."""
    from gpmdm_tpu.models import core
    from gpmdm_tpu.ops import kernels as K
    from gpmdm_tpu.ops.pallas.gp_posterior import fused_rbf_posterior

    m, te = _small_model()
    Xstar = jnp.asarray(np.random.default_rng(0).normal(size=(37, 2)), dtype=jnp.float32)
    mean_ref, var_ref = core.predict_y(m.posterior, m.params, Xstar, m.config)
    mean, quad = fused_rbf_posterior(
        m.posterior.X, Xstar, m.posterior.Ay, m.posterior.Ky_inv,
        jnp.exp(-m.params.y_log_lengthscales),
    )
    diag = K.y_diag_kernel(Xstar, m.params.y_log_sigma_n, 0.0, False)
    var = (diag - quad)[:, None] * jnp.exp(m.params.y_log_lambdas)[None, :] ** -2
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), rtol=1e-3, atol=1e-4)
    # variance involves the f32 explicit inverse: both paths carry ~5e-3
    # absolute error vs f64 truth (the pallas path is the *more* accurate
    # one); compare with an absolute band at that inherent limit.
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), atol=2e-2)


def test_fused_x_posterior_matches_core(_interpret):
    """Fused per-class dynamics posterior == core.predict_x_all_classes."""
    from gpmdm_tpu.models import core
    from gpmdm_tpu.ops import kernels as K
    from gpmdm_tpu.ops.pallas.gp_posterior import fused_x_posterior

    m, te = _small_model()
    Xstar = jnp.asarray(np.random.default_rng(1).normal(size=(23, 2)), dtype=jnp.float32)
    means_ref, vars_ref = core.predict_x_all_classes(m.posterior, m.params, Xstar, m.config)
    inv_ls = jnp.exp(-m.params.x_log_lengthscales)
    lin_w = jnp.exp(m.params.x_log_lin_coeff)
    diag = K.x_diag_kernel(Xstar, m.params.x_log_lin_coeff, m.params.x_log_sigma_n)
    for c in range(2):
        mean, quad = fused_x_posterior(
            m.posterior.Xin_c[c], Xstar, m.posterior.Axc[c], m.posterior.Kxc_inv[c],
            inv_ls, lin_w, n_valid=m.posterior.Xin_c.shape[1],
        )
        var = (diag - quad)[:, None] * jnp.exp(m.params.x_log_lambdas)[None, :] ** -2
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(means_ref[c]), rtol=1e-3, atol=1e-3
        )
        # f64 arbitration shows BOTH paths carry ~0.03-0.1 absolute error
        # here (f32 quad against a per-class explicit inverse with entries
        # ~1e4); the band reflects that shared limit, not kernel error.
        np.testing.assert_allclose(np.asarray(var), np.asarray(vars_ref[c]), atol=0.2)


def test_pf_step_pallas_runs_and_is_close(_interpret):
    """pf_step with fused Pallas stages produces finite, close outputs (the
    sampling stages amplify f32 reassociation differences, so this is a
    sanity band, not bit equality — exactness is asserted at the
    prediction level above)."""
    from gpmdm_tpu import PFConfig
    from gpmdm_tpu.filter import particle_filter as pf

    m, te = _small_model()
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=jnp.float32))
    z = jnp.asarray(te[0][0], dtype=jnp.float32)
    outs = {}
    for mode in ("off", "on"):
        pfc = PFConfig(num_particles=200, precision="highest", pallas=mode)
        s = pf.pf_init(m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc)
        _, out = pf.pf_step(s, z, m.posterior, m.params, log_T, m.config, pfc)
        outs[mode] = out
    assert np.isfinite(np.asarray(outs["on"].class_probs)).all()
    np.testing.assert_allclose(
        np.asarray(outs["on"].class_probs),
        np.asarray(outs["off"].class_probs),
        atol=0.05,
    )


def test_fused_obs_loglik_matches_unfused():
    """quad/qres from the fully-fused weighting kernel == the unfused math,
    including non-multiple shapes (padding exactness)."""
    from gpmdm_tpu.ops.pallas.gp_posterior import fused_obs_loglik

    rng = np.random.default_rng(5)
    for N, P, D, d in [(100, 70, 9, 3), (33, 17, 5, 2)]:
        Xt = rng.normal(size=(N, d)).astype(np.float32)
        Xs = rng.normal(size=(P, d)).astype(np.float32)
        Ay = rng.normal(size=(N, D)).astype(np.float32)
        M = rng.normal(size=(N, N)).astype(np.float32)
        Kinv = (M @ M.T / N + np.eye(N)).astype(np.float32)
        inv_ls = np.exp(rng.normal(size=(d,))).astype(np.float32)
        z = rng.normal(size=(D,)).astype(np.float32)
        lam2 = np.exp(rng.normal(size=(D,))).astype(np.float32)

        quad, qres = fused_obs_loglik(
            jnp.asarray(Xt), jnp.asarray(Xs), jnp.asarray(Ay),
            jnp.asarray(Kinv), jnp.asarray(inv_ls), jnp.asarray(z),
            jnp.asarray(lam2), tile_p=128, tile_n=128,
        )

        diff = (Xt[:, None, :] - Xs[None, :, :]) * inv_ls
        Kstar = np.exp(-np.sum(diff**2, axis=2))  # (N, P)
        mean_ref = Kstar.T @ Ay  # (P, D)
        quad_ref = np.sum(Kstar * (Kinv @ Kstar), axis=0)
        qres_ref = np.sum(lam2 * (mean_ref - z) ** 2, axis=1)

        np.testing.assert_allclose(np.asarray(quad), quad_ref, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(qres), qres_ref, rtol=2e-3, atol=2e-3)


def test_pf_step_fused_obs_loglik_matches_xla(monkeypatch):
    """pf_step with the fused observation weighting == the XLA path on a
    well-conditioned model (log-liks and readouts agree closely).

    The model is deliberately kept mildly trained with a healthy noise
    floor: at near-singular posteriors (var_common ~ 1e-5) the two star
    kernels legitimately diverge at the f32 level — the fused kernel's
    per-dimension squared distance is MORE accurate than the XLA path's
    norm-expansion — and quad can flip the sign of a ~0 variance either
    way.  Both paths give such particles ~zero weight; exact agreement is
    only meaningful away from singularity."""
    import gpmdm_tpu.filter.particle_filter as pfmod
    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic

    tr, tl, te, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=20, D=8, seed=17
    )
    m = GPMDM(
        D=8, d=2, n_classes=2, dtype="float32",
        y_sigma_n_init=0.3, x_sigma_n_init=0.3, sigma_n_num_Y=0.1,
    )
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    m.train_adam(num_opt_steps=10, lr=0.01)

    # 'highest' so both paths compute exact f32: at the default 'high' the
    # fused kernel's bf16 hi/lo 3-pass emulation (real even in interpret
    # mode) diverges from CPU-XLA's exact f32 by ~1% of |log_lik|.
    pfc = PFConfig(num_particles=64, precision="highest")
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=jnp.float32))
    state = pfmod.pf_init(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(3), pfc
    )
    z = jnp.asarray(np.asarray(te[0][0], dtype=np.float32))

    s_ref, o_ref = pfmod.pf_step(
        state, z, m.posterior, m.params, log_T, m.config, pfc
    )
    # force ONLY the fused observation stage (dynamics stays XLA so the
    # propagated states — and thus the comparison — are identical)
    monkeypatch.setattr(
        pfmod, "_use_pallas",
        lambda post, cfg, stage="dyn": stage == "obs",
    )
    s_fused, o_fused = pfmod.pf_step(
        state, z, m.posterior, m.params, log_T, m.config, pfc
    )
    # the two star-kernel formulations differ at the f32 level (~2e-4
    # relative), which scales with |log_lik|
    np.testing.assert_allclose(
        np.asarray(s_fused.log_lik), np.asarray(s_ref.log_lik),
        rtol=1e-3, atol=0.01,
    )
    np.testing.assert_allclose(
        np.asarray(o_fused.class_probs), np.asarray(o_ref.class_probs),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(o_fused.state_mean), np.asarray(o_ref.state_mean),
        rtol=1e-3, atol=1e-5,
    )


def test_mxu_dot_high_emulation_error_level():
    """The in-kernel HIGH emulation (bf16 hi/lo 3-pass, _mxu_dot) must sit
    at XLA-HIGH's error level: far tighter than 1-pass bf16, looser than
    exact f32 — pins that the split actually happens."""
    import jax.numpy as jnp

    from gpmdm_tpu.ops.pallas.gp_posterior import _mxu_dot

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(96, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(64, 80)), jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    truth = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.abs(truth).max()

    err_high = np.abs(np.asarray(_mxu_dot(a, b, dims, jax.lax.Precision.HIGH),
                                 np.float64) - truth).max() / scale
    bf = lambda x: np.asarray(x, np.float32).astype(np.dtype("bfloat16"))
    err_1pass = np.abs(
        bf(a).astype(np.float64) @ bf(b).astype(np.float64) - truth
    ).max() / scale
    assert err_high < 2e-4, err_high       # ~3-pass level
    assert err_1pass > 1e-3, err_1pass     # 1-pass is much worse
    assert err_high < err_1pass / 5


def test_precision_canonicalization_and_tile_table():
    """String precisions must canonicalize (an un-canonicalized 'high'
    would skip the 3-pass emulation and crash in Mosaic on device while
    passing on CPU), and the tile selector must raise informatively for
    shapes with no on-device-validated entry."""
    from gpmdm_tpu.ops.pallas.gp_posterior import (
        _canon_precision,
        _default_tile_p,
        fused_rbf_posterior,
    )

    assert _canon_precision("high") == jax.lax.Precision.HIGH
    assert _canon_precision(None) == jax.lax.Precision.HIGHEST
    assert _default_tile_p(1024, mxu_precision="high", kernel="x") == 512
    assert _default_tile_p(512, mxu_precision="highest", kernel="obs") == 1024
    with pytest.raises(ValueError, match="validated"):
        _default_tile_p(8192, mxu_precision="highest", kernel="x")
    with pytest.raises(ValueError, match="validated"):
        _default_tile_p(2048, mxu_precision="high", kernel="x")

    # string precision accepted end-to-end (interpret mode)
    rng = np.random.default_rng(9)
    Xt = jnp.asarray(rng.normal(size=(20, 2)), jnp.float32)
    Xs = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
    Ay = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    mean, quad = fused_rbf_posterior(
        Xt, Xs, Ay, jnp.eye(20, dtype=jnp.float32),
        jnp.ones(2, jnp.float32), mxu_precision="high",
    )
    assert np.isfinite(np.asarray(mean)).all()
