"""Model core (NLL, posterior prediction) vs the dense masked-matrix oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu.config import GPMDMConfig
from gpmdm_tpu.models import core
from gpmdm_tpu.ops.layout import build_layout, class_block_mask, xin_xout

import oracle


def make_model(rng, n_classes=2, D=6, d=3, target="full", back_step=1, dtype="float64"):
    cfg = GPMDMConfig(
        D=D, d=d, n_classes=n_classes, dyn_target=target, dyn_back_step=back_step,
        dtype=dtype, sigma_n_num_Y=0.01, sigma_n_num_X=0.01,
    )
    seq_lengths = [9, 7] + [8, 6] * (n_classes - 1)
    seq_classes = [0, 0] + sum(([c, c] for c in range(1, n_classes)), [])
    layout = build_layout(seq_lengths, seq_classes, n_classes, back_step)
    Y = rng.normal(size=(layout.Ny, D))
    X0 = core.pca_init_x(Y, d)
    params = core.init_params(
        cfg,
        y_lengthscales_init=np.abs(rng.normal(size=(d,))) + 0.5,
        y_lambdas_init=np.abs(rng.normal(size=(D,))) + 0.5,
        y_sigma_n_init=0.1,
        x_lengthscales_init=np.abs(rng.normal(size=(d * back_step,))) + 0.5,
        x_lambdas_init=np.abs(rng.normal(size=(d,))) + 0.5,
        x_sigma_n_init=0.1,
        x_lin_coeff_init=np.abs(rng.normal(size=(d * back_step + 1,))) + 0.5,
        X0=X0,
    )
    return cfg, layout, params, Y


def test_pca_init_matches_svd_projection(rng):
    Y = rng.normal(size=(20, 6))
    X0 = core.pca_init_x(Y, 3)
    # PCA scores satisfy: X0 == centered Y projected onto top-3 principal axes
    Yc = Y - Y.mean(0)
    # reconstruct via least squares: the column space of X0 must equal the
    # top-3 left singular subspace scaled by singular values
    U, S, Vt = np.linalg.svd(Yc, full_matrices=False)
    np.testing.assert_allclose(np.abs(X0), np.abs(U[:, :3] * S[:3]), atol=1e-8)
    # deterministic sign: max-|u| element of each component positive
    for k in range(3):
        col = X0[:, k] / S[k]
        assert col[np.argmax(np.abs(col))] > 0


def test_y_nll_matches_oracle(rng):
    cfg, layout, params, Y = make_model(rng)
    got = float(core.y_neg_log_likelihood(params, jnp.asarray(Y), cfg))
    want = oracle.nll_y(
        Y,
        np.asarray(params.X),
        np.asarray(params.y_log_lengthscales),
        np.asarray(params.y_log_lambdas),
        np.asarray(params.y_log_sigma_n),
        sn_num=cfg.sigma_n_num_Y,
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


@pytest.mark.parametrize("target,back_step", [("full", 1), ("delta", 1), ("full", 2)])
def test_x_nll_block_equals_masked_dense(rng, target, back_step):
    """The per-class block NLL must equal the reference's masked full-matrix
    NLL (they are mathematically identical for block-diagonal K*M)."""
    cfg, layout, params, Y = make_model(rng, target=target, back_step=back_step)
    got = float(core.x_neg_log_likelihood(params, cfg, layout))
    Xin, Xout = xin_xout(params.X, layout, target)
    M = class_block_mask(layout, dtype=np.float64)
    want = oracle.nll_x_masked(
        np.asarray(Xout),
        np.asarray(Xin),
        M,
        np.asarray(params.x_log_lengthscales),
        np.asarray(params.x_log_lambdas),
        np.asarray(params.x_log_sigma_n),
        np.asarray(params.x_log_lin_coeff),
        sn_num=cfg.sigma_n_num_X,
    )
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_total_nll_balance(rng):
    cfg, layout, params, Y = make_model(rng)
    ly = float(core.y_neg_log_likelihood(params, jnp.asarray(Y), cfg))
    lx = float(core.x_neg_log_likelihood(params, cfg, layout))
    total = float(core.nll(params, jnp.asarray(Y), cfg, layout, balance=2.5))
    np.testing.assert_allclose(total, ly + 2.5 * lx, rtol=1e-10)
    # compat mode: balance silently ignored (reference bug, gpmdm.py:866)
    cfg_compat = cfg.replace(balance_fix=False)
    total = float(core.nll(params, jnp.asarray(Y), cfg_compat, layout, balance=2.5))
    np.testing.assert_allclose(total, ly + lx, rtol=1e-10)


def test_predict_y_matches_oracle(rng):
    cfg, layout, params, Y = make_model(rng)
    post = core.precompute(params, jnp.asarray(Y), cfg, layout)
    Xstar = rng.normal(size=(5, cfg.d))
    mean, var = core.predict_y(post, params, jnp.asarray(Xstar), cfg)
    want_mean, want_var = oracle.predict_y(
        Y,
        np.asarray(params.X),
        Xstar,
        np.asarray(params.y_log_lengthscales),
        np.asarray(params.y_log_lambdas),
        np.asarray(params.y_log_sigma_n),
        sn_num=cfg.sigma_n_num_Y,
    )
    np.testing.assert_allclose(np.asarray(mean), want_mean, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), want_var, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("class_index", [0, 1])
def test_predict_x_for_class_matches_masked_oracle(rng, class_index):
    """Per-class padded-block posterior == reference masked-full-matrix
    formulation (gpmdm.py:1032-1068, 1297-1305)."""
    cfg, layout, params, Y = make_model(rng, n_classes=2)
    post = core.precompute(params, jnp.asarray(Y), cfg, layout)
    Xstar = rng.normal(size=(4, cfg.d))
    mean, var = core.predict_x_for_class(post, params, jnp.asarray(Xstar), class_index, cfg)

    Xin, Xout = xin_xout(params.X, layout, cfg.dyn_target)
    M = class_block_mask(layout, dtype=np.float64)
    pc = layout.pair_class
    M_c = M * ((pc[:, None] == class_index) & (pc[None, :] == class_index))
    want_mean, want_var = oracle.predict_x_for_class_masked(
        np.asarray(Xout),
        np.asarray(Xin),
        M_c,
        Xstar,
        np.asarray(params.x_log_lengthscales),
        np.asarray(params.x_log_lambdas),
        np.asarray(params.x_log_sigma_n),
        np.asarray(params.x_log_lin_coeff),
        sn_num=cfg.sigma_n_num_X,
        jitter=cfg.class_jitter,
    )
    np.testing.assert_allclose(np.asarray(mean), want_mean, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var), want_var, rtol=1e-5, atol=1e-7)


def test_predict_x_all_classes_consistent(rng):
    cfg, layout, params, Y = make_model(rng, n_classes=3, D=5)
    post = core.precompute(params, jnp.asarray(Y), cfg, layout)
    Xstar = jnp.asarray(rng.normal(size=(6, cfg.d)))
    means, variances = core.predict_x_all_classes(post, params, Xstar, cfg)
    assert means.shape == (3, 6, cfg.d)
    for c in range(3):
        m, v = core.predict_x_for_class(post, params, Xstar, c, cfg)
        np.testing.assert_allclose(np.asarray(means[c]), np.asarray(m))
        np.testing.assert_allclose(np.asarray(variances[c]), np.asarray(v))


def test_rollout_shapes_and_determinism(rng):
    cfg, layout, params, Y = make_model(rng)
    post = core.precompute(params, jnp.asarray(Y), cfg, layout)
    x0 = jnp.asarray(rng.normal(size=(cfg.d,)))
    traj = core.rollout(post, params, x0, 10, 0, cfg)
    assert traj.shape == (10, cfg.d)
    traj2 = core.rollout(post, params, x0, 10, 0, cfg)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(traj2))
    # first step equals a direct prediction
    m, _ = core.predict_x_for_class(post, params, x0[None, :], 0, cfg)
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(m[0]))


def test_rollout_back_step_2(rng):
    cfg, layout, params, Y = make_model(rng, back_step=2)
    post = core.precompute(params, jnp.asarray(Y), cfg, layout)
    x0 = jnp.asarray(rng.normal(size=(2, cfg.d)))
    traj = core.rollout(post, params, x0, 5, 1, cfg)
    assert traj.shape == (5, cfg.d)


def test_nmse_diagnostics_finite(rng):
    cfg, layout, params, Y = make_model(rng)
    post = core.precompute(params, jnp.asarray(Y), cfg, layout)
    v = core.latent_map_nmse(post, params, cfg, params.X, jnp.asarray(Y))
    assert np.isfinite(float(v))
    v2 = core.dynamics_map_nmse_for_class(post, params, cfg, 0)
    assert np.isfinite(float(v2))
    # floored variant is <= true variant + 1 and integral contribution
    vf = core.latent_map_nmse(post, params, cfg, params.X, jnp.asarray(Y), floored=True)
    assert float(vf) <= float(v)


def test_reference_api_parity_methods():
    """get_M / get_M_for_class / get_Xin_Xout_matrices / kernel getters /
    per-map NLLs (reference gpmdm.py:311-718) behave consistently."""
    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.data import synthetic

    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=12, D=5, seed=9
    )
    m = GPMDM(D=5, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()

    M = m.get_M()
    Nx = m.layout.Nx
    assert M.shape == (Nx, Nx)
    # block diagonal of ones, sum of per-class masks equals M
    M0, M1 = m.get_M_for_class(0), m.get_M_for_class(1)
    np.testing.assert_array_equal(M0 + M1, M)
    # Xin/Xout shapes + starts
    Xin, Xout, starts = m.get_Xin_Xout_matrices()
    assert Xin.shape == (Nx, 2) and Xout.shape == (Nx, 2)
    assert starts[0] == 0 and len(starts) == 4
    # masked-Gram NLL identity: L = L_y + L_x
    total = m.gpdm_loss()
    np.testing.assert_allclose(
        total, m.get_y_neg_log_likelihood() + m.get_x_neg_log_likelihood(), rtol=1e-12
    )
    # kernel getters: diagonal of y kernel with noise = 1 + sigma^2
    Ky = np.asarray(m.get_y_kernel(m.params.X[:4], m.params.X[:4]))
    sigma2 = float(jnp.exp(m.params.y_log_sigma_n)) ** 2
    np.testing.assert_allclose(np.diag(Ky), 1 + sigma2, rtol=1e-10)


def test_precompute_host_matches_jitted():
    """Host-f64 posterior precompute == jitted precompute (f64 model)."""
    import jax.numpy as jnp

    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.models import core

    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=15, D=6, seed=13
    )
    m = GPMDM(D=6, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()  # uses precompute_host
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    jitted = core.precompute(m.params, Y, m.config, m.layout)
    for f in ["Ky_inv", "Ay", "Kx_inv", "Ax", "Kxc_inv", "Axc", "Xin", "Xout"]:
        np.testing.assert_allclose(
            np.asarray(getattr(m.posterior, f)),
            np.asarray(getattr(jitted, f)),
            rtol=1e-6, atol=1e-7, err_msg=f,
        )


@pytest.mark.parametrize("target,back_step", [("full", 1), ("full", 2)])
def test_x_nll_deflated_equals_direct(rng, target, back_step):
    """The linear-kernel-deflated dynamics NLL (the f32-safe default,
    core.x_block_terms_deflated) must equal the direct full-block
    factorization to f64 round-off — the determinant lemma / Woodbury
    fold-in is exact math, not an approximation."""
    cfg, layout, params, Y = make_model(rng, target=target, back_step=back_step)
    got = float(core.x_neg_log_likelihood(params, cfg, layout))
    cfg_direct = cfg.replace(deflate_x_linear=False)
    want = float(core.x_neg_log_likelihood(params, cfg_direct, layout))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_x_nll_padded_deflated_equals_direct(rng):
    """Padded-block (sharded-trainer) dynamics terms: deflated == direct,
    and the zero-padding stays exact (identity rows contribute nothing)."""
    from gpmdm_tpu.ops.layout import padded_class_indices

    cfg, layout, params, Y = make_model(rng, n_classes=3)
    pads = padded_class_indices(layout)
    args = (
        params, cfg,
        jnp.asarray(pads["idx_in"]), jnp.asarray(pads["idx_prev"]),
        jnp.asarray(pads["idx_out"]),
        jnp.asarray(pads["mask"], dtype=jnp.float64),
    )
    got = np.asarray(core.x_nll_padded_blocks(*args))
    want = np.asarray(
        core.x_nll_padded_blocks(args[0], cfg.replace(deflate_x_linear=False),
                                 *args[2:])
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # and the padded form equals the unpadded loop (both deflated)
    per_class = got.sum()
    dense = float(core.x_neg_log_likelihood(params, cfg, layout))
    log_det_W = 2.0 * float(np.sum(np.asarray(params.x_log_lambdas)))
    np.testing.assert_allclose(
        per_class - layout.Nx * log_det_W, dense, rtol=1e-9
    )
