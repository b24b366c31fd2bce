"""Reference-format torch checkpoint import (utils.io.load_torch_model).

Builds a checkpoint in the reference's exact save layout
(`/root/reference/gpmdm/gpmdm.py:1307-1346`: a torch pickle holding
``state_dict`` + ``config_dict`` with raw observation sequences and exp'd
initial hyperparameters) and loads it into a gpmdm_tpu GPMDM.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gpmdm_tpu import GPMDM
from gpmdm_tpu.data import synthetic


def _make_reference_checkpoint(path):
    rng = np.random.default_rng(0)
    D, d, C = 6, 2, 2
    seqs, labels, _, _ = synthetic.make_dataset(
        n_classes=C, n_train_seqs=2, n_test_seqs=1, seq_len=15, D=D, seed=4
    )
    obs = [[], []]
    for Y, c in zip(seqs, labels):
        obs[c].append(np.asarray(Y, dtype=np.float64))
    Ny = sum(s.shape[0] for cls in obs for s in cls)

    state_dict = {
        "y_log_lengthscales": torch.tensor(rng.normal(size=(d,))),
        "y_log_lambdas": torch.tensor(rng.normal(size=(D,))),
        "y_log_sigma_n": torch.tensor(rng.normal(size=())),
        "x_log_lengthscales": torch.tensor(rng.normal(size=(d,))),
        "x_log_lambdas": torch.tensor(rng.normal(size=(d,))),
        "x_log_sigma_n": torch.tensor(rng.normal(size=())),
        "x_log_lin_coeff": torch.tensor(rng.normal(size=(d + 1,))),
        "X": torch.tensor(rng.normal(size=(Ny, d))),
    }
    config_dict = {
        "D": D,
        "d": d,
        "n_classes": C,
        "dyn_target": "full",
        "dyn_back_step": 1,
        "y_lambdas_init": np.ones(D),
        "y_lengthscales_init": np.ones(d),
        "y_sigma_n_init": 1e-2,
        "x_lambdas_init": np.ones(d),
        "x_lengthscales_init": np.ones(d),
        "x_sigma_n_init": 1e-2,
        "x_lin_coeff_init": np.ones(d + 1),
        "sigma_n_num_Y": 0.0,
        "sigma_n_num_X": 0.0,
        "dtype": "torch.float64",
        "class_aware_observations_list": obs,
    }
    torch.save({"state_dict": state_dict, "config_dict": config_dict}, path)
    return state_dict, config_dict


def test_load_torch_checkpoint(tmp_path):
    p = tmp_path / "ref.pth"
    state_dict, config_dict = _make_reference_checkpoint(p)
    m = GPMDM.load_torch(p)
    assert m.D == 6 and m.d == 2 and m.n_classes == 2
    assert m.dtype == np.float64
    np.testing.assert_allclose(
        np.asarray(m.params.X), state_dict["X"].numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(m.params.y_log_lengthscales),
        state_dict["y_log_lengthscales"].numpy(),
        rtol=1e-12,
    )
    # observations restored per class
    assert len(m.class_aware_observations_list[0]) == 2
    assert len(m.class_aware_observations_list[1]) == 2
    # posterior precomputed: predictions run
    mean, var = m.map_x_to_y(np.asarray(m.params.X)[:3])
    assert mean.shape == (3, 6) and np.isfinite(np.asarray(mean)).all()
    # loss evaluates finite (same NLL math as the reference applied to the
    # imported parameters)
    assert np.isfinite(m.gpdm_loss())
