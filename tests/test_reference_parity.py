"""Gold-standard parity: run the ACTUAL reference implementation
(/root/reference, PyTorch) on identical inputs and compare numerically.

These tests are the strongest fidelity evidence available without CMU data:
same observations, same initial hyperparameters -> the reference's PCA
init, kernels, NLL, Adam training trajectory, and GP posteriors must agree
with this framework to float64 tolerance.

Skipped automatically when the reference checkout is unavailable.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")


def _import_reference():
    if not (REF / "gpmdm").is_dir():
        pytest.skip("reference checkout not available")
    if "torchtyping" not in sys.modules:
        tt = types.ModuleType("torchtyping")

        class _TT:
            def __getitem__(self, item):
                return object

        tt.TensorType = _TT()
        sys.modules["torchtyping"] = tt
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from gpmdm import GPMDM as RefGPMDM  # noqa

    return RefGPMDM


@pytest.fixture(scope="module")
def pair():
    """(reference model, our model) built on identical data + inits."""
    RefGPMDM = _import_reference()
    import torch

    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.data import synthetic

    tr, tl, te, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=18, D=6, seed=31
    )
    kw = dict(
        D=6, d=2, n_classes=2, dyn_target="full", dyn_back_step=1,
        y_lambdas_init=np.ones(6), y_lengthscales_init=np.ones(2),
        y_sigma_n_init=1e-2,
        x_lambdas_init=np.ones(2), x_lengthscales_init=np.ones(2),
        x_sigma_n_init=1e-2, x_lin_coeff_init=np.ones(3),
    )
    ref = RefGPMDM(**kw)
    ours = GPMDM(dtype="float64", **kw)
    for Y, c in zip(tr, tl):
        ref.add_data(np.asarray(Y, dtype=np.float64), c)
        ours.add_data(np.asarray(Y, dtype=np.float64), c)
    ref.init_X()
    ours.init_X()
    return ref, ours, te


def test_pca_init_matches_sklearn(pair):
    """Our numpy-SVD PCA init == the reference's sklearn PCA init
    (gpmdm.py:762-768), including the deterministic sign flip."""
    ref, ours, _ = pair
    np.testing.assert_allclose(
        np.asarray(ours.params.X),
        ref.X.detach().numpy(),
        rtol=1e-8, atol=1e-10,
    )


def test_kernels_match_reference(pair):
    ref, ours, _ = pair
    import torch

    rng = np.random.default_rng(0)
    A = rng.normal(size=(7, 2))
    B = rng.normal(size=(5, 2))
    At, Bt = torch.tensor(A), torch.tensor(B)
    np.testing.assert_allclose(
        np.asarray(ours.get_y_kernel(A, A, flg_noise=True)),
        ref.get_y_kernel(At, At, flg_noise=True).detach().numpy(),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ours.get_x_kernel(A, B, flg_noise=False)),
        ref.get_x_kernel(At, Bt, flg_noise=False).detach().numpy(),
        rtol=1e-12,
    )


def test_nll_matches_reference(pair):
    """Total MAP loss identical on the shared PCA init (the reference's
    masked-Gram factorization vs our block-diagonal one)."""
    ref, ours, _ = pair
    import torch

    Y = torch.tensor(ref.get_Y(), dtype=ref.dtype)
    # reference signature gpdm_loss(Y, N, M, balance=1): M is unused
    # (the balance-binding bug, SURVEY.md 2.4 #1) but required positional
    ref_loss = float(ref.gpdm_loss(Y, Y.shape[0], 1.0).detach())
    np.testing.assert_allclose(ours.gpdm_loss(), ref_loss, rtol=1e-9)


def test_adam_training_trajectory_matches(pair):
    """5 Adam steps produce the same loss trajectory (torch.optim.Adam and
    optax.adam implement the same update; reference train_adam at
    gpmdm.py:817-885)."""
    ref, ours, _ = pair
    ref_losses = [float(l) for l in ref.train_adam(num_opt_steps=5, lr=0.01)]
    our_losses = ours.train_adam(num_opt_steps=5, lr=0.01)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours.params.X), ref.X.detach().numpy(), rtol=1e-5, atol=1e-8
    )


def test_posterior_predictions_match(pair):
    """GP posterior maps agree after identical training (reference
    map_x_to_y :923, map_x_dynamics_for_class :1032)."""
    ref, ours, _ = pair
    import torch

    rng = np.random.default_rng(1)
    Xstar = rng.normal(size=(9, 2))
    Xt = torch.tensor(Xstar, dtype=ref.dtype)
    mean_r, var_r = ref.map_x_to_y(Xt)
    mean_o, var_o = ours.map_x_to_y(Xstar)
    np.testing.assert_allclose(np.asarray(mean_o), mean_r.detach().numpy(), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_o), var_r.detach().numpy(), rtol=1e-5, atol=1e-9)
    for c in range(2):
        mr, vr = ref.map_x_dynamics_for_class(Xt, c)
        mo, vo = ours.map_x_dynamics_for_class(Xstar, c)
        np.testing.assert_allclose(np.asarray(mo), mr.detach().numpy(), rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(vo), vr.detach().numpy(), rtol=1e-4, atol=1e-8)


def test_nmse_diagnostics_match_reference(pair):
    """The published NMSE diagnostics (BASELINE.md rows; reference
    get_latent_map_performance :1199, get_latent_map_performance_for_class
    :1241, get_dynamics_map_performance_for_class :1147) agree, including
    the floor-division quirk (``floored=True``)."""
    ref, ours, _ = pair

    _, _, _, nmse_r = ref.get_latent_map_performance()
    _, _, _, nmse_o = ours.get_latent_map_performance(floored=True)
    np.testing.assert_allclose(float(nmse_o), float(nmse_r), rtol=1e-9)

    for c in range(2):
        _, _, _, nr = ref.get_latent_map_performance_for_class(c)
        _, _, _, no = ours.get_latent_map_performance_for_class(c, floored=True)
        np.testing.assert_allclose(float(no), float(nr), rtol=1e-9)
        _, _, _, _, dr = ref.get_dynamics_map_performance_for_class(c)
        _, _, _, _, do = ours.get_dynamics_map_performance_for_class(
            c, floored=True
        )
        np.testing.assert_allclose(float(do), float(dr), rtol=1e-9)


def test_checkpoint_cross_load(pair, tmp_path):
    """A checkpoint written by the actual reference save() loads into our
    GPMDM with identical parameters and loss."""
    ref, ours, _ = pair
    from gpmdm_tpu import GPMDM

    p = tmp_path / "ref_model.pth"
    ref.save(str(p))
    imported = GPMDM.load_torch(p)
    np.testing.assert_allclose(
        np.asarray(imported.params.X), ref.X.detach().numpy(), rtol=1e-12
    )
    import torch

    Y = torch.tensor(ref.get_Y(), dtype=ref.dtype)
    ref_loss = float(ref.gpdm_loss(Y, Y.shape[0], 1.0).detach())
    np.testing.assert_allclose(imported.gpdm_loss(), ref_loss, rtol=1e-9)


def test_pf_weight_math_matches_reference(pair):
    """Deterministic PF stage parity: feed identical particle states to the
    reference's _update_weights (gpmdm_pf.py:170-204) and compare its
    per-particle log-likelihoods and normalized weights against our
    vectorized observation stage with compat_double_logdet=True."""
    import jax
    import jax.numpy as jnp
    import torch

    from gpmdm import GPMDM_PF as RefPF
    from gpmdm_tpu.filter import particle_filter as pf

    ref, ours, te = pair
    T = torch.tensor([[0.9, 0.1], [0.1, 0.9]], dtype=ref.dtype)
    rpf = RefPF(ref, T, num_particles=12)

    rng = np.random.default_rng(3)
    states = rng.normal(size=(12, 2))
    z = np.asarray(te[0][0], dtype=np.float64)

    rpf._particle_states = torch.tensor(states, dtype=ref.dtype)
    rpf._log_weights = torch.zeros(12, dtype=ref.dtype)
    rpf._update_weights(torch.tensor(z, dtype=ref.dtype))
    ref_ll = rpf._log_likelihoods.detach().numpy()
    ref_w = rpf._weights.detach().numpy()

    mean, var = ours.map_x_to_y(states)
    our_ll = np.asarray(
        pf.observation_log_lik(
            jnp.asarray(z), jnp.asarray(mean), jnp.asarray(var), ours.D,
            compat_double_logdet=True,
        )
    )
    np.testing.assert_allclose(our_ll, ref_ll, rtol=1e-6, atol=1e-8)
    our_lw = our_ll - np.max(our_ll)
    our_w = np.exp(our_lw) / np.exp(our_lw).sum()
    np.testing.assert_allclose(our_w, ref_w, rtol=1e-6, atol=1e-10)
