"""Back-constrained GPMDM (models/back_constrained.py): training, the
smooth inverse map, PF integration, save/load."""

import numpy as np
import pytest

from gpmdm_tpu import BCGPMDM, GPMDM, GPMDM_PF
from gpmdm_tpu.data import synthetic


@pytest.fixture(scope="module")
def bc_model():
    tr, tl, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=2, seq_len=25, D=8, seed=3
    )
    m = BCGPMDM(D=8, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    return m, te, tel


def test_init_matches_pca_through_constraint(bc_model):
    """W0 solves (K_b + ridge) W = X_pca, so the initial latents are the
    PCA init up to the ridge."""
    m, _, _ = bc_model
    ref = GPMDM(D=8, d=2, n_classes=2, dtype="float64")
    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=2, seq_len=25, D=8, seed=3
    )
    for Y, c in zip(tr, tl):
        ref.add_data(Y, c)
    ref.init_X()
    # close up to the solve ridge (1e-4), not exact
    np.testing.assert_allclose(
        np.asarray(m.params.X), np.asarray(ref.params.X), atol=0.02
    )
    assert m.config.back_constraint_ls > 0  # median heuristic fired


def test_training_decreases_loss_and_respects_constraint(bc_model):
    m, _, _ = bc_model
    import jax.numpy as jnp

    from gpmdm_tpu.models.back_constrained import back_kernel

    losses = m.train_adam(num_opt_steps=40, lr=0.02)
    assert losses[-1] < losses[0]
    # the materialized X satisfies X = K_b @ W exactly
    Y = jnp.asarray(m.get_Y(), dtype=m.dtype)
    Kb = back_kernel(Y, Y, m.config.back_constraint_ls, m.dtype)
    np.testing.assert_allclose(
        np.asarray(m.params.X), np.asarray(Kb @ m._W), rtol=1e-12
    )
    # gpdm_loss evaluates AFTER the final update (the loss history records
    # pre-update values), so it should sit at or below the last record
    assert m.gpdm_loss() <= losses[-1] + 1e-6 * abs(losses[-1])


def test_map_y_to_x_inverts_training_data(bc_model):
    """Projecting the training observations recovers the training latents
    (exact by construction: k(Y_i, Y) @ W = row i of K_b @ W = X_i)."""
    m, _, _ = bc_model
    X_proj = np.asarray(m.map_y_to_x(m.get_Y()))
    np.testing.assert_allclose(X_proj, np.asarray(m.params.X), rtol=1e-10)


def test_pf_classifies_with_bc_model(bc_model):
    m, te, tel = bc_model
    flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=100, seed=0)
    correct = total = 0
    for Z, label in zip(te, tel):
        flt.reset()
        pred = np.asarray(flt.run(np.asarray(Z)).most_likely_class)
        correct += (pred[5:] == label).sum()
        total += len(pred) - 5
    assert correct / total > 0.8, correct / total


def test_bc_save_load_roundtrip(bc_model, tmp_path):
    m, _, _ = bc_model
    p = tmp_path / "bc.npz"
    m.save(p)
    m2 = GPMDM.load(p)  # loader dispatches on the saved model_class
    assert type(m2).__name__ == "BCGPMDM"
    assert m2.config.back_constraint_ls == m.config.back_constraint_ls
    np.testing.assert_allclose(
        np.asarray(m2.params.X), np.asarray(m.params.X), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(m2._W), np.asarray(m._W), rtol=1e-12
    )
    np.testing.assert_allclose(m2.gpdm_loss(), m.gpdm_loss(), rtol=1e-6)


def test_bc_compressed_cache_persists(bc_model, tmp_path, monkeypatch):
    """BC load rematerializes X (W -> K_b @ W) BEFORE the persisted
    compressed cache is restored, so the cached factors stay consistent
    with the rebuilt params (utils/io.py ordering)."""
    from gpmdm_tpu.models import compressed
    from gpmdm_tpu.models.compressed import CompressedPosterior

    m, _, _ = bc_model
    cp = m.compressed_posterior(rank_y=8, rank_x=6)
    p = tmp_path / "bc_cache.npz"
    m.save(p)

    m2 = GPMDM.load(p)
    monkeypatch.setattr(
        compressed, "compress_host",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("compressed cache missed after BC load")),
    )
    cp2 = m2.compressed_posterior(rank_y=8, rank_x=6)
    assert isinstance(cp2, CompressedPosterior)
    np.testing.assert_array_equal(np.asarray(cp2.Uy), np.asarray(cp.Uy))
    monkeypatch.undo()
    # the factors agree with a fresh compression of the REMATERIALIZED
    # params (i.e. the cache is not stale vs the X rebuild)
    m2._precompute_kernel_inverses()
    fresh = m2.compressed_posterior(rank_y=8, rank_x=6)
    np.testing.assert_allclose(
        np.asarray(fresh.inv_mu_y), np.asarray(cp.inv_mu_y),
        rtol=1e-9, atol=1e-12,
    )
