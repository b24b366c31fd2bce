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


def test_pf_step_pallas_matches_xla(_interpret):
    """pf_step with the fused Pallas observation stage == the XLA path."""
    from gpmdm_tpu import GPMDM, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.filter import particle_filter as pf

    tr, tl, te, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=20, D=6, seed=2
    )
    m = GPMDM(D=6, d=2, n_classes=2, dtype="float32")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], dtype=jnp.float32))
    z = jnp.asarray(te[0][0], dtype=jnp.float32)

    outs = {}
    for mode in ("off", "on"):
        pfc = PFConfig(num_particles=40, precision="highest", pallas=mode)
        s = pf.pf_init(m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc)
        _, out = pf.pf_step(s, z, m.posterior, m.params, log_T, m.config, pfc)
        outs[mode] = out
    np.testing.assert_allclose(
        np.asarray(outs["on"].class_probs),
        np.asarray(outs["off"].class_probs),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outs["on"].state_mean),
        np.asarray(outs["off"].state_mean),
        rtol=1e-3, atol=1e-4,
    )
