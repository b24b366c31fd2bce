"""Sharding: padded-block NLL equivalence, sharded loss == single-device
loss, sharded training step, PF bank sharding.  Runs on the 8-virtual-CPU
mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu import GPMDM, PFConfig, TrainConfig
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.filter import particle_filter as pf
from gpmdm_tpu.models import core
from gpmdm_tpu.ops.layout import padded_class_indices
from gpmdm_tpu.parallel import (
    make_context,
    make_mesh,
    make_train_mesh,
    nll_sharded,
    pad_Y,
    pf_scan_bank_sharded,
    train_adam_sharded,
)


@pytest.fixture(scope="module")
def model():
    train_seqs, train_labels, _, _ = synthetic.make_dataset(
        n_classes=3, n_train_seqs=2, n_test_seqs=1, seq_len=20, D=9, seed=11
    )
    m = GPMDM(D=9, d=2, n_classes=3, dtype="float64")
    for Y, c in zip(train_seqs, train_labels):
        m.add_data(Y, c)
    m.init_X()
    return m


def test_padded_block_nll_matches_loop(model):
    """Batched identity-padded per-class NLL == the per-class loop."""
    m = model
    pads = padded_class_indices(m.layout, n_class_pad=4)  # one all-pad class
    terms = core.x_nll_padded_blocks(
        m.params,
        m.config,
        jnp.asarray(pads["idx_in"]),
        jnp.asarray(pads["idx_prev"]),
        jnp.asarray(pads["idx_out"]),
        jnp.asarray(pads["mask"]),
    )
    total_padded = jnp.sum(terms) - m.layout.Nx * 2.0 * jnp.sum(m.params.x_log_lambdas)
    want = core.x_neg_log_likelihood(m.params, m.config, m.layout)
    np.testing.assert_allclose(float(total_padded), float(want), rtol=1e-10)
    # the all-pad class contributes exactly zero
    np.testing.assert_allclose(float(terms[3]), 0.0, atol=1e-10)


def test_sharded_nll_matches_single_device(model):
    """EP x TP sharded loss == single-device loss (D=9 not divisible by tp,
    C=3 not divisible by ep: exercises both paddings)."""
    m = model
    mesh = make_train_mesh(8)  # ('ep', 'tp') = (2, 4)
    ctx = make_context(m.config, m.layout, mesh)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    got = nll_sharded(m.params, pad_Y(Y, ctx), ctx)
    want = core.nll(m.params, Y, m.config, m.layout)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_sharded_grad_matches_single_device(model):
    m = model
    mesh = make_train_mesh(8)
    ctx = make_context(m.config, m.layout, mesh)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    g_sh = jax.grad(lambda p: nll_sharded(p, pad_Y(Y, ctx), ctx))(m.params)
    g_ref = jax.grad(lambda p: core.nll(p, Y, m.config, m.layout))(m.params)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_sharded_training_decreases_loss(model):
    m = model
    mesh = make_train_mesh(8)
    Y = m.get_Y()
    params, _, losses = train_adam_sharded(
        m.params, Y, m.config, m.layout, mesh, TrainConfig(num_steps=10, lr=0.01)
    )
    losses = np.asarray(losses)
    assert losses[-1] < losses[0]
    assert np.isfinite(np.asarray(jax.tree.leaves(params)[0])).all()


def test_sharded_training_matches_single_device(model):
    """10 sharded Adam steps == 10 single-device Adam steps, bit-for-bit up
    to float64 roundoff."""
    from gpmdm_tpu.train.trainer import train_adam

    m = model
    mesh = make_train_mesh(8)
    Y = m.get_Y()
    tc = TrainConfig(num_steps=10, lr=0.01)
    p_sh, _, losses_sh = train_adam_sharded(m.params, Y, m.config, m.layout, mesh, tc)
    res = train_adam(m.params, Y, m.config, m.layout, tc)
    np.testing.assert_allclose(
        np.asarray(losses_sh), np.asarray(res.losses), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(p_sh.X), np.asarray(res.params.X), rtol=1e-7, atol=1e-9
    )


def test_pf_bank_sharded_matches_unsharded(model):
    m = model
    m.train_adam(num_opt_steps=20, lr=0.02)
    mesh = make_mesh({"dp": 8})
    pfc = PFConfig(num_particles=16)
    B, T = 8, 5
    log_T = jnp.log(jnp.full((3, 3), 1.0 / 3.0, dtype=jnp.float64))
    states = pf.pf_init_bank(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc, B
    )
    Z = jnp.stack(
        [jnp.asarray(synthetic.make_cycle(T, c % 3, 9), dtype=jnp.float64) for c in range(B)]
    )
    _, outs_sharded = pf_scan_bank_sharded(
        states, Z, m.posterior, m.params, log_T, m.config, pfc, mesh
    )
    _, outs_ref = pf.pf_scan_bank(states, Z, m.posterior, m.params, log_T, m.config, pfc)
    np.testing.assert_allclose(
        np.asarray(outs_sharded.class_probs), np.asarray(outs_ref.class_probs), rtol=1e-8
    )


def test_pf_bank_sharded_masked_matches_unsharded(model):
    """The multi-chip banked-evaluation path (padded sequences + prefix
    masks, bank axis dp-sharded) equals the unsharded masked bank."""
    from gpmdm_tpu.parallel import pf_scan_bank_sharded_masked

    m = model
    m.train_adam(num_opt_steps=20, lr=0.02)
    mesh = make_mesh({"dp": 8})
    pfc = PFConfig(num_particles=16)
    B, T_pad = 8, 8
    log_T = jnp.log(jnp.full((3, 3), 1.0 / 3.0, dtype=jnp.float64))
    states = pf.pf_init_bank(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(1), pfc, B
    )
    lens = [3 + (c % 5) for c in range(B)]  # ragged 3..7
    Z = np.zeros((B, T_pad, 9))
    valid = np.zeros((B, T_pad), dtype=bool)
    for i in range(B):
        Z[i, : lens[i]] = np.asarray(synthetic.make_cycle(lens[i], i % 3, 9))
        valid[i, : lens[i]] = True
    Z = jnp.asarray(Z, dtype=jnp.float64)
    valid_j = jnp.asarray(valid)
    _, outs_sharded = pf_scan_bank_sharded_masked(
        states, Z, valid_j, m.posterior, m.params, log_T, m.config, pfc, mesh
    )
    _, outs_ref = pf.pf_scan_bank_masked(
        states, Z, valid_j, m.posterior, m.params, log_T, m.config, pfc
    )
    np.testing.assert_allclose(
        np.asarray(outs_sharded.class_probs),
        np.asarray(outs_ref.class_probs),
        rtol=1e-8,
    )


def test_rowsharded_predict_matches_single_device():
    """Sequence-parallel (row-sharded) observation posterior == single-device
    predict_y, exactly (one all-gather + psum on an 8-device mesh)."""
    from gpmdm_tpu.parallel.sp_predict import predict_y_rowsharded

    # Ny divisible by 8: 2 classes x 2 seqs x 20 frames = 80
    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=20, D=7, seed=23
    )
    m = GPMDM(D=7, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    mesh = make_mesh({"sp": 8})
    Xstar = jnp.asarray(np.random.default_rng(0).normal(size=(13, 2)))
    mean_sh, var_sh = predict_y_rowsharded(
        m.posterior, m.params, Xstar, m.config, mesh
    )
    mean, var = core.predict_y(m.posterior, m.params, Xstar, m.config)
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var), rtol=1e-8)

    # divisibility guard
    import pytest as _pytest

    bad_mesh = make_mesh({"sp": 8})
    m2 = GPMDM(D=7, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, tl):
        m2.add_data(Y[:19], c)  # Ny = 76, not divisible by 8
    m2.init_X()
    with _pytest.raises(ValueError):
        predict_y_rowsharded(m2.posterior, m2.params, Xstar, m2.config, bad_mesh)


def test_rowsharded_dynamics_matches_single_device():
    """Row-sharded per-class dynamics posterior == single-device
    predict_x_all_classes (pair axis sharded over 8 devices)."""
    from gpmdm_tpu.parallel.sp_predict import predict_x_all_classes_rowsharded

    # n_max divisible by 8: seq_len 17 -> 16 pairs per seq, 2 seqs -> 32
    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=17, D=7, seed=29
    )
    m = GPMDM(D=7, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    assert m.layout.n_max % 8 == 0
    mesh = make_mesh({"sp": 8})
    Xstar = jnp.asarray(np.random.default_rng(2).normal(size=(11, 2)))
    mean_sh, var_sh = predict_x_all_classes_rowsharded(
        m.posterior, m.params, Xstar, m.config, mesh
    )
    mean, var = core.predict_x_all_classes(m.posterior, m.params, Xstar, m.config)
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var), rtol=1e-8, atol=1e-12)


def test_make_train_mesh_shape_aware():
    """ep = gcd(n_classes, n_devices): 8 classes on 8 devices get a pure
    expert mesh; odd class counts fall back gracefully; the default
    heuristic is unchanged."""
    mesh = make_train_mesh(8, n_classes=8)
    assert mesh.shape == {"ep": 8, "tp": 1}
    mesh = make_train_mesh(8, n_classes=4)
    assert mesh.shape == {"ep": 4, "tp": 2}
    mesh = make_train_mesh(8, n_classes=3)
    assert mesh.shape == {"ep": 1, "tp": 8}
    mesh = make_train_mesh(8, n_classes=6)
    assert mesh.shape == {"ep": 2, "tp": 4}
    mesh = make_train_mesh(8)  # no class info: legacy (2, 4)
    assert mesh.shape == {"ep": 2, "tp": 4}


def test_sharded_nll_matches_on_class_aware_mesh(model):
    """The gcd mesh (ep=1 for C=3 on 8 devices) still reproduces the
    single-device loss; so does a pure-ep mesh when classes divide devices."""
    m = model
    mesh = make_train_mesh(8, n_classes=m.config.n_classes)  # ep=1, tp=8
    ctx = make_context(m.config, m.layout, mesh)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    got = nll_sharded(m.params, pad_Y(Y, ctx), ctx)
    want = core.nll(m.params, Y, m.config, m.layout)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)

    mesh = make_mesh({"ep": 8, "tp": 1})  # pure expert mesh, C=3 padded to 8
    ctx = make_context(m.config, m.layout, mesh)
    got = nll_sharded(m.params, pad_Y(Y, ctx), ctx)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_sharded_nll_matches_with_hyperprior(model):
    """Sharded loss == single-device loss when the log-hyperprior is ON
    (uniform and per-group weights, both loss variants): a model trained
    through the sharded trainer must see the SAME regularizer as
    single-device training (ADVICE r4: the penalty was silently dropped)."""
    import dataclasses

    m = model
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    for cfg in (
        dataclasses.replace(m.config, hyperprior_weight=37.0),
        dataclasses.replace(
            m.config,
            hyperprior_weights=(1.0, 2.0, 300.0, 4.0, 5.0, 600.0, 7.0),
        ),
    ):
        want = core.nll(m.params, Y, cfg, m.layout)
        pen = core.hyperprior_penalty(m.params, cfg)
        assert float(pen) > 0.0  # the term must actually bind
        for shard_chol in (False, True):
            mesh = make_train_mesh(8)  # ('ep', 'tp') = (2, 4); Ny=120 % 4 == 0
            ctx = make_context(cfg, m.layout, mesh, shard_chol=shard_chol)
            got = nll_sharded(m.params, pad_Y(Y, ctx), ctx)
            np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_bc_sharded_training_matches_single_device():
    """The back-constrained family trains on the mesh via the latent_map
    hook (X = K_b @ W inside the sharded loss): losses match the
    single-device BC trainer."""
    import dataclasses

    from gpmdm_tpu.models import back_constrained as bc
    from gpmdm_tpu.models.back_constrained import BCGPMDM
    from gpmdm_tpu.train.trainer import train_adam

    train_seqs, train_labels, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=20, D=9, seed=12
    )
    m = BCGPMDM(D=9, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(train_seqs, train_labels):
        m.add_data(Y, c)
    m.init_X()
    Y = m.get_Y()
    Kb = bc.back_kernel(Y, Y, m.config.back_constraint_ls, jnp.float64)
    latent_map = lambda p: dataclasses.replace(  # noqa: E731
        p, X=jnp.matmul(Kb, p.X, precision=jax.lax.Precision.HIGHEST)
    )
    params_w = dataclasses.replace(m.params, X=m._W)
    mesh = make_train_mesh(8, n_classes=2)
    tc = TrainConfig(num_steps=5, lr=0.01)
    p_sh, _, losses_sh = train_adam_sharded(
        params_w, Y, m.config, m.layout, mesh, tc, latent_map=latent_map
    )
    res = train_adam(
        params_w, Y, m.config, m.layout, tc, kind="bc"
    )
    np.testing.assert_allclose(
        np.asarray(losses_sh), np.asarray(res.losses), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(p_sh.X), np.asarray(res.params.X), rtol=1e-7, atol=1e-9
    )


def test_collective_counts_pinned(model):
    """Static collective budget of the sharded programs (parallel/inspect).

    The pins encode the DESIGN of the distribution layer (SURVEY §5
    "distributed communication backend"; docs/BENCHMARKS.md "Collective
    budget"): an extra all-gather/psum appearing in a traced program is a
    regression even when the virtual-mesh numerics still pass, because on
    a real slice it turns into ICI traffic per step.  dryrun_multichip
    asserts the same tables, so the driver catches it too.
    """
    import optax

    from gpmdm_tpu.parallel import count_collectives
    from gpmdm_tpu.parallel import sharded as SH

    m = model
    opt = optax.adam(0.01)
    mask = jax.tree.map(jnp.ones_like, m.params)
    for ep, tp in ((4, 2), (2, 4)):
        mesh = make_mesh({"ep": ep, "tp": tp})
        # replicated-Cholesky step: 3 forward psums (y-trace and log|W|
        # over tp, x-blocks over ep) + their grad transposes and
        # shard_map replication sums = 11 psums, no gathers, for EVERY
        # mesh shape.  dist-chol unrolls over the tp block count: the
        # forward factorization all-gathers one column panel per block
        # (tp) + 3 backward gathers (Z, Y, alpha); the two distributed
        # triangular solves psum once per block (2*tp) + 8 fixed psums.
        want = {
            False: {"psum": 11},
            True: {"psum": 2 * tp + 8, "all_gather": tp + 3},
        }
        for sc in (False, True):
            ctx = SH.make_context(m.config, m.layout, mesh, shard_chol=sc)
            Yp = SH.pad_Y(jnp.asarray(m.get_Y(), dtype=m.dtype), ctx)
            step = SH.make_sharded_update_step(ctx, opt, 1.0, mask)
            got = count_collectives(
                lambda c_, x: step(c_, x),
                (m.params, opt.init(m.params), Yp),
                None,
            )
            assert got == want[sc], (ep, tp, sc, got)


def test_pf_bank_sharded_collective_free(model):
    """The dp PF bank scan must trace to ZERO collectives — banks are
    independent by construction; any psum means cross-bank sync."""
    from gpmdm_tpu.parallel import count_collectives

    m = model
    dp_mesh = make_mesh({"dp": 8})
    pfc = PFConfig(num_particles=16)
    C = m.config.n_classes
    log_T = jnp.log(jnp.full((C, C), 1.0 / C, dtype=m.dtype))
    states = pf.pf_init_bank(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(1), pfc, 8
    )
    Z = jnp.zeros((8, 3, m.D), dtype=m.dtype)
    got = count_collectives(
        lambda s, z: pf_scan_bank_sharded(
            s, z, m.posterior, m.params, log_T, m.config, pfc, dp_mesh
        ),
        states,
        Z,
    )
    assert got == {}, got
