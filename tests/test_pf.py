"""Particle filter: stage correctness, resampling properties, end-to-end
classification on synthetic data."""

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu import GPMDM, GPMDM_PF, PFConfig
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.filter import particle_filter as pf
from gpmdm_tpu.models import core


@pytest.fixture(scope="module")
def trained_model():
    train_seqs, train_labels, test_seqs, test_labels = synthetic.make_dataset(
        n_classes=2, n_train_seqs=3, n_test_seqs=3, seq_len=40, D=10, seed=7
    )
    m = GPMDM(D=10, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(train_seqs, train_labels):
        m.add_data(Y, c)
    m.init_X()
    m.train_adam(num_opt_steps=120, lr=0.02)
    return m, test_seqs, test_labels


def test_init_classes_split():
    assert list(pf._init_classes(10, 2)) == [0] * 5 + [1] * 5
    assert list(pf._init_classes(7, 3)) == [0, 0, 0, 1, 1, 2, 2]


def test_pf_init_samples_from_own_class(trained_model):
    m, _, _ = trained_model
    state = pf.pf_init(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), PFConfig(num_particles=50)
    )
    X = np.asarray(m.params.X)
    offs = m.layout.y_class_offsets
    for p in range(50):
        c = int(state.c[p])
        block = X[offs[c] : offs[c + 1]]
        assert any(np.allclose(np.asarray(state.x[p]), row) for row in block)


def test_observation_log_lik_matches_scipy():
    from scipy.stats import norm

    rng = np.random.default_rng(0)
    P, D = 5, 4
    z = rng.normal(size=(D,))
    mean = rng.normal(size=(P, D))
    var = rng.uniform(0.5, 2.0, size=(P, D))
    got = np.asarray(
        pf.observation_log_lik(
            jnp.asarray(z), jnp.asarray(mean), jnp.asarray(var), D, False
        )
    )
    want = np.array(
        [norm.logpdf(z, mean[i], np.sqrt(var[i])).sum() for i in range(P)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # compat mode double-counts the log-determinant (reference
    # gpmdm_pf.py:189-191): difference is exactly -0.5*sum(log var)
    got_compat = np.asarray(
        pf.observation_log_lik(
            jnp.asarray(z), jnp.asarray(mean), jnp.asarray(var), D, True
        )
    )
    np.testing.assert_allclose(
        got_compat, want - 0.5 * np.log(var).sum(axis=1), rtol=1e-10
    )


def test_systematic_resample_is_unbiased():
    """Expected offspring count of particle i is P * w_i (within 1 for the
    systematic scheme, exactly)."""
    key = jax.random.PRNGKey(0)
    log_w = jnp.log(jnp.asarray([0.5, 0.25, 0.125, 0.125]))
    counts = np.zeros(4)
    for s in range(200):
        idx = np.asarray(pf.systematic_resample_indices(jax.random.fold_in(key, s), log_w))
        counts += np.bincount(idx, minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.5, 0.25, 0.125, 0.125], atol=0.02)
    # systematic: per-draw offspring within floor/ceil of expectation
    idx = np.asarray(pf.systematic_resample_indices(key, log_w))
    n = np.bincount(idx, minlength=4)
    for i, w in enumerate([0.5, 0.25, 0.125, 0.125]):
        assert np.floor(4 * w) <= n[i] <= np.ceil(4 * w)


def test_systematic_resample_mxu_rank_matches_searchsorted():
    """The MXU 0/1-matmul rank lowering must return the exact searchsorted
    indices (same u, same cdf) — including at P not a multiple of the
    tile width and P smaller than one tile."""
    key = jax.random.PRNGKey(3)
    for P in (37, pf._RANK_TILE_K, 1000, 2 * pf._RANK_TILE_K + 13, 12388):
        for seed in range(3):
            k = jax.random.fold_in(key, 1000 * P + seed)
            kw, ku = jax.random.split(k)
            log_w = 3.0 * jax.random.normal(kw, (P,), dtype=jnp.float64)
            got = np.asarray(pf.systematic_resample_indices(ku, log_w))
            # ground truth: same draw, plain searchsorted
            w = np.asarray(jax.nn.softmax(log_w))
            cum = np.cumsum(w)
            u = float(jax.random.uniform(ku, (), dtype=log_w.dtype))
            want = np.searchsorted(cum, (u + np.arange(P)) / P).clip(0, P - 1)
            np.testing.assert_array_equal(got, want)


def test_multinomial_resample_distribution():
    key = jax.random.PRNGKey(1)
    log_w = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    idx = np.asarray(pf.multinomial_resample_indices(key, jnp.tile(log_w, 1)))
    assert idx.shape == (3,)
    big = np.asarray(
        jax.random.categorical(key, jnp.log(jnp.asarray([0.7, 0.2, 0.1])), shape=(20000,))
    )
    freq = np.bincount(big, minlength=3) / 20000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.02)


def test_step_and_scan_agree(trained_model):
    """One lax.scan over T frames == T sequential pf_step calls."""
    m, test_seqs, _ = trained_model
    Z = jnp.asarray(test_seqs[0][:8], dtype=jnp.float64)
    pfc = PFConfig(num_particles=30)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    s0 = pf.pf_init(m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(5), pfc)

    s = s0
    step_probs = []
    for t in range(8):
        s, out = pf.pf_step(s, Z[t], m.posterior, m.params, log_T, m.config, pfc)
        step_probs.append(np.asarray(out.class_probs))

    _, outs = pf.pf_scan(s0, Z, m.posterior, m.params, log_T, m.config, pfc)
    # atol floors out denormal-magnitude class probs (~1e-100): the scan
    # and per-step jits fuse differently, and a 1e-4 RELATIVE difference
    # on a probability that small is numerically meaningless
    np.testing.assert_allclose(
        np.asarray(outs.class_probs), np.stack(step_probs), rtol=1e-8,
        atol=1e-30,
    )


def test_step_and_scan_agree_above_pregen_gate(trained_model):
    """Above _PREGEN_MIN_P pf_scan pre-generates its randomness outside
    the scan; the stream must still be bit-identical to sequential
    pf_step calls (which draw in-step)."""
    m, test_seqs, _ = trained_model
    Z = jnp.asarray(test_seqs[0][:3], dtype=jnp.float64)
    P = pf._PREGEN_MIN_P + 8
    pfc = PFConfig(num_particles=P)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    s0 = pf.pf_init(m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(7), pfc)

    s = s0
    step_probs, step_means, step_lls = [], [], []
    for t in range(3):
        s, out = pf.pf_step(s, Z[t], m.posterior, m.params, log_T, m.config, pfc)
        step_probs.append(np.asarray(out.class_probs))
        step_means.append(np.asarray(out.state_mean))
        step_lls.append(np.asarray(out.log_likelihood))

    _, outs = pf.pf_scan(s0, Z, m.posterior, m.params, log_T, m.config, pfc)
    # What is pinned BITWISE here is the RNG stream: the key chain (below)
    # and _pregen_noise == the sequential split chain
    # (test_pregen_noise_matches_sequential_draws).  The VALUES cannot be
    # pinned to f64 roundoff: the exact-GP predictive variance is a
    # catastrophic cancellation (diag - quad with diag ~= quad; var floor
    # ~4e-7 on this model) and two XLA compilations of the same f64 math
    # (inside vs outside lax.scan) legitimately reassociate it ~2%
    # RELATIVE at the floor (measured: tools/../round-5 bisect — x_new
    # jitters ~3e-5 absolute through sqrt(var)*eps, state_mean ~1e-6,
    # plus knife-edge resample-index flips worth one particle's weight).
    # The tolerances below are calibrated to that mechanism and still
    # catch a wrong stream (which shifts these readouts by O(0.1-1)).
    np.testing.assert_allclose(
        np.asarray(outs.class_probs), np.stack(step_probs),
        rtol=0.0, atol=2.0 / pfc.num_particles,
    )
    np.testing.assert_allclose(
        np.asarray(outs.state_mean), np.stack(step_means),
        rtol=0.0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outs.log_likelihood), np.stack(step_lls),
        rtol=1e-2, atol=0.0,
    )
    # the final key must match the sequential chain too
    final_state, _ = pf.pf_scan(s0, Z, m.posterior, m.params, log_T, m.config, pfc)
    np.testing.assert_array_equal(np.asarray(s.key), np.asarray(final_state.key))


def test_pregen_noise_matches_sequential_draws():
    """The hoisted noise (_pregen_noise) is BIT-IDENTICAL to what T
    sequential pf_step calls draw from the same key — the invariant that
    lets pf_scan pre-generate randomness outside the scan.  This is the
    bitwise half of test_step_and_scan_agree_above_pregen_gate (whose
    value comparisons are tolerance-bound by variance-cancellation
    reassociation, not by the stream)."""
    key0 = jax.random.PRNGKey(7)
    T, P, d = 3, 64, 2
    dt = jnp.float64
    noise = pf._pregen_noise(key0, T, P, d, dt, dt)
    k = key0
    for t in range(T):
        # the exact split pf_step performs in-step (noise=None branch)
        k2, kt, kd, kr = jax.random.split(k, 4)
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(noise.next_key[t]))
        np.testing.assert_array_equal(np.asarray(kr), np.asarray(noise.k_res[t]))
        np.testing.assert_array_equal(
            np.asarray(jax.random.uniform(kt, (P,), dtype=dt)),
            np.asarray(noise.u_trans[t]),
        )
        np.testing.assert_array_equal(
            np.asarray(jax.random.normal(kd, (P, d), dtype=dt)),
            np.asarray(noise.eps_dyn[t]),
        )
        k = k2


def test_bank_matches_single(trained_model):
    m, test_seqs, _ = trained_model
    Z = jnp.asarray(test_seqs[0][:6], dtype=jnp.float64)
    pfc = PFConfig(num_particles=20)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    states = pf.pf_init_bank(m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(2), pfc, 3)
    Zb = jnp.stack([Z, Z, Z])
    _, outs = pf.pf_scan_bank(states, Zb, m.posterior, m.params, log_T, m.config, pfc)
    assert outs.class_probs.shape == (3, 6, 2)
    # bank 0 must equal a single run with the same key
    s0 = jax.tree.map(lambda a: a[0], states)
    _, single = pf.pf_scan(s0, Z, m.posterior, m.params, log_T, m.config, pfc)
    np.testing.assert_allclose(
        np.asarray(outs.class_probs[0]), np.asarray(single.class_probs), rtol=1e-8
    )


def test_end_to_end_classification(trained_model):
    """The filter must classify held-out synthetic sequences well (the
    reference achieves >0.9 frame F1 on CMU walk/run; synthetic cycles are
    easier)."""
    m, test_seqs, test_labels = trained_model
    T = [[0.9, 0.1], [0.1, 0.9]]
    flt = GPMDM_PF(m, T, num_particles=100, seed=0)
    correct = total = 0
    for Z, label in zip(test_seqs, test_labels):
        flt.reset()
        outs = flt.run(Z)
        pred = np.asarray(outs.most_likely_class)
        # skip burn-in frames
        correct += (pred[5:] == label).sum()
        total += len(pred) - 5
    acc = correct / total
    assert acc > 0.9, f"frame accuracy {acc:.3f}"


def test_update_api_matches_run(trained_model):
    m, test_seqs, _ = trained_model
    T = [[0.9, 0.1], [0.1, 0.9]]
    flt = GPMDM_PF(m, T, num_particles=25, seed=3)
    outs_run = flt.run(test_seqs[0][:5])
    flt2 = GPMDM_PF(m, T, num_particles=25, seed=3)
    probs = []
    for t in range(5):
        out = flt2.update(test_seqs[0][t])
        probs.append(np.asarray(out.class_probs))
    np.testing.assert_allclose(np.asarray(outs_run.class_probs), np.stack(probs), rtol=1e-8)
    # readout API
    assert flt2.get_most_likely_class() in (0, 1)
    assert np.isfinite(flt2.log_likelihood())
    assert flt2.current_state_mean().shape == (m.d,)


def test_reference_compat_flags(trained_model):
    m, test_seqs, _ = trained_model
    T = [[0.9, 0.1], [0.1, 0.9]]
    flt = GPMDM_PF(
        m,
        T,
        num_particles=30,
        config=PFConfig(resampling="multinomial", compat_double_logdet=True),
        seed=0,
    )
    outs = flt.run(test_seqs[0][:5])
    assert np.isfinite(np.asarray(outs.class_probs)).all()


def test_dead_particle_guard(trained_model):
    """A particle with a non-finite state must get zero weight (not poison
    the normalization with NaN) and be replaced at resampling."""
    m, test_seqs, _ = trained_model
    pfc = PFConfig(num_particles=20)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    s = pf.pf_init(m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc)
    # poison particle 0
    s = pf.PFState(
        x=s.x.at[0].set(jnp.inf),
        x_prev=s.x_prev,
        c=s.c,
        log_w=s.log_w,
        log_lik=s.log_lik,
        key=s.key,
    )
    z = jnp.asarray(test_seqs[0][0], dtype=jnp.float64)
    s2, out = pf.pf_step(s, z, m.posterior, m.params, log_T, m.config, pfc)
    assert np.isfinite(np.asarray(out.class_probs)).all()
    assert np.isfinite(np.asarray(out.state_mean)).all()
    # resampled states are all finite again (dead particle replaced)
    assert np.isfinite(np.asarray(s2.x)).all()


def test_all_dead_particles_fallback(trained_model):
    """If every particle dies in one frame (all non-finite states), the
    filter must fall back to uniform weights instead of emitting NaN."""
    m, test_seqs, _ = trained_model
    pfc = PFConfig(num_particles=12)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    s = pf.pf_init(m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(0), pfc)
    s = pf.PFState(
        x=jnp.full_like(s.x, jnp.inf),
        x_prev=s.x_prev,
        c=s.c,
        log_w=s.log_w,
        log_lik=s.log_lik,
        key=s.key,
    )
    z = jnp.asarray(test_seqs[0][0], dtype=jnp.float64)
    s2, out = pf.pf_step(s, z, m.posterior, m.params, log_T, m.config, pfc)
    assert np.isfinite(np.asarray(out.class_probs)).all()
    assert np.isfinite(np.asarray(s2.log_w)).all()


def test_ess_threshold_resampling(trained_model):
    """ESS-triggered resampling: classification quality holds, weights
    accumulate across skipped-resample frames, and config validation
    rejects threshold<1 without weight accumulation."""
    m, test_seqs, test_labels = trained_model
    with pytest.raises(ValueError):
        PFConfig(resample_threshold=0.5)  # needs accumulate_weights
    pfc = PFConfig(num_particles=100, resample_threshold=0.5, accumulate_weights=True)
    T = [[0.9, 0.1], [0.1, 0.9]]
    flt = GPMDM_PF(m, T, num_particles=100, config=pfc, seed=0)
    correct = total = 0
    for Z, label in zip(test_seqs, test_labels):
        flt.reset()
        outs = flt.run(Z)
        pred = np.asarray(outs.most_likely_class)
        correct += (pred[5:] == label).sum()
        total += len(pred) - 5
    assert correct / total > 0.85, correct / total


@pytest.mark.parametrize("dyn_target,back_step", [("delta", 1), ("full", 2), ("delta", 2)])
def test_pf_nondefault_dynamics_modes(dyn_target, back_step):
    """The reference PF hard-codes full/back_step=1 (gpmdm_pf.py:153-168);
    ours supports all four (target, back_step) modes end-to-end."""
    tr, tl, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=2, seq_len=30, D=8, seed=17
    )
    from gpmdm_tpu import GPMDM

    m = GPMDM(D=8, d=2, n_classes=2, dtype="float64",
              dyn_target=dyn_target, dyn_back_step=back_step)
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    m.train_adam(num_opt_steps=120, lr=0.02)
    T = [[0.9, 0.1], [0.1, 0.9]]
    flt = GPMDM_PF(m, T, num_particles=120, seed=0)
    correct = total = 0
    for Z, label in zip(te, tel):
        flt.reset()
        outs = flt.run(Z)
        assert np.isfinite(np.asarray(outs.class_probs)).all()
        pred = np.asarray(outs.most_likely_class)
        correct += (pred[5:] == label).sum()
        total += len(pred) - 5
    assert correct / total > 0.7, (dyn_target, back_step, correct / total)


def test_packed_gather_custom_vmap_matches_loop():
    """The bank-aware flat-gather batching rule produces exactly the
    per-bank gathers it replaces, for every in_batched combination."""
    rs = np.random.RandomState(0)
    B, P, W = 3, 17, 5
    packed = jnp.asarray(rs.randn(B, P, W))
    idx = jnp.asarray(np.sort(rs.randint(0, P, size=(B, P)), axis=1).astype(np.int32))
    # both batched
    got = jax.vmap(pf._packed_gather)(packed, idx)
    want = jnp.stack([packed[b][idx[b]] for b in range(B)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # only indices batched (shared particle array)
    got2 = jax.vmap(pf._packed_gather, in_axes=(None, 0))(packed[0], idx)
    want2 = jnp.stack([packed[0][idx[b]] for b in range(B)])
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))
    # only particles batched (shared indices)
    got3 = jax.vmap(pf._packed_gather, in_axes=(0, None))(packed, idx[0])
    want3 = jnp.stack([packed[b][idx[0]] for b in range(B)])
    np.testing.assert_array_equal(np.asarray(got3), np.asarray(want3))
    # unbatched == plain gather
    np.testing.assert_array_equal(
        np.asarray(pf._packed_gather(packed[0], idx[0])),
        np.asarray(packed[0][idx[0]]),
    )


def test_unsafe_exact_warning():
    """Deploying a large-Ny f32 exact posterior at default precision warns
    (the measured Ny=5120 accuracy collapse); f64, small-N, compressed,
    and 'highest'-precision configs stay silent."""
    import warnings

    import dataclasses as dc

    from gpmdm_tpu.models import compressed as comp

    # minimal fake exact posterior: only X's shape/dtype are inspected
    small = jnp.zeros((100, 2), dtype=jnp.float32)
    big = jnp.zeros((5000, 2), dtype=jnp.float32)
    big64 = jnp.zeros((5000, 2), dtype=jnp.float64)

    def fake_post(X):
        kw = {f.name: X for f in dc.fields(core.Posterior)}
        return core.Posterior(**kw)

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        pf.warn_if_unsafe_exact(fake_post(small), PFConfig())
        pf.warn_if_unsafe_exact(fake_post(big64), PFConfig())
        pf.warn_if_unsafe_exact(fake_post(big), PFConfig(quad_precision="highest"))
        pf.warn_if_unsafe_exact(fake_post(big), PFConfig(precision="highest"))
        kw = {f.name: big for f in dc.fields(comp.CompressedPosterior)}
        pf.warn_if_unsafe_exact(comp.CompressedPosterior(**kw), PFConfig())
    with pytest.warns(UserWarning, match="compressed_posterior"):
        pf.warn_if_unsafe_exact(fake_post(big), PFConfig())
    # the EFFECTIVE quad precision is quad_precision or precision:
    # (highest, high) runs the quad at the unsafe level and must warn
    with pytest.warns(UserWarning, match="compressed_posterior"):
        pf.warn_if_unsafe_exact(
            fake_post(big),
            PFConfig(precision="highest", quad_precision="high"),
        )


def test_bank_flat_matches_vmap(trained_model):
    """The flat-bank formulation (one P=B*Pb filter, bank-blocked glue —
    round-4 VERDICT #4) must match the vmap bank: same per-bank RNG
    chains, so resample draws are bit-identical; outputs agree to matmul
    reassociation noise (the flat GP einsums lose the bank batch axis),
    bounded by one particle's weight at resampling knife-edges."""
    m, test_seqs, _ = trained_model
    pfc = PFConfig(num_particles=24)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    states = pf.pf_init_bank(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(5), pfc, 3
    )
    Zb = jnp.stack(
        [jnp.asarray(s[:6], dtype=jnp.float64) for s in test_seqs[:3]]
    )
    # fuse_mean_quad pinned 'off' on BOTH arms: the flat path follows the
    # single-filter 'auto' policy (fused at C<=2) while the vmap path
    # forces 'off' — a policy difference that perturbs weights at
    # reassociation level and can flip one knife-edge resample index.
    # With the same grouping the two paths are numerically tight.
    fv, ov = pf.pf_scan_bank(
        states, Zb, m.posterior, m.params, log_T, m.config,
        dataclasses.replace(pfc, bank_impl="vmap", fuse_mean_quad="off"),
    )
    ff, of = pf.pf_scan_bank(
        states, Zb, m.posterior, m.params, log_T, m.config,
        dataclasses.replace(pfc, bank_impl="flat", fuse_mean_quad="off"),
    )
    np.testing.assert_allclose(
        np.asarray(of.class_probs), np.asarray(ov.class_probs),
        rtol=0.0, atol=2.0 / pfc.num_particles,
    )
    np.testing.assert_allclose(
        np.asarray(of.state_mean), np.asarray(ov.state_mean),
        rtol=1e-6, atol=1e-8,
    )
    # final keys advance identically (per-bank chains preserved)
    np.testing.assert_array_equal(np.asarray(ff.key), np.asarray(fv.key))
    assert ff.x.shape == fv.x.shape == states.x.shape


def test_bank_flat_masked_matches_vmap(trained_model):
    """Masked flat bank == masked vmap bank on ragged prefix trials, and
    masked frames freeze the banked state exactly."""
    m, test_seqs, _ = trained_model
    pfc = PFConfig(num_particles=24)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    B, T_pad = 3, 6
    lens = [6, 4, 2]
    states = pf.pf_init_bank(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(6), pfc, B
    )
    Zb = jnp.stack(
        [jnp.asarray(s[:T_pad], dtype=jnp.float64) for s in test_seqs[:B]]
    )
    valid = jnp.asarray(np.arange(T_pad)[None, :] < np.asarray(lens)[:, None])
    fv, ov = pf.pf_scan_bank_masked(
        states, Zb, valid, m.posterior, m.params, log_T, m.config,
        dataclasses.replace(pfc, bank_impl="vmap", fuse_mean_quad="off"),
    )
    ff, of = pf.pf_scan_bank_masked(
        states, Zb, valid, m.posterior, m.params, log_T, m.config,
        dataclasses.replace(pfc, bank_impl="flat", fuse_mean_quad="off"),
    )
    for b, L in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(of.class_probs[b, :L]),
            np.asarray(ov.class_probs[b, :L]),
            rtol=0.0, atol=2.0 / pfc.num_particles,
        )
    np.testing.assert_array_equal(np.asarray(ff.key), np.asarray(fv.key))
    # frozen final state on the short banks matches the vmap path
    np.testing.assert_allclose(
        np.asarray(ff.x[2]), np.asarray(fv.x[2]), rtol=1e-6, atol=1e-8
    )


@pytest.mark.parametrize("backend", ["sparse", "compressed"])
def test_bank_flat_matches_vmap_other_backends(trained_model, backend):
    """Flat == vmap through the sparse (SGPR) and compressed posterior
    backends too (the filter dispatches on posterior type)."""
    m, test_seqs, _ = trained_model
    if backend == "sparse":
        post = m.sparsified_posterior(16)
    else:
        post = m.compressed_posterior()
    pfc = PFConfig(num_particles=24)
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    states = pf.pf_init_bank(
        post, m.layout.y_class_offsets, jax.random.PRNGKey(7), pfc, 2
    )
    Zb = jnp.stack(
        [jnp.asarray(s[:5], dtype=jnp.float64) for s in test_seqs[:2]]
    )
    _, ov = pf.pf_scan_bank(
        states, Zb, post, m.params, log_T, m.config,
        dataclasses.replace(pfc, bank_impl="vmap"),
    )
    _, of = pf.pf_scan_bank(
        states, Zb, post, m.params, log_T, m.config,
        dataclasses.replace(pfc, bank_impl="flat"),
    )
    np.testing.assert_allclose(
        np.asarray(of.class_probs), np.asarray(ov.class_probs),
        rtol=0.0, atol=2.0 / pfc.num_particles,
    )


def test_bank_flat_ess_threshold_matches_vmap(trained_model):
    """ESS-gated resampling: the flat path's per-bank where-select must
    reproduce the vmapped lax.cond semantics (both branches computed,
    per-bank selection)."""
    m, test_seqs, _ = trained_model
    pfc = PFConfig(
        num_particles=24, resample_threshold=0.5, accumulate_weights=True
    )
    log_T = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]]))
    states = pf.pf_init_bank(
        m.posterior, m.layout.y_class_offsets, jax.random.PRNGKey(8), pfc, 3
    )
    Zb = jnp.stack(
        [jnp.asarray(s[:6], dtype=jnp.float64) for s in test_seqs[:3]]
    )
    fv, ov = pf.pf_scan_bank(
        states, Zb, m.posterior, m.params, log_T, m.config,
        dataclasses.replace(pfc, bank_impl="vmap"),
    )
    ff, of = pf.pf_scan_bank(
        states, Zb, m.posterior, m.params, log_T, m.config,
        dataclasses.replace(pfc, bank_impl="flat"),
    )
    np.testing.assert_allclose(
        np.asarray(of.class_probs), np.asarray(ov.class_probs),
        rtol=0.0, atol=2.0 / pfc.num_particles,
    )
    np.testing.assert_allclose(
        np.asarray(ff.log_w), np.asarray(fv.log_w), rtol=1e-8, atol=1e-10
    )
