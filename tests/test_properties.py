"""Property-based tests (hypothesis) for the numerical core.

SURVEY.md §4 test strategy: property tests for kernel structure
(PSD-ness, symmetry, unit diagonal), resampling invariants (monotone
indices, floor/ceil offspring bounds, determinism), and layout
invariants — complementing the fixed-seed oracle tests elsewhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from gpmdm_tpu.filter import particle_filter as pf
from gpmdm_tpu.ops import kernels as K

SETTINGS = dict(max_examples=25, deadline=None)


def _rand_matrix(seed, n, d, scale):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0.0, scale, (n, d)))


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 24),
    d=st.integers(1, 4),
    log_ls=st.floats(-1.5, 1.5),
)
def test_rbf_gram_is_symmetric_psd_with_unit_diag(seed, n, d, log_ls):
    X = _rand_matrix(seed, n, d, 2.0)
    ls = jnp.full((d,), log_ls, dtype=jnp.float64)
    G = np.asarray(K.rbf_kernel(X, X, ls))
    np.testing.assert_allclose(G, G.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(G), 1.0, atol=1e-12)
    # PSD: eigenvalues >= -tol (RBF without noise is PSD, possibly
    # numerically rank-deficient)
    w = np.linalg.eigvalsh(G)
    assert w.min() > -1e-9, w.min()
    # entries in [0, 1]: mathematically (0, 1], but exp(-huge) underflows
    # to exactly 0.0 for distant points at short lengthscales
    assert (G >= 0).all() and (G <= 1 + 1e-12).all()


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 20),
    d=st.integers(1, 3),
    log_sn=st.floats(-3.0, 0.0),
)
def test_x_kernel_gram_with_noise_is_symmetric_pd(seed, n, d, log_sn):
    X = _rand_matrix(seed, n, d, 1.5)
    ls = jnp.zeros((d,), dtype=jnp.float64)
    lin = jnp.zeros((d + 1,), dtype=jnp.float64)
    G = np.asarray(
        K.x_kernel(X, X, ls, jnp.asarray(log_sn, dtype=jnp.float64), lin,
                   sigma_n_num=0.0, with_noise=True)
    )
    np.testing.assert_allclose(G, G.T, atol=1e-10)
    w = np.linalg.eigvalsh(G)
    # noise floor makes it strictly PD
    assert w.min() > 0.5 * np.exp(log_sn) ** 2, (w.min(), log_sn)


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    P=st.integers(2, 400),
    spread=st.floats(0.0, 6.0),
)
def test_systematic_resample_invariants(seed, P, spread):
    """For ANY weight vector: indices are sorted and in-range, offspring
    counts are within floor/ceil of P*w_i, and the draw is deterministic
    in the key."""
    key = jax.random.PRNGKey(seed)
    kw, ku = jax.random.split(key)
    log_w = spread * jax.random.normal(kw, (P,), dtype=jnp.float64)
    idx = np.asarray(pf.systematic_resample_indices(ku, log_w))
    assert idx.shape == (P,) and idx.dtype == np.int32
    assert (idx >= 0).all() and (idx < P).all()
    assert (np.diff(idx) >= 0).all()  # systematic indices are monotone
    idx2 = np.asarray(pf.systematic_resample_indices(ku, log_w))
    np.testing.assert_array_equal(idx, idx2)  # deterministic in the key
    w = np.asarray(jax.nn.softmax(log_w))
    counts = np.bincount(idx, minlength=P)
    np.testing.assert_array_compare(
        lambda a, b: a >= b, counts, np.floor(P * w) - 1e-9
    )
    np.testing.assert_array_compare(
        lambda a, b: a <= b, counts, np.ceil(P * w) + 1e-9
    )


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    P=st.integers(1, 50),
    D=st.integers(1, 6),
)
def test_observation_log_lik_matches_dense_gaussian(seed, P, D):
    """The batched diagonal-Gaussian log-pdf equals the naive per-particle
    formula (the reference computes this in a Python loop,
    gpmdm_pf.py:188-192)."""
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.normal(size=D))
    mean = jnp.asarray(rng.normal(size=(P, D)))
    var = jnp.asarray(rng.uniform(0.1, 2.0, size=(P, D)))
    got = np.asarray(
        pf.observation_log_lik(z, mean, var, D, compat_double_logdet=False)
    )
    for p in range(min(P, 8)):  # spot-check a few rows densely
        m, v = np.asarray(mean[p]), np.asarray(var[p])
        want = -0.5 * np.sum(
            (np.asarray(z) - m) ** 2 / v + np.log(v) + np.log(2 * np.pi)
        )
        np.testing.assert_allclose(got[p], want, rtol=1e-10, atol=1e-10)


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_seqs=st.integers(1, 4),
    min_len=st.integers(3, 8),
)
def test_layout_class_offsets_partition_pairs(seed, n_seqs, min_len):
    """DataLayout invariants hold for arbitrary ragged sequence sets:
    offsets are monotone, pair counts match sum(len-1) per class, and the
    xin/xout index arrays point at in-range, consecutive frames."""
    from gpmdm_tpu.ops.layout import build_layout

    rng = np.random.default_rng(seed)
    lens = [
        [int(l) for l in rng.integers(min_len, min_len + 6, size=n_seqs)]
        for _ in range(2)
    ]
    seq_lengths = lens[0] + lens[1]
    seq_classes = [0] * n_seqs + [1] * n_seqs
    layout = build_layout(seq_lengths, seq_classes, n_classes=2)
    offs = np.asarray(layout.x_class_offsets)
    assert (np.diff(offs) >= 0).all()
    for c in range(2):
        want_pairs = sum(l - 1 for l in lens[c])
        assert offs[c + 1] - offs[c] == want_pairs
    xin = np.asarray(layout.xin_idx)
    xout = np.asarray(layout.xout_idx)
    assert (xout == xin + 1).all()
    assert xin.min() >= 0 and xout.max() < int(layout.Ny)
