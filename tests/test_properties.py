"""Property-based tests (hypothesis): kernel PSD-ness and symmetry, layout
invariants, block-mask structure, resampling distribution properties, and
the batched observation log-pdf (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from gpmdm_tpu.filter import particle_filter as pf
from gpmdm_tpu.filter.particle_filter import systematic_resample_indices
from gpmdm_tpu.ops import kernels as K
from gpmdm_tpu.ops.layout import build_layout, class_block_mask, xin_xout

_settings = settings(max_examples=25, deadline=None)


@st.composite
def kernel_inputs(draw):
    n = draw(st.integers(2, 12))
    d = draw(st.integers(1, 4))
    seed = draw(st.integers(0, 2**16))
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    log_ls = rng.normal(size=(d,)) * 0.5
    return X, log_ls, rng


@_settings
@given(kernel_inputs())
def test_rbf_kernel_psd_and_symmetric(inp):
    X, log_ls, rng = inp
    Km = np.asarray(K.rbf_kernel(jnp.asarray(X), jnp.asarray(X), jnp.asarray(log_ls)))
    np.testing.assert_allclose(Km, Km.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(Km), 1.0, atol=1e-12)  # unit signal variance
    w = np.linalg.eigvalsh(Km)
    assert w.min() > -1e-8  # PSD up to roundoff
    assert Km.max() <= 1.0 + 1e-12  # RBF bounded by 1
    # entries in [0, 1]: mathematically (0, 1], but exp(-huge) underflows
    # to exactly 0.0 for distant points at short lengthscales
    assert (Km >= 0).all()


@_settings
@given(kernel_inputs())
def test_x_kernel_psd(inp):
    X, log_ls, rng = inp
    d = X.shape[1]
    log_coeff = rng.normal(size=(d + 1,)) * 0.5
    Km = np.asarray(
        K.x_kernel(
            jnp.asarray(X), jnp.asarray(X), jnp.asarray(log_ls),
            jnp.asarray(0.0), jnp.asarray(log_coeff), with_noise=False,
        )
    )
    np.testing.assert_allclose(Km, Km.T, atol=1e-10)
    w = np.linalg.eigvalsh(Km)
    assert w.min() > -1e-7


@_settings
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 20),
    d=st.integers(1, 3),
    log_sn=st.floats(-3.0, 0.0),
)
def test_x_kernel_gram_with_noise_is_pd(seed, n, d, log_sn):
    """With the noise term on, the dynamics Gram is strictly PD with its
    smallest eigenvalue at least ~the noise floor."""
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.normal(0.0, 1.5, (n, d)))
    ls = jnp.zeros((d,), dtype=jnp.float64)
    lin = jnp.zeros((d + 1,), dtype=jnp.float64)
    G = np.asarray(
        K.x_kernel(X, X, ls, jnp.asarray(log_sn, dtype=jnp.float64), lin,
                   sigma_n_num=0.0, with_noise=True)
    )
    np.testing.assert_allclose(G, G.T, atol=1e-10)
    w = np.linalg.eigvalsh(G)
    assert w.min() > 0.5 * np.exp(log_sn) ** 2, (w.min(), log_sn)


@st.composite
def layouts(draw):
    n_classes = draw(st.integers(1, 4))
    lengths, classes = [], []
    for c in range(n_classes):
        for _ in range(draw(st.integers(1, 3))):
            lengths.append(draw(st.integers(3, 10)))
            classes.append(c)
    return lengths, classes, n_classes


@_settings
@given(layouts(), st.integers(1, 2))
def test_layout_invariants(lc, back_step):
    lengths, classes, n_classes = lc
    layout = build_layout(lengths, classes, n_classes, back_step)
    # total pairs = sum(len - back_step)
    assert layout.Nx == sum(l - back_step for l in lengths)
    assert layout.Ny == sum(lengths)
    # xout index is always xin index + 1; xin_prev = xin - (back_step - 1)
    np.testing.assert_array_equal(layout.xout_idx, layout.xin_idx + 1)
    np.testing.assert_array_equal(layout.xin_prev_idx, layout.xin_idx - (back_step - 1))
    # pair classes are non-decreasing and match offsets
    assert (np.diff(layout.pair_class) >= 0).all()
    np.testing.assert_array_equal(
        np.bincount(layout.pair_class, minlength=n_classes),
        np.diff(layout.x_class_offsets),
    )
    # mask M is block diagonal with blocks of ones matching class counts
    M = class_block_mask(layout)
    counts = np.diff(layout.x_class_offsets)
    assert M.sum() == (counts**2).sum()
    # gather round trip: every xin/xout index within its sequence bounds
    starts = np.asarray(layout.seq_starts)
    ends = starts + np.asarray(lengths)
    for i, (s, e) in enumerate(zip(starts, ends)):
        in_seq = (layout.xin_idx >= s) & (layout.xin_idx < e)
        assert (layout.xout_idx[in_seq] < e).all()


@_settings
@given(layouts())
def test_xin_xout_full_vs_delta(lc):
    lengths, classes, n_classes = lc
    layout = build_layout(lengths, classes, n_classes, 1)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(layout.Ny, 2)))
    Xin_f, Xout_f = xin_xout(X, layout, "full")
    Xin_d, Xout_d = xin_xout(X, layout, "delta")
    np.testing.assert_allclose(np.asarray(Xin_f), np.asarray(Xin_d))
    np.testing.assert_allclose(
        np.asarray(Xout_d), np.asarray(Xout_f) - np.asarray(Xin_f), atol=1e-12
    )


@_settings
@given(st.integers(0, 1000), st.integers(4, 64))
def test_systematic_resample_counts_match_weights(seed, P):
    """Offspring counts are within floor/ceil of P * w_i (the defining
    property of systematic resampling)."""
    rng = np.random.default_rng(seed)
    w = rng.dirichlet(np.ones(P))
    idx = np.asarray(
        systematic_resample_indices(jax.random.PRNGKey(seed), jnp.log(jnp.asarray(w)))
    )
    counts = np.bincount(idx, minlength=P)
    assert counts.sum() == P
    for i in range(P):
        assert np.floor(P * w[i]) - 1e-9 <= counts[i] <= np.ceil(P * w[i]) + 1e-9


@_settings
@given(
    seed=st.integers(0, 2**31 - 1),
    P=st.integers(2, 400),
    spread=st.floats(0.0, 6.0),
)
def test_systematic_resample_invariants(seed, P, spread):
    """For ANY weight vector: indices are sorted and in-range, and the
    draw is deterministic in the key."""
    key = jax.random.PRNGKey(seed)
    kw, ku = jax.random.split(key)
    log_w = spread * jax.random.normal(kw, (P,), dtype=jnp.float64)
    idx = np.asarray(systematic_resample_indices(ku, log_w))
    assert idx.shape == (P,) and idx.dtype == np.int32
    assert (idx >= 0).all() and (idx < P).all()
    assert (np.diff(idx) >= 0).all()  # systematic indices are monotone
    idx2 = np.asarray(systematic_resample_indices(ku, log_w))
    np.testing.assert_array_equal(idx, idx2)  # deterministic in the key


@_settings
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
