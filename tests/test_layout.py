"""Layout bookkeeping vs brute-force per-sequence construction."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu.ops.layout import build_layout, class_block_mask, xin_xout


def brute_xin_xout(X, seq_lengths, target, back_step):
    """Direct per-sequence construction of (Xin, Xout) from the four modes
    (reference gpmdm.py:679-713)."""
    xin, xout = [], []
    start = 0
    for L in seq_lengths:
        s = X[start : start + L]
        if back_step == 1:
            a_in = s[:-1]
            a_out = s[1:]
        else:
            a_in = np.concatenate([s[1:-1], s[:-2]], axis=1)
            a_out = s[2:]
        if target == "delta":
            a_out = a_out - (s[:-1] if back_step == 1 else s[1:-1])
        xin.append(a_in)
        xout.append(a_out)
        start += L
    return np.concatenate(xin), np.concatenate(xout)


@pytest.mark.parametrize("target", ["full", "delta"])
@pytest.mark.parametrize("back_step", [1, 2])
def test_xin_xout_modes(rng, target, back_step):
    seq_lengths = [8, 5, 7, 6]
    seq_classes = [0, 0, 1, 1]
    layout = build_layout(seq_lengths, seq_classes, 2, back_step)
    d = 3
    X = rng.normal(size=(sum(seq_lengths), d))
    Xin, Xout = xin_xout(jnp.asarray(X), layout, target)
    want_in, want_out = brute_xin_xout(X, seq_lengths, target, back_step)
    np.testing.assert_allclose(np.asarray(Xin), want_in)
    np.testing.assert_allclose(np.asarray(Xout), want_out)


def test_counts_and_offsets():
    layout = build_layout([8, 5, 7, 6, 4], [0, 0, 1, 1, 2], 3, 1)
    assert layout.Ny == 30
    assert layout.Nx == 30 - 5  # one pair lost per sequence at back_step=1
    np.testing.assert_array_equal(layout.class_x_counts, [11, 11, 3])
    np.testing.assert_array_equal(layout.x_class_offsets, [0, 11, 22, 25])
    np.testing.assert_array_equal(layout.y_class_offsets, [0, 13, 26, 30])
    assert layout.n_max == 11


def test_back_step_2_counts():
    layout = build_layout([8, 5], [0, 1], 2, back_step=2)
    assert layout.Nx == (8 - 2) + (5 - 2)
    np.testing.assert_array_equal(layout.class_x_counts, [6, 3])


def test_class_block_mask_structure():
    layout = build_layout([4, 3, 5], [0, 0, 1], 2, 1)
    M = class_block_mask(layout)
    # class 0: pairs from both its sequences; class 1: rest
    n0 = 3 + 2
    assert M[:n0, :n0].all()
    assert M[n0:, n0:].all()
    assert not M[:n0, n0:].any()
    assert not M[n0:, :n0].any()


def test_padded_class_views():
    layout = build_layout([4, 6], [0, 1], 2, 1)
    assert layout.class_pair_idx.shape == (2, 5)
    np.testing.assert_array_equal(layout.class_pair_idx[0], [0, 1, 2, 0, 0])
    np.testing.assert_array_equal(layout.class_pair_idx[1], [3, 4, 5, 6, 7])
    np.testing.assert_array_equal(layout.class_pair_mask[0], [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(layout.class_pair_mask[1], [1, 1, 1, 1, 1])


def test_rejects_bad_ordering():
    with pytest.raises(ValueError):
        build_layout([4, 4], [1, 0], 2, 1)


def test_rejects_short_sequences():
    with pytest.raises(ValueError):
        build_layout([2, 4], [0, 1], 2, back_step=2)
