"""8-class configuration (the BASELINE scale config): training, EP-sharded
loss equality on 8 devices, PF classification."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmdm_tpu import GPMDM, GPMDM_PF, PFConfig, TrainConfig
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.models import core
from gpmdm_tpu.parallel import make_context, make_mesh, nll_sharded, pad_Y


@pytest.fixture(scope="module")
def model8():
    # The signature task (center_spread + per-class observation signature +
    # mild frequency scaling): every class is separable in both posture and
    # dynamics, so accuracy is a meaningful bar — the classic task's
    # overlapping rings with aggressively scaled frequencies test sampling
    # density, not the model (class 7 aliased at ~9 frames/cycle).
    tr, tl, te, tel = synthetic.make_dataset(
        n_classes=8, n_train_seqs=2, n_test_seqs=1, seq_len=60, D=10, seed=21,
        center_spread=3.0, class_signature=1.0,
    )
    m = GPMDM(D=10, d=3, n_classes=8, dtype="float64")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    return m, te, tel


def test_8class_layout_and_loss(model8):
    m, _, _ = model8
    assert m.layout.n_classes == 8
    assert len(m.layout.class_x_counts) == 8
    assert np.isfinite(m.gpdm_loss())


def test_8class_ep_sharded_loss(model8):
    """One class per device: pure expert parallelism."""
    m, _, _ = model8
    mesh = make_mesh({"ep": 8, "tp": 1})
    ctx = make_context(m.config, m.layout, mesh)
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    got = nll_sharded(m.params, pad_Y(Y, ctx), ctx)
    want = core.nll(m.params, Y, m.config, m.layout)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_8class_training_and_pf(model8):
    """8-way classification accuracy > 0.82 (6.6x chance) on the signature
    task — a meaningful quality bar for the EP scale config, not just a
    does-it-run check.  Observed 0.840-0.855 across seeds/platforms at
    this config, so the bar keeps a seed margin; the TPU-measured 0.88
    lives in the bench c8 extras where the driver watches it.  Do NOT
    raise the training steps — over-sharp kernels degrade PF accuracy
    (same effect as the bench asset note)."""
    m, te, tel = model8
    losses = m.train_adam(num_opt_steps=150, lr=0.02)
    assert losses[-1] < losses[0]
    T = np.full((8, 8), 0.1 / 7)
    np.fill_diagonal(T, 0.9)
    flt = GPMDM_PF(m, T, num_particles=1500, seed=0)
    correct = total = 0
    for Z, label in zip(te, tel):
        flt.reset()
        outs = flt.run(Z)
        pred = np.asarray(outs.most_likely_class)
        correct += (pred[10:] == label).sum()
        total += len(pred) - 10
    assert correct / total > 0.82, correct / total
