"""Golden end-to-end regression: reproduce the reference's full evaluation
pipeline (train -> stream test trials through the PF -> confusion/F1) on the
frozen synthetic dataset and check against the committed golden numbers
produced by the ACTUAL reference implementation
(tools/gen_golden_e2e.py -> tests/golden/e2e_synthetic.json).

This is the offline substitute for the CMU real-data reproduction (zero
egress here): it demonstrates the *pipeline* matches end-to-end — same
data, same config, same training schedule, compat flags on — not just the
individual stages (tests/test_reference_parity.py covers those).

Two kinds of assertions:
- parity vs the reference: our metrics must sit inside the reference's own
  PF seed spread (recorded over 3 torch seeds at generation time),
- self-regression: our seed-0 metrics must reproduce the values recorded at
  generation time (the whole pipeline is deterministic on CPU float64).
"""

import hashlib
import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "e2e_synthetic.json"


@pytest.fixture(scope="module")
def golden():
    return json.loads(GOLDEN.read_text())


@pytest.fixture(scope="module")
def pipeline(golden):
    """Train our model on the frozen dataset exactly as at generation."""
    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.data import synthetic

    ds = golden["dataset"]
    tr, tl, te, tel = synthetic.make_dataset(**ds)

    # dataset drift guard: the golden numbers are only meaningful on the
    # exact frozen arrays.
    h = hashlib.sha256()
    for s in tr + te:
        h.update(np.ascontiguousarray(np.asarray(s, dtype=np.float64)).tobytes())
    h.update(bytes(tl) + bytes(tel))
    assert h.hexdigest()[:16] == golden["dataset_sha"], (
        "frozen synthetic dataset changed — regenerate tests/golden via "
        "tools/gen_golden_e2e.py"
    )

    mk = golden["model"]
    m = GPMDM(
        dtype="float64",
        **mk,
        y_lambdas_init=np.ones(mk["D"]),
        y_lengthscales_init=np.ones(mk["d"]),
        x_lambdas_init=np.ones(mk["d"]),
        x_lengthscales_init=np.ones(mk["d"]),
        x_lin_coeff_init=np.ones(mk["d"] + 1),
    )
    for Y, c in zip(tr, tl):
        m.add_data(np.asarray(Y, dtype=np.float64), c)
    m.init_X()
    losses = m.train_adam(
        num_opt_steps=golden["train"]["steps"], lr=golden["train"]["lr"]
    )
    return m, te, tel, losses


def test_training_reaches_reference_loss(pipeline, golden):
    """Same init + same Adam schedule lands at the reference's final loss
    (long-horizon trajectories drift by roundoff; 200 steps stayed within
    1e-2 relative at generation)."""
    _, _, _, losses = pipeline
    ref_final = golden["reference"]["loss_final"]
    assert abs(float(losses[-1]) - ref_final) / abs(ref_final) < 0.05
    # and reproduces our own recorded value tightly (deterministic pipeline)
    got_at_gen = golden["ours_at_generation"]["loss_final"]
    np.testing.assert_allclose(float(losses[-1]), got_at_gen, rtol=1e-6)


def _evaluate(m, te, tel, golden, seed):
    from gpmdm_tpu import GPMDM_PF, PFConfig
    from gpmdm_tpu.utils.metrics import binary_prf, confusion_matrix

    pf_cfg = golden["pf"]
    pfc = PFConfig(
        num_particles=pf_cfg["particles"],
        resampling=pf_cfg["resampling"],
        compat_double_logdet=pf_cfg["compat_double_logdet"],
        # reference parity: the reference never adds sigma_n^2 to the
        # weight variance (gpmdm_pf.py:183); the library default is the
        # statistically-correct True
        obs_noise_in_weights=False,
    )
    flt = GPMDM_PF(
        m, pf_cfg["T"], num_particles=pf_cfg["particles"], config=pfc, seed=seed
    )
    frame_pred, frame_true, trial_pred, trial_true = [], [], [], []
    for Z, label in zip(te, tel):
        flt.reset()
        preds = np.asarray(flt.run(np.asarray(Z)).most_likely_class).tolist()
        frame_pred += preds
        frame_true += [label] * len(preds)
        trial_pred.append(int(np.bincount(preds, minlength=2).argmax()))
        trial_true.append(label)
    fcm = confusion_matrix(np.asarray(frame_pred), np.asarray(frame_true), 2)
    tcm = confusion_matrix(np.asarray(trial_pred), np.asarray(trial_true), 2)
    return fcm, tcm, binary_prf(fcm), binary_prf(tcm)


def test_pf_eval_matches_reference_golden(pipeline, golden):
    """Full PF evaluation with compat flags lands inside the reference's
    own seed spread on every frame metric."""
    m, te, tel, _ = pipeline
    fcm, tcm, fm, tm = _evaluate(m, te, tel, golden, seed=0)

    ref = golden["reference"]
    ref_accs = ref["frame_acc_per_seed"]
    ref_f1s = ref["frame_f1_per_seed"]
    # inside (or above) the reference's own PF-seed variability band
    assert fm["accuracy"] >= min(ref_accs) - 0.02, (fm, ref_accs)
    assert fm["f1"] >= min(ref_f1s) - 0.02, (fm, ref_f1s)
    # all frames counted, same totals as the reference run
    assert fcm.sum() == np.asarray(ref["frame_confusion"]).sum()
    # trial-level: at most one trial worse than the reference's seed-0 run
    ref_trial_correct = np.trace(np.asarray(ref["trial_confusion"]))
    assert np.trace(tcm) >= ref_trial_correct - 1, (tcm, ref["trial_confusion"])


def test_pf_eval_reproduces_generation_values(pipeline, golden):
    """Seed-0 metrics reproduce the values recorded when the golden file was
    generated (regression guard over the whole train+filter pipeline)."""
    m, te, tel, _ = pipeline
    _, _, fm, _ = _evaluate(m, te, tel, golden, seed=0)
    rec_acc = golden["ours_at_generation"]["frame_acc_per_seed"][0]
    rec_f1 = golden["ours_at_generation"]["frame_f1_per_seed"][0]
    assert abs(fm["accuracy"] - rec_acc) < 0.02, (fm["accuracy"], rec_acc)
    assert abs(fm["f1"] - rec_f1) < 0.02, (fm["f1"], rec_f1)
