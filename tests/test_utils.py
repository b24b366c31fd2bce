"""Aux subsystems: mid-training checkpoint/resume, metrics, stage timer."""

import numpy as np

from gpmdm_tpu import GPMDM, TrainConfig
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.train.trainer import train_adam
from gpmdm_tpu.utils import checkpoint as ckpt
from gpmdm_tpu.utils.metrics import binary_prf, confusion_matrix, macro_prf
from gpmdm_tpu.utils.profiling import StageTimer


def small_model():
    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=25, D=8, seed=3
    )
    m = GPMDM(D=8, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    return m


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Train 10 steps with checkpoint-every-5; resume from the 5-step
    snapshot and land exactly where an uninterrupted run lands."""
    m = small_model()
    Y = m.get_Y()
    path = tmp_path / "train_state.npz"
    tc = TrainConfig(num_steps=10, lr=0.01, checkpoint_every=5, checkpoint_path=str(path))
    res_full = train_adam(m.params, Y, m.config, m.layout, tc)
    assert path.exists()

    # reload the mid-run snapshot (it was overwritten at step 10; use it)
    import optax

    template_opt = optax.adam(0.01).init(m.params)
    params_ck, opt_ck, step, losses_ck = ckpt.load_train_state(
        path, m.params, template_opt
    )
    assert step == 10
    np.testing.assert_allclose(
        np.asarray(params_ck.X), np.asarray(res_full.params.X), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(losses_ck), np.asarray(res_full.losses))

    # resume for 5 more steps == one 15-step run
    tc2 = TrainConfig(num_steps=5, lr=0.01)
    res_resumed = train_adam(params_ck, Y, m.config, m.layout, tc2, opt_state=opt_ck)
    res_15 = train_adam(m.params, Y, m.config, m.layout, TrainConfig(num_steps=15, lr=0.01))
    np.testing.assert_allclose(
        np.asarray(res_resumed.params.X), np.asarray(res_15.params.X), rtol=1e-9
    )


def test_confusion_and_prf():
    pred = np.array([0, 0, 1, 1, 0, 1])
    true = np.array([0, 1, 1, 1, 0, 0])
    cm = confusion_matrix(pred, true, 2)
    assert cm.tolist() == [[2, 1], [1, 2]]
    m = binary_prf(cm, positive=0)
    assert abs(m["accuracy"] - 4 / 6) < 1e-12
    assert abs(m["precision"] - 2 / 3) < 1e-12
    assert abs(m["recall"] - 2 / 3) < 1e-12
    m3 = macro_prf(np.eye(3, dtype=np.int64) * 5)
    assert m3["accuracy"] == 1.0 and m3["f1"] == 1.0


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a:" in t.summary()


def test_metric_logger(tmp_path):
    from gpmdm_tpu.utils.logging import MetricLogger

    p = tmp_path / "metrics.jsonl"
    log = MetricLogger(stream=None, jsonl_path=str(p))
    log.log(step=0, loss=10.0)
    log.log(step=1, loss=5.0, fps=100.0)
    steps, vals = log.series("loss")
    np.testing.assert_array_equal(steps, [0, 1])
    np.testing.assert_allclose(vals, [10.0, 5.0])
    assert log.last("fps") == 100.0
    import json

    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[1]["fps"] == 100.0
    assert "loss: 2 points" in log.summary()


def test_checkify_loss_clean_and_dirty():
    import jax.numpy as jnp
    import pytest

    from gpmdm_tpu.utils.debug import check_loss

    m = small_model()
    assert np.isfinite(check_loss(m))
    # poison a hyperparameter -> checkify reports instead of silent NaN
    import dataclasses as dc

    m.params = dc.replace(m.params, y_log_sigma_n=jnp.asarray(jnp.nan))
    with pytest.raises(Exception):
        check_loss(m)


def test_checkpoint_cadence_misaligned_chunks(tmp_path):
    """Checkpoints must be written whenever a boundary is crossed, even when
    print_every does not divide checkpoint_every (regression: the save
    condition used to be `done % checkpoint_every == 0`, which never fired
    for print_every=30 / checkpoint_every=50)."""
    import optax

    m = small_model()
    path = tmp_path / "ck.npz"
    tc = TrainConfig(num_steps=90, lr=0.01, print_every=30,
                     checkpoint_every=50, checkpoint_path=str(path))
    train_adam(m.params, m.get_Y(), m.config, m.layout, tc)
    assert path.exists()
    template_opt = optax.adam(0.01).init(m.params)
    _, _, step, _ = ckpt.load_train_state(path, m.params, template_opt)
    # the 50-boundary is crossed inside the chunk ending at step 60; the
    # 100-boundary is never reached (the final state is returned anyway)
    assert step == 60


def test_checked_helper_with_static_args():
    """checked() must accept static config objects (regression: it used to
    force jax.jit and crash on GPMDMConfig/DataLayout args)."""
    import jax.numpy as jnp

    from gpmdm_tpu.models import core
    from gpmdm_tpu.utils.debug import checked

    m = small_model()
    Y = jnp.asarray(m.get_Y(), dtype=jnp.float64)
    loss = checked(core.nll, m.params, Y, m.config, m.layout)
    assert np.isfinite(float(loss))


def test_save_load_non_npz_suffix(tmp_path):
    """save('foo.ckpt') must write exactly at 'foo.ckpt' so load('foo.ckpt')
    finds it (np.savez silently appends '.npz' otherwise)."""
    m = small_model()
    path = tmp_path / "model.ckpt"
    m.save(path)
    assert path.exists() and not (tmp_path / "model.ckpt.npz").exists()
    m2 = GPMDM.load(path)
    np.testing.assert_allclose(np.asarray(m2.params.X), np.asarray(m.params.X))


def test_save_load_preserves_full_config(tmp_path):
    """Config fields the GPMDM ctor does not accept as kwargs
    (class_jitter today) must still survive a save/load roundtrip — the
    loader trusts the serialized config wholesale rather than whatever
    subset the ctor re-derives (regression: load used to silently revert
    class_jitter to its default)."""
    m = small_model()
    m.config = m.config.replace(class_jitter=3e-5)
    m._precompute_kernel_inverses()  # rebuild posterior under the new jitter
    path = tmp_path / "model.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    assert m2.config.class_jitter == 3e-5
    assert m2.config == m.config


def test_train_adam_emits_logger_records(tmp_path):
    """GPMDM.train_adam(logger=) produces structured loss / steps-per-sec
    series plus a JSONL file (SURVEY §5 metrics wiring)."""
    import json

    from gpmdm_tpu.utils.logging import MetricLogger

    m = small_model()
    path = tmp_path / "train.jsonl"
    logger = MetricLogger(stream=None, jsonl_path=str(path))
    m.train_adam(num_opt_steps=6, num_print_steps=2, lr=0.01, logger=logger)
    steps, losses = logger.series("loss")
    assert list(steps) == [2, 4, 6]
    assert losses[-1] < losses[0]
    assert logger.last("steps_per_sec") > 0
    records = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(records) == 3 and "loss" in records[0]


def test_evaluate_pf_emits_logger_records():
    """evaluate_pf(logger=) logs one record per trial + an aggregate."""
    from gpmdm_tpu import GPMDM_PF
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.utils.logging import MetricLogger
    from gpmdm_tpu.utils.metrics import evaluate_pf

    m = small_model()
    m.train_adam(num_opt_steps=20, lr=0.02)
    _, _, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=2, seq_len=25, D=8, seed=3
    )
    flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=32, seed=0)
    logger = MetricLogger(stream=None)
    report = evaluate_pf(
        flt, [np.asarray(Z) for Z in te], tel, n_classes=2, logger=logger
    )
    assert len(logger.history["trial_frame_acc"]) == len(te)
    assert logger.last("fps") > 0
    assert abs(logger.last("frame_acc") - report.frame_metrics["accuracy"]) < 1e-9


def test_evaluate_pf_banked_matches_looped_quality():
    """The one-dispatch banked evaluation reaches the same classification
    quality as the per-trial loop (different RNG streams, same
    distribution), with ragged trial lengths exercised."""
    from gpmdm_tpu import GPMDM_PF, PFConfig
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.utils.metrics import evaluate_pf, evaluate_pf_banked

    m = small_model()
    m.train_adam(num_opt_steps=40, lr=0.02)
    _, _, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=3, seq_len=25, D=8, seed=3
    )
    # ragged lengths: trim trials to different sizes
    te = [np.asarray(Z)[: 25 - 3 * i] for i, Z in enumerate(te)]

    flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=64, seed=0)
    looped = evaluate_pf(flt, te, tel, n_classes=2, burn_in=3)
    banked = evaluate_pf_banked(
        m, [[0.9, 0.1], [0.1, 0.9]], te, tel, num_particles=64,
        burn_in=3, seed=0,
    )
    assert banked.total_frames == looped.total_frames
    assert banked.frame_confusion.sum() == looped.frame_confusion.sum()
    # same quality regime on a trained model
    assert banked.frame_metrics["accuracy"] > 0.8
    assert (
        abs(banked.frame_metrics["accuracy"] - looped.frame_metrics["accuracy"])
        < 0.15
    )
    assert banked.trial_confusion.trace() == len(te)  # all trials correct

    # mesh path: 3 trials padded to an 8-row bank sharded over dp=8
    from gpmdm_tpu.parallel import make_mesh

    sharded = evaluate_pf_banked(
        m, [[0.9, 0.1], [0.1, 0.9]], te, tel, num_particles=64,
        burn_in=3, seed=0, mesh=make_mesh({"dp": 8}),
    )
    # same seed + same bank layout for the first B rows -> identical metrics
    np.testing.assert_array_equal(
        sharded.frame_confusion, banked.frame_confusion
    )


def test_evaluate_pf_banked_chunked():
    """``max_banks`` chunking: same frame totals and quality regime as the
    single-dispatch path (per-trial RNG streams differ by chunk layout),
    with a ragged final chunk padded to the shared executable's width."""
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.utils.metrics import evaluate_pf_banked

    m = small_model()
    m.train_adam(num_opt_steps=40, lr=0.02)
    _, _, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=3, seq_len=25, D=8, seed=3
    )
    te = [np.asarray(Z) for Z in te]  # 6 trials -> chunks of 4 + 2(padded)
    T = [[0.9, 0.1], [0.1, 0.9]]
    full = evaluate_pf_banked(
        m, T, te, tel, num_particles=64, burn_in=3, seed=0
    )
    chunked = evaluate_pf_banked(
        m, T, te, tel, num_particles=64, burn_in=3, seed=0, max_banks=4
    )
    assert chunked.total_frames == full.total_frames
    assert chunked.frame_confusion.sum() == full.frame_confusion.sum()
    assert chunked.frame_metrics["accuracy"] > 0.8
    # max_banks >= B falls through to the one-dispatch path: identical
    same = evaluate_pf_banked(
        m, T, te, tel, num_particles=64, burn_in=3, seed=0, max_banks=16
    )
    np.testing.assert_array_equal(same.frame_confusion, full.frame_confusion)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """The Orbax train-state backend restores params/opt-state/step/losses
    bit-identically and resumes to the same trajectory as the .npz backend."""
    import optax

    from gpmdm_tpu.utils.checkpoint import (
        load_train_state_orbax,
        save_train_state_orbax,
    )

    m = small_model()
    Y = m.get_Y()
    tc = TrainConfig(num_steps=5, lr=0.01)
    res = train_adam(m.params, Y, m.config, m.layout, tc)
    path = tmp_path / "orbax_ckpt"
    save_train_state_orbax(path, res.params, res.opt_state, 5, res.losses)

    opt_template = optax.adam(0.01).init(m.params)
    params, opt_state, step, losses = load_train_state_orbax(
        path, m.params, opt_template
    )
    assert step == 5
    np.testing.assert_array_equal(np.asarray(losses), np.asarray(res.losses))
    for a, b in zip(
        __import__("jax").tree.leaves(params),
        __import__("jax").tree.leaves(res.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming from the orbax snapshot == continuing uninterrupted
    cont = train_adam(
        res.params, Y, m.config, m.layout, tc, opt_state=res.opt_state
    )
    resumed = train_adam(params, Y, m.config, m.layout, tc, opt_state=opt_state)
    np.testing.assert_allclose(
        np.asarray(resumed.losses), np.asarray(cont.losses), rtol=1e-12
    )
