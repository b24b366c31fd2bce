"""CLI entry points (python -m gpmdm_tpu): the deploy subcommand.

The heavier commands (train/eval/rollout/view) are exercised end-to-end
by the verify drives and tests/test_examples.py; deploy is the
checkpoint-mutation path so it gets a direct in-process test.
"""

import numpy as np

from gpmdm_tpu import GPMDM
from gpmdm_tpu.__main__ import main
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.models.compressed import CompressedPosterior


def _small_model():
    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=40, D=8, seed=3
    )
    m = GPMDM(D=8, d=2, n_classes=2, dtype="float64",
              y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    return m


def test_cli_deploy_bakes_compressed_cache(tmp_path, capsys):
    m = _small_model()
    src = tmp_path / "m.npz"
    out = tmp_path / "deployed.npz"
    m.save(src)

    rc = main(["deploy", str(src), "--out", str(out),
               "--rank-y", "9", "--rank-x", "7"])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "rank_y=9" in msg and str(out) in msg

    m2 = GPMDM.load(out)
    assert (9, 7, 1e-6) in m2._compressed_cache
    cp = m2._compressed_cache[(9, 7, 1e-6)]
    assert isinstance(cp, CompressedPosterior) and cp.rank_y == 9
    # deployed == freshly-compressed factors from the same params
    ref = m.compressed_posterior(rank_y=9, rank_x=7)
    np.testing.assert_allclose(
        np.asarray(cp.Uy), np.asarray(ref.Uy), rtol=0, atol=1e-12
    )


def test_cli_deploy_default_policy_small_model(tmp_path, capsys):
    # below AUTO_COMPRESS_N the 'auto' policy deploys exact: deploy just
    # re-saves (nothing to persist) and reports the posterior type
    m = _small_model()
    src = tmp_path / "m.npz"
    m.save(src)
    rc = main(["deploy", str(src)])
    assert rc == 0
    assert "Posterior" in capsys.readouterr().out
    m2 = GPMDM.load(src)
    assert m2._compressed_cache == {}


def test_cli_train_deploy_flag(tmp_path, capsys, monkeypatch):
    # --deploy resolves the auto policy before save; for a small synthetic
    # model that's the exact posterior (nothing persisted) — exercise the
    # large-N branch by lowering the threshold
    from gpmdm_tpu.filter import particle_filter as pf

    out = tmp_path / "t.npz"
    monkeypatch.setattr(pf, "AUTO_COMPRESS_N", 10)
    rc = main(["train", "--out", str(out), "--latent-dim", "2",
               "--steps", "3", "--deploy"])
    assert rc == 0
    assert "deployed posterior: compressed" in capsys.readouterr().out
    m = GPMDM.load(out)
    assert (None, None, 1e-6) in m._compressed_cache


def test_cli_deploy_pinned_rank_is_the_auto_deployment(tmp_path, monkeypatch):
    """deploy --rank-y aliases the pinned factors under the default key,
    so a later posterior='auto' load deploys THEM (no re-selection, no
    recompute) — and the alias persists once, not twice."""
    import numpy as np_
    from gpmdm_tpu.filter import particle_filter as pf
    from gpmdm_tpu.models import compressed

    m = _small_model()
    src = tmp_path / "m.npz"
    m.save(src)
    rc = main(["deploy", str(src), "--rank-y", "11", "--rank-x", "6"])
    assert rc == 0

    with np_.load(src) as data:
        comp_arrays = [k for k in data.files if k.startswith("comp_") and k.endswith("_Uy")]
    assert len(comp_arrays) == 1  # aliased entries share one array set

    m2 = GPMDM.load(src)
    monkeypatch.setattr(pf, "AUTO_COMPRESS_N", 10)
    monkeypatch.setattr(
        compressed, "compress_host",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("auto re-ran compression despite pinned bake")),
    )
    post = pf.resolve_posterior(m2, "auto")
    assert post.rank_y == 11 and post.rank_x == 6


def test_cli_deploy_rank_rejected_for_sparse(tmp_path, capsys):
    from gpmdm_tpu import SparseGPMDM
    from gpmdm_tpu.data import synthetic as syn

    tr, tl, _, _ = syn.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=40, D=8, seed=3
    )
    ms = SparseGPMDM(D=8, d=2, n_classes=2, dtype="float64",
                     n_inducing_y=8, n_inducing_x=8,
                     y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    for Y, c in zip(tr, tl):
        ms.add_data(Y, c)
    ms.init_X()
    p = tmp_path / "s.npz"
    ms.save(p)
    rc = main(["deploy", str(p), "--rank-y", "8"])
    assert rc == 2
    assert "exact family only" in capsys.readouterr().out


def test_cli_eval_trace_writes_profiler_capture(tmp_path, capsys):
    """--trace wraps the command in a jax.profiler capture (SURVEY §5
    tracing): the output dir must contain an xplane protobuf."""
    m = _small_model()
    src = tmp_path / "m.npz"
    m.save(src)
    trace_dir = tmp_path / "trace"
    rc = main(["eval", str(src), "--particles", "20", "--burn-in", "2",
               "--trace", str(trace_dir)])
    assert rc == 0
    assert "profiler trace written" in capsys.readouterr().out
    files = list(trace_dir.rglob("*.xplane.pb"))
    assert files, list(trace_dir.rglob("*"))


def test_platform_env_var_honored_at_package_import():
    """GPMDM_TPU_PLATFORM pins the JAX platform at gpmdm_tpu import time
    (round 5): a sitecustomize registers the TPU plugin at interpreter
    start and JAX_PLATFORMS is ignored, so subprocesses spawned by
    notebooks/tools (e.g. view_gpmdm_pf.ipynb cell 4 running
    examples/view_gpmdm_pf.py) previously landed on the TPU tunnel and
    hung in an uncached compile.  The override must work in a FRESH
    interpreter, before any backend touch."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, GPMDM_TPU_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import gpmdm_tpu, jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, env=env, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"
