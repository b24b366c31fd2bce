"""Smoke tests: the example scripts (the reference's notebook entry points)
run end-to-end on the synthetic fallback."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ROOT)
    env["MPLBACKEND"] = "Agg"
    # force CPU inside the subprocess (no conftest there)
    script = str(ROOT / args[0])
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import sys; sys.argv = {args!r}; __file__ = {script!r};"
        f"exec(compile(open({script!r}).read(), {script!r}, 'exec'))"
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=600,
    )


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("examples")
    r = _run(["examples/train_gpmdm.py", "--steps", "25",
              "--out", str(d / "m.npz")], cwd=d)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (d / "m.npz").exists()
    assert "latent map NMSE" in r.stdout
    return d / "m.npz"


def test_example_eval(ckpt):
    r = _run(["examples/test_gpmdm_pf.py", str(ckpt), "--particles", "40"],
             cwd=ckpt.parent)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "frame confusion" in r.stdout


def test_example_view(ckpt):
    r = _run(["examples/view_gpmdm_pf.py", str(ckpt), "--particles", "30",
              "--out", str(ckpt.parent / "demo.gif")], cwd=ckpt.parent)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (ckpt.parent / "demo.gif").stat().st_size > 1000


def test_example_load(ckpt):
    r = _run(["examples/load_gpmdm.py", str(ckpt),
              "--save", str(ckpt.parent / "latent.png")], cwd=ckpt.parent)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (ckpt.parent / "latent.png").exists()


def test_example_joints(tmp_path):
    """Skeleton-exploration walkthrough (reference notebooks/joints.ipynb):
    joint listing, zero pose, perturbed pose, animation GIF."""
    r = _run(["examples/joints.py", "--out-dir", str(tmp_path)], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "joints:" in r.stdout
    for f in ("zero_pose.png", "perturbed_pose.png", "joints_animation.gif"):
        assert (tmp_path / f).stat().st_size > 0
