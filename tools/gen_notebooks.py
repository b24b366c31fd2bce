"""Generate the notebooks/ directory: thin .ipynb mirrors of the
reference's five entry-point notebooks (SURVEY.md §2.1 #11-15) plus the
framework-original deployment guide (deploy_gpmdm.ipynb).

The notebooks are the reference's user surface; each generated notebook
reproduces its cell flow against this framework's API, falling back to
the synthetic dataset when the CMU download is absent (zero-egress
environments).  Cells are intentionally short — the library carries the
logic; tests/test_notebooks.py checks every code cell compiles.

Run: python tools/gen_notebooks.py   (writes/overwrites notebooks/*.ipynb)
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SETUP = """\
# Path setup (reference notebooks/notebook_setup.py): make the repo importable
import sys, pathlib
ROOT = pathlib.Path.cwd().parent if pathlib.Path.cwd().name == "notebooks" else pathlib.Path.cwd()
sys.path.insert(0, str(ROOT))
MODELS_DIR = ROOT / "models"
MODELS_DIR.mkdir(exist_ok=True)"""


def nb(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def md(text):
    return {"cell_type": "markdown", "metadata": {},
            "source": text.splitlines(keepends=True)}


def code(text):
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [], "source": text.splitlines(keepends=True)}


NOTEBOOKS = {
    "train_gpmdm.ipynb": [
        md("# Train a GPMDM\n\nMirror of the reference's "
           "`notebooks/train_gpmdm.ipynb` (cells 0-8) on the TPU-native "
           "framework: load walk/run trials, fit a 2-class GPMDM with "
           "jitted Adam, save the checkpoint, inspect NMSE diagnostics, "
           "plot the latent space, and roll the learned dynamics forward."),
        code(SETUP),
        code("""\
# Training data: CMU walk/run trials (35 DOFs, 120->30 fps) when mocap/
# is present (tools/fetch_cmu.py), else the synthetic limit-cycle stand-in
import numpy as np
from examples.train_gpmdm import load_training_data
data, D, d = load_training_data()
print(f"{len(data)} sequences, D={D} dims, latent d={d}")"""),
        code("""\
from gpmdm_tpu import GPMDM
m = GPMDM(D=D, d=d, n_classes=2, dtype="float32",
          y_sigma_n_init=0.1, x_sigma_n_init=0.1)
for arr, label in data:
    m.add_data(arr, label)
m.init_X()"""),
        code("""\
losses = m.train_adam(num_opt_steps=500, num_print_steps=50, lr=0.01)
print(f"final loss {losses[-1]:.4e}")"""),
        code("""\
ckpt = MODELS_DIR / "gpmdm.npz"
m.save(str(ckpt))
print("saved", ckpt)"""),
        code("""\
# NMSE diagnostics (reference cell 7; pass floored=True to reproduce the
# reference's integer-division quirk)
*_, nmse = m.get_latent_map_performance()
print(f"latent map NMSE {nmse:.3f}")
for c in range(2):
    *_, nm = m.get_dynamics_map_performance_for_class(c)
    print(f"dynamics map NMSE class {c}: {nm:.3f}")"""),
        code("""\
# Latent space + loss curve (reference cells 5-6)
import matplotlib.pyplot as plt
from gpmdm_tpu.viz import plot_latent_space, plot_loss_history
plot_loss_history(losses)
plot_latent_space(m, class_names=["walk", "run"])
plt.show()"""),
        code("""\
# Autoregressive rollout along each class's learned limit cycle (cell 8)
for c in range(2):
    x0 = np.asarray(m.get_X_for_class(c))[0]
    traj = np.asarray(m.rollout(x0, 100, c))
    plt.plot(traj[:, 0], traj[:, 1], label=f"class {c}")
plt.legend(); plt.title("mean rollout"); plt.show()"""),
    ],
    "test_gpmdm_pf.ipynb": [
        md("# Evaluate the switching particle filter\n\nMirror of "
           "`notebooks/test_gpmdm_pf.ipynb`: stream every held-out trial "
           "through `GPMDM_PF`, collect per-frame / per-trial confusion "
           "matrices, accuracy, precision, recall, F1, and throughput."),
        code(SETUP),
        code("""\
import numpy as np
from gpmdm_tpu import GPMDM, GPMDM_PF
m = GPMDM.load(str(MODELS_DIR / "gpmdm.npz"))"""),
        code("""\
from examples.test_gpmdm_pf import load_test_data
trials, labels = load_test_data()
print(len(trials), "test trials")"""),
        code("""\
# Reference cell 3: T = [[.9,.1],[.1,.9]], 100 particles (10_000 runs
# just as fast on a TPU chip — the bench default)
flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=10_000, seed=0)"""),
        code("""\
from gpmdm_tpu.utils.metrics import evaluate_pf
report = evaluate_pf(flt, trials, labels, n_classes=2, burn_in=5)
print(report.summary())"""),
    ],
    "view_gpmdm_pf.ipynb": [
        md("# Visualize a particle-filter run\n\nMirror of "
           "`notebooks/view_gpmdm_pf.ipynb`: run the filter over one "
           "trial, record the latent state-mean trajectory, render the "
           "side-by-side skeleton + latent animation GIF, and write the "
           "interactive 3D latent widget (the plotly analogue here is a "
           "zero-dependency HTML canvas renderer, `viz/html3d.py`)."),
        code(SETUP),
        code("""\
import numpy as np
from gpmdm_tpu import GPMDM, GPMDM_PF
m = GPMDM.load(str(MODELS_DIR / "gpmdm.npz"))
flt = GPMDM_PF(m, [[0.9, 0.1], [0.1, 0.9]], num_particles=1000, seed=0)"""),
        code("""\
from examples.test_gpmdm_pf import load_test_data
trials, labels = load_test_data()
Z = np.asarray(trials[0])
outs = flt.run(Z)
traj = np.asarray(outs.state_mean)
pred = np.asarray(outs.most_likely_class)
print("trajectory", traj.shape, "majority class", np.bincount(pred).argmax())"""),
        code("""\
# Side-by-side animation GIF (reference cell 8) — the example script
# carries the FuncAnimation plumbing
import subprocess
subprocess.run([sys.executable, str(ROOT / "examples/view_gpmdm_pf.py"),
                str(MODELS_DIR / "gpmdm.npz"), "--out", str(ROOT / "pf_demo.gif"),
                "--particles", "1000"], check=True)"""),
        code("""\
# Interactive 3D latent plot with the filter trajectory (reference cell 7)
from gpmdm_tpu.viz.html3d import write_latent_html
write_latent_html(m, str(ROOT / "latent3d.html"), trajectory=traj)
print("open latent3d.html in a browser")"""),
    ],
    "load_gpmdm.ipynb": [
        md("# Load and inspect a trained model\n\nMirror of "
           "`notebooks/load_gpmdm.ipynb`: load a checkpoint and plot the "
           "per-class latent embeddings (matplotlib + interactive HTML)."),
        code(SETUP),
        code("""\
from gpmdm_tpu import GPMDM
m = GPMDM.load(str(MODELS_DIR / "gpmdm.npz"))
print(f"D={m.D} d={m.d} classes={m.n_classes}")"""),
        code("""\
import matplotlib.pyplot as plt
from gpmdm_tpu.viz import plot_latent_space
plot_latent_space(m, class_names=["walk", "run"])
plt.show()"""),
        code("""\
from gpmdm_tpu.viz.html3d import write_latent_html
write_latent_html(m, str(ROOT / "latent3d.html"))
print("open latent3d.html in a browser")"""),
    ],
    "joints.ipynb": [
        md("# Skeleton exploration\n\nMirror of `notebooks/joints.ipynb`: "
           "parse a subject's ASF skeleton, list the joints, render the "
           "zero pose and a perturbed pose, and export a motion GIF.  "
           "Uses the bundled tiny fixture when the CMU download is "
           "absent."),
        code(SETUP),
        code("""\
from examples.joints import find_data
asf_path, amc_path = find_data()
print(asf_path, amc_path)"""),
        code("""\
# Joint listing (reference cell 2)
from gpmdm_tpu.data.amc_asf import parse_asf, parse_amc
skel = parse_asf(asf_path)
motion = parse_amc(amc_path, skel)
print(len(skel.names), "joints;", len(motion), "frames")
for name, parent in zip(skel.names, skel.parent):
    print(f"  {name} <- {skel.names[parent] if parent >= 0 else '(root)'}")"""),
        code("""\
# Zero pose, perturbed pose, and the animation GIF (reference cells 3-5)
# — the example script carries the rendering plumbing
import subprocess
subprocess.run([sys.executable, str(ROOT / "examples/joints.py"),
                "--out-dir", str(ROOT)], check=True)
print("wrote zero/perturbed pose PNGs + skeleton GIF into", ROOT)"""),
    ],
    "deploy_gpmdm.ipynb": [
        md("# Deploy a trained GPMDM\n\nFramework-original guide (no "
           "reference counterpart): pick the serving posterior for a "
           "trained model — exact, low-rank **compressed**, or post-hoc "
           "SGPR **distilled** — arbitrated by a held-out accuracy guard, "
           "then bake the winner into the checkpoint so production loads "
           "deploy with zero host precompute.  Full measured guidance: "
           "`docs/DEPLOY.md` / `docs/BENCHMARKS.md`."),
        code(SETUP),
        code("""\
# A trained exact model: the repo's committed headline asset (instant),
# else train a small one on the synthetic limit cycles
import numpy as np
from gpmdm_tpu import GPMDM
asset = ROOT / "bench_assets" / "bench_model.npz"
if asset.exists():
    m = GPMDM.load(str(asset))
else:
    from gpmdm_tpu.data import synthetic
    tr, tl, *_ = synthetic.make_dataset(n_classes=2, n_train_seqs=4,
                                        n_test_seqs=1, seq_len=60, D=35, seed=0)
    m = GPMDM(D=35, d=2, n_classes=2, dtype="float32",
              y_sigma_n_init=0.1, x_sigma_n_init=0.1)
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    m.train_adam(num_opt_steps=300, lr=0.01)
print(f"Ny={m.layout.Ny} training frames, D={m.D}, C={m.n_classes}")"""),
        code("""\
# The three deployment posteriors.  'auto' (what GPMDM_PF defaults to)
# picks exact below Ny=1024 and compressed above; distillation is the
# explicit serving knob (star kernel (M, P) instead of (Ny, P) per frame)
from gpmdm_tpu.filter.particle_filter import resolve_posterior
posts = {
    "auto": resolve_posterior(m, "auto"),
    "compressed": m.compressed_posterior(),
    "distilled-M128": m.sparsified_posterior(128, method="kmeans"),
}
for name, p in posts.items():
    print(f"{name:>16}: {type(p).__name__}")"""),
        code("""\
# Guard-arbitrate: stream held-out labeled trials through each posterior
# with the SAME filter config and compare accuracy (docs/DEPLOY.md —
# every perf knob in this framework is adopted or rejected this way)
from gpmdm_tpu import PFConfig
from gpmdm_tpu.data import synthetic
from gpmdm_tpu.utils.metrics import evaluate_pf_banked
_, _, q_seqs, q_labels = synthetic.make_dataset(
    n_classes=2, n_train_seqs=4, n_test_seqs=6, seq_len=60, D=m.D, seed=0)
pfc = PFConfig(num_particles=500)
for name, p in posts.items():
    rep = evaluate_pf_banked(m, [[0.9, 0.1], [0.1, 0.9]],
                             [np.asarray(s) for s in q_seqs], q_labels,
                             burn_in=5, seed=0, config=pfc, posterior=p)
    fm = rep.frame_metrics
    print(f"{name:>16}: frame acc {fm['accuracy']:.4f}  f1 {fm['f1']:.4f}")"""),
        code("""\
# Bake the chosen deployment into the checkpoint: save() persists the
# compressed cache, distilled factors, and sparse posteriors, so a
# production load never redoes the O(N^3)/O(N M^2) host work
# (CLI equivalents: python -m gpmdm_tpu deploy ckpt --sparsify 128
#  --sparsify-method kmeans; grid selection: tools/eval_asset_guard.py
#  --sparsify-grid 64,128 --bar 0.99 --bake)
ckpt = MODELS_DIR / "gpmdm_deployed.npz"
m.save(str(ckpt))
m2 = GPMDM.load(str(ckpt))
sp = m2.sparsified_posterior(128, method="kmeans")  # cache hit: instant
print("reloaded; distilled factors present:", sp.Zy.shape,
      "| exact build still deferred:", m2._posterior is None)"""),
        md("Serving knobs worth knowing (each measured, each behind the "
           "same guard discipline): `PFConfig(quad_precision='high')` — "
           "MXU variance path for sparse/distilled backends, +30% on "
           "banked/multi-class shapes; `fuse_mean_quad='auto'` — single-"
           "matmul mean+variance at C<=2; `pf_scan_bank` / `eval "
           "--banked` — many filters in one compiled dispatch (38.8k "
           "aggregate fps at 64x1k distilled on one v5e chip).  See "
           "`docs/DEPLOY.md` for the regime table."),
    ],
}


def main() -> None:
    out_dir = REPO / "notebooks"
    out_dir.mkdir(exist_ok=True)
    for name, cells in NOTEBOOKS.items():
        path = out_dir / name
        path.write_text(json.dumps(nb(cells), indent=1) + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
