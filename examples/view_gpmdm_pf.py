"""PF demo animation — script form of the reference's
``notebooks/view_gpmdm_pf.ipynb``.

Runs the particle filter over one trial, records the latent state-mean
trajectory, and renders a side-by-side animation: skeleton (when CMU data is
present) next to the latent-space trajectory over the training manifold
(reference cells 7-8).  Writes a GIF.

Usage: python examples/view_gpmdm_pf.py models/gpmdm.npz [--out pf_demo.gif]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gpmdm_tpu import GPMDM, GPMDM_PF
from gpmdm_tpu.data import registry, synthetic
from gpmdm_tpu.data.joints import WALKING_SIMPLIFIED_JOINTS

DOWNSAMPLE = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--out", default="pf_demo.gif")
    ap.add_argument("--particles", type=int, default=100)
    args = ap.parse_args()

    model = GPMDM.load(args.ckpt)

    positions = None
    if registry.available():
        mc = registry.load_trials({2: [1]})[0]  # subject 02 trial 01 (walk)
        Z = mc.select_joints(WALKING_SIMPLIFIED_JOINTS)[::DOWNSAMPLE]
        positions = mc.positions()[::DOWNSAMPLE]
    else:
        print("CMU mocap not found - latent-only animation on synthetic data")
        _, _, te, _ = synthetic.make_dataset(
            n_classes=2, n_train_seqs=4, n_test_seqs=1, seq_len=80,
            D=model.D, seed=0,
        )
        Z = te[0]

    flt = GPMDM_PF(model, [[0.9, 0.1], [0.1, 0.9]], num_particles=args.particles)
    outs = flt.run(np.asarray(Z))
    traj = np.asarray(outs.state_mean)  # (T, d)
    probs = np.asarray(outs.class_probs)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    from gpmdm_tpu.viz.latent import plot_latent_space
    from gpmdm_tpu.viz.skeleton_plot import draw_positions

    ncols = 2 if positions is not None else 1
    fig = plt.figure(figsize=(6 * ncols, 5))
    ax_lat = fig.add_subplot(1, ncols, ncols, projection="3d" if model.d >= 3 else None)
    ax_sk = fig.add_subplot(1, 2, 1, projection="3d") if positions is not None else None
    parent = mc.skeleton.parent if positions is not None else None

    def update(t):
        ax_lat.clear()
        plot_latent_space(model, ax=ax_lat, class_names=["walk", "run"])
        seg = traj[: t + 1]
        if model.d >= 3 and hasattr(ax_lat, "plot3D"):
            ax_lat.plot(seg[:, 0], seg[:, 1], seg[:, 2], "k-", lw=2)
        else:
            ax_lat.plot(seg[:, 0], seg[:, 1], "k-", lw=2)
        ax_lat.set_title(
            f"frame {t}  P(walk)={probs[t][0]:.2f} P(run)={probs[t][1]:.2f}"
        )
        if ax_sk is not None:
            ax_sk.clear()
            draw_positions(positions[t], parent, ax=ax_sk)

    anim = FuncAnimation(fig, update, frames=len(traj), interval=33)
    anim.save(args.out, writer="pillow")
    print(f"wrote {args.out} ({len(traj)} frames)")


if __name__ == "__main__":
    main()
