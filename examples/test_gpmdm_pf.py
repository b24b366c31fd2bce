"""Particle-filter evaluation — script form of the reference's
``notebooks/test_gpmdm_pf.ipynb``.

Streams every held-out trial through GPMDM_PF (T = [[.9,.1],[.1,.9]], 100
particles by default), printing per-frame / per-trial confusion matrices,
accuracy / precision / recall / F1, and throughput (reference cells 4-5).

Usage: python examples/test_gpmdm_pf.py models/gpmdm.npz [--particles 100]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gpmdm_tpu import GPMDM, GPMDM_PF
from gpmdm_tpu.data import registry, synthetic
from gpmdm_tpu.data.joints import WALKING_SIMPLIFIED_JOINTS
from gpmdm_tpu.utils.metrics import evaluate_pf

DOWNSAMPLE = 4


def load_test_data():
    if registry.available():
        walk = registry.load_trials(registry.WALK_TRIAL_IDS_TEST)
        run = registry.load_trials(registry.RUN_TRIAL_IDS_TEST)
        seqs, labels = [], []
        for label, trials in ((0, walk), (1, run)):
            for mc in trials:
                seqs.append(mc.select_joints(WALKING_SIMPLIFIED_JOINTS)[::DOWNSAMPLE])
                labels.append(label)
        return seqs, labels
    print("CMU mocap not found - using synthetic limit cycles")
    _, _, te, tel = synthetic.make_dataset(
        n_classes=2, n_train_seqs=4, n_test_seqs=6, seq_len=80, D=12, seed=0
    )
    return te, tel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--particles", type=int, default=100)
    ap.add_argument("--banked", action="store_true",
                    help="stream ALL trials in one compiled dispatch")
    args = ap.parse_args()

    model = GPMDM.load(args.ckpt)
    seqs, labels = load_test_data()
    T = [[0.9, 0.1], [0.1, 0.9]]
    if args.banked:
        from gpmdm_tpu.utils.metrics import evaluate_pf_banked

        report = evaluate_pf_banked(
            model, T, [np.asarray(s) for s in seqs], labels,
            num_particles=args.particles,
        )
    else:
        flt = GPMDM_PF(model, T, num_particles=args.particles)
        report = evaluate_pf(
            flt, [np.asarray(s) for s in seqs], labels, n_classes=2
        )
    print(report.summary())


if __name__ == "__main__":
    main()
