"""Model inspection — script form of the reference's
``notebooks/load_gpmdm.ipynb``: load a checkpoint and plot the per-class
latent embeddings (matplotlib static plot and/or the interactive 3D HTML
widget, the plotly-parity artifact of the reference's cell 2).

Usage: python examples/load_gpmdm.py models/gpmdm.npz [--save latent.png]
                                                      [--html latent.html]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gpmdm_tpu import GPMDM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--save", default=None)
    ap.add_argument("--html", default=None,
                    help="write an interactive 3D latent plot (standalone HTML)")
    args = ap.parse_args()

    model = GPMDM.load(args.ckpt)
    print(f"{type(model).__name__}: D={model.D} d={model.d} classes={model.n_classes}")
    print(f"loss: {model.gpdm_loss():.4e}")
    for c in range(model.n_classes):
        print(f"class {c}: {model.get_X_for_class(c).shape[0]} latent points")

    if args.html:
        from gpmdm_tpu.viz.html3d import write_latent_html

        write_latent_html(model, args.html)
        print(f"wrote {args.html}")

    import matplotlib

    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gpmdm_tpu.viz import plot_latent_space

    plot_latent_space(model)
    if args.save:
        plt.savefig(args.save, dpi=120)
        print(f"wrote {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
