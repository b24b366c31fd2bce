"""Execute every notebooks/*.ipynb end to end on CPU (not just compile).

tests/test_notebooks.py keeps the suite fast by compiling cells and
resolving imports; this tool actually RUNS them in dependency order
(train first — the others load models/gpmdm.npz it saves), catching
runtime breaks like the Motion.__len__ gap it first flagged.  ~8 min on
CPU (500 Adam steps + PF runs + GIF renders).

Run: python tools/run_notebooks.py  [names...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

ORDER = [
    "train_gpmdm.ipynb",   # writes models/gpmdm.npz for the rest
    "test_gpmdm_pf.ipynb",
    "view_gpmdm_pf.ipynb",
    "load_gpmdm.ipynb",
    "joints.ipynb",
    "deploy_gpmdm.ipynb",
]


def main() -> None:
    import os

    # Inherited by notebook cells that spawn subprocesses (view_gpmdm_pf
    # cell 4 runs examples/view_gpmdm_pf.py via subprocess.run): without
    # it the child lands on the TPU tunnel and pays a 20 min+ uncached
    # compile for a demo GIF.  gpmdm_tpu/__init__ honors the variable.
    os.environ["GPMDM_TPU_PLATFORM"] = "cpu"
    # child processes also share the persistent CPU compile cache
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    import matplotlib

    matplotlib.use("Agg")
    import os

    os.chdir(REPO / "notebooks")
    names = sys.argv[1:] or ORDER
    for name in names:
        nb = json.loads(Path(name).read_text())
        g: dict = {}
        t0 = time.time()
        for i, cell in enumerate(nb["cells"]):
            if cell["cell_type"] != "code":
                continue
            src = "".join(cell["source"])
            exec(compile(src, f"{name}:cell{i}", "exec"), g)  # noqa: S102
        print(f"{name}: OK ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
