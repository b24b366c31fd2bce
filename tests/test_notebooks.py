"""The notebooks/ entry points (mirrors of the reference's five
notebooks, plus the framework-original deployment guide) must stay valid: parseable ipynb JSON, compilable code cells,
and references only to symbols that actually exist."""

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
NB_DIR = REPO / "notebooks"
EXPECTED = [
    "deploy_gpmdm.ipynb",
    "train_gpmdm.ipynb",
    "test_gpmdm_pf.ipynb",
    "view_gpmdm_pf.ipynb",
    "load_gpmdm.ipynb",
    "joints.ipynb",
]


def test_all_reference_notebooks_are_mirrored():
    assert sorted(p.name for p in NB_DIR.glob("*.ipynb")) == sorted(EXPECTED)


@pytest.mark.parametrize("name", EXPECTED)
def test_notebook_code_cells_compile(name):
    nb = json.loads((NB_DIR / name).read_text())
    assert nb["nbformat"] == 4
    n_code = 0
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        n_code += 1
        src = "".join(cell["source"])
        compile(src, f"{name}:cell{i}", "exec")  # raises on syntax errors
    assert n_code >= 3


@pytest.mark.parametrize("name", EXPECTED)
def test_notebook_imports_resolve(name):
    """Every `from X import Y` in a notebook names a real symbol."""
    import importlib
    import re
    import sys

    sys.path.insert(0, str(REPO))
    nb = json.loads((NB_DIR / name).read_text())
    src = "\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    )
    for mod_name, names in re.findall(
        r"^from ([\w.]+) import ([\w, ]+)$", src, re.M
    ):
        if mod_name in ("pathlib",):
            continue
        mod = importlib.import_module(mod_name)
        for sym in (s.strip() for s in names.split(",")):
            assert hasattr(mod, sym), f"{name}: {mod_name}.{sym} missing"
