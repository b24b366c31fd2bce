"""Deployment-asset accuracy guard: one protocol, three consumers.

The held-out banked-guard protocol (synthetic trials from the SAME
generator configuration the asset was trained on, streamed through
:func:`gpmdm_tpu.utils.metrics.evaluate_pf_banked`) is the repo's
arbiter for every deployment decision: checkpoint-cut selection
(tools/eval_asset_guard.py), large-N bench rows (tools/bench_pf_largeN.py)
and — since round 5 — the CI floor on every committed bench asset
(tests/test_bench_assets.py), so a bad bake fails the suite instead of
surfacing a round later in the driver's TPU run (round-4 post-mortem:
commit 49a2305 shipped an hourlong asset that scored 0.46 on a 2-class
task through 233 green tests).

The reference validates deployments the same way — measured frame
accuracy/F1 on held-out trials (test_gpmdm_pf.ipynb cell 5) — this
module is that cell as a reusable function.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# config name -> guard shape [must match tools/train_bench_assets.py so
# the held-out guard trials are the right distribution].  guard_len
# overrides the test-trial length (the class-cycle parameters are
# deterministic in the class index, so shorter guard trials draw from
# the same distribution — needed for the 27k-frame hour-long config).
# guard_banks caps filters per dispatch: the banked per-class kernel
# tensor is (B, C, n_max, P) — ~0.4 GB/bank at the c8n5120 shape.
SHAPES = {
    # headline-scale guard shapes (same protocol the bench guard uses);
    # the *f names are the frozen-noise retrain sweeps of the committed
    # bench_model{,_d4,_c8} assets (train_bench_assets.py)
    "headlinef": dict(family="exact", n_seqs=4, seq_len=60),
    "d4f": dict(family="exact", n_seqs=4, seq_len=60, d=4),
    "c8f": dict(family="exact", n_seqs=2, seq_len=60, C=8, D=10,
                data=dict(center_spread=3.0, class_signature=1.0,
                          seed=21)),
    # the committed bench_model_c8.npz (same task/guard protocol as c8f)
    "c8": dict(family="exact", n_seqs=2, seq_len=60, C=8, D=10,
               data=dict(center_spread=3.0, class_signature=1.0,
                         seed=21)),
    "n2048": dict(family="exact", n_seqs=16, seq_len=64),
    "n5120": dict(family="exact", n_seqs=32, seq_len=80),
    "sparse10240": dict(family="sparse", n_seqs=64, seq_len=80),
    "c8n5120": dict(family="exact", n_seqs=8, seq_len=80, C=8, D=10,
                    guard_banks=16,
                    data=dict(center_spread=3.0, class_signature=1.0,
                              seed=21)),
    "hourlong": dict(family="sparse", n_seqs=2, seq_len=27_000,
                     guard_len=600),
}


def guard_trials(config_name: str):
    """Held-out labeled guard trials + transition matrix for a config.

    Returns ``(seqs, labels, T_matrix)``: 6 test sequences per class from
    the config's generator (train split untouched — n_train_seqs=1 only
    seeds the split the same way the selection tools always have).
    """
    from ..data import synthetic

    shape = SHAPES[config_name]
    C = shape.get("C", 2)
    D = shape.get("D", 35)
    data_kw = shape.get("data", dict(seed=0))
    guard_len = shape.get("guard_len", shape["seq_len"])
    _, _, q_seqs, q_labels = synthetic.make_dataset(
        n_classes=C, n_train_seqs=1, n_test_seqs=6, seq_len=guard_len,
        D=D, **data_kw,
    )
    T = np.full((C, C), 0.1 / (C - 1), dtype=np.float64)
    np.fill_diagonal(T, 0.9)
    return [np.asarray(s) for s in q_seqs], q_labels, T


def guard_score(
    model,
    config_name: str,
    particles: int = 500,
    posterior=None,
    seed: int = 0,
) -> Tuple[float, float]:
    """(frame accuracy, frame F1) of ``model`` under the guard protocol.

    ``posterior=None`` scores the model's OWN posterior; pass
    ``resolve_posterior(model, 'auto')`` to score the deployment path a
    loaded checkpoint actually serves through.
    """
    from ..filter.particle_filter import PFConfig
    from .metrics import evaluate_pf_banked

    seqs, labels, T = guard_trials(config_name)
    rep = evaluate_pf_banked(
        model, T, seqs, labels, burn_in=5, seed=seed,
        config=PFConfig(num_particles=particles),
        max_banks=SHAPES[config_name].get("guard_banks"),
        posterior=posterior,
    )
    return rep.frame_metrics["accuracy"], rep.frame_metrics["f1"]


def params_fingerprint(params) -> str:
    """sha256 over the parameter leaves (deterministic field order).

    The fingerprint binds a measured guard score to the EXACT parameters
    it was measured on: a checkpoint re-bake invalidates the stored
    receipt unless the guard is re-run (the round-4 hourlong regression
    shipped because nothing enforced this).
    """
    import dataclasses
    import hashlib

    h = hashlib.sha256()
    for f in dataclasses.fields(params):
        leaf = np.asarray(getattr(params, f.name))
        h.update(f.name.encode())
        h.update(str(leaf.shape).encode())
        h.update(np.ascontiguousarray(leaf).tobytes())
    return h.hexdigest()


def make_receipt(model, config_name: str, particles: int,
                 acc: float, f1: float) -> dict:
    """Guard receipt dict for ``model._guard_receipt`` (persisted in the
    checkpoint meta by utils/io.save_model)."""
    import jax

    return {
        "platform": jax.devices()[0].platform,
        "config": config_name,
        "particles": int(particles),
        "frame_acc": round(float(acc), 4),
        "frame_f1": round(float(f1), 4),
        "params_sha256": params_fingerprint(model.params),
    }


def load_asset(path: str):
    """Load a bench asset with the right model class (meta model_class)."""
    import json
    import numpy as _np

    from ..models.gpmdm import GPMDM
    from ..models.sparse_gpmdm import SparseGPMDM

    with _np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["meta_json"]).decode())
    cls = SparseGPMDM if meta.get("model_class") == "SparseGPMDM" else GPMDM
    return cls.load(path)
