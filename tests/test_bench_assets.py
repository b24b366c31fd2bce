"""Committed bench-asset deployment pins.

The round-3 persistence work guarantees that a loaded checkpoint deploys
WITHOUT redoing any O(N^3) host work: checkpoints carry the compressed
cache / sparse factors, ``GPMDM.load`` defers the exact posterior build
(``GPMDM.posterior`` property), and ``resolve_posterior('auto')`` decides
from static model info.  That is what turned c8n5120 checkpoint->filter
from 70 s into 0.4 s (docs/BENCHMARKS.md).  These tests pin the guarantee
on the ACTUAL committed assets bench.py loads, so a regression in the
persistence layer cannot hide until the driver's TPU bench run.
"""

from __future__ import annotations

import os
import warnings

import pytest

from gpmdm_tpu import GPMDM, SparseGPMDM
from gpmdm_tpu.filter import particle_filter as pf
from gpmdm_tpu.models import compressed as compressed_mod
from gpmdm_tpu.models import core as core_mod

ASSETS = os.path.join(os.path.dirname(__file__), os.pardir, "bench_assets")


def _asset(name: str) -> str:
    path = os.path.abspath(os.path.join(ASSETS, name))
    if not os.path.exists(path):
        pytest.skip(f"committed asset {name} missing")
    return path


# ---------------------------------------------------------------- receipts
#
# Measured-accuracy receipts (round-5, VERDICT r4 #2): every committed
# asset carries a guard receipt (tools/eval_asset_guard.py --stamp) —
# frame accuracy measured through the asset's DEPLOYMENT posterior path,
# bound to a sha256 of the exact parameters it was measured on.  A
# re-bake that changes parameters without re-running the measured guard
# fails CI here (the round-4 hourlong regression shipped exactly that
# way: params swapped inside an unrelated commit, 233 green tests, TPU
# bench found 0.4611 a round later).  TPU-required entries pin the
# backend too: that same broken cut scores 0.9999 on the CPU guard — a
# CPU floor alone can NOT catch a TPU-only degradation.
RECEIPT_FLOORS = {
    # file -> (min receipt frame_acc, required platform or None)
    "bench_model.npz": (0.90, "tpu"),
    "bench_model_d4.npz": (0.90, "tpu"),
    "bench_model_c8.npz": (0.95, "tpu"),
    "bench_model_c8n5120.npz": (0.97, "tpu"),
    "bench_model_hourlong.npz": (0.99, "tpu"),
    # round-5 upgrade: the L-BFGS s20 cut (guard 0.9847) replaced the
    # Adam hyperprior plateau cut (0.8499) — BENCHMARKS "TPU-f32 arms"
    "bench_model_hourlongh.npz": (0.95, "tpu"),
    "bench_model_headlinef.npz": (0.93, None),
    "bench_model_d4f.npz": (0.78, None),
    "bench_model_n2048.npz": (0.96, None),
    "bench_model_n5120.npz": (0.96, None),
    "bench_model_sparse10240.npz": (0.88, None),
}


@pytest.mark.parametrize("name", sorted(RECEIPT_FLOORS))
def test_asset_guard_receipt(name):
    from gpmdm_tpu.utils.asset_guard import load_asset, params_fingerprint

    floor, platform = RECEIPT_FLOORS[name]
    m = load_asset(_asset(name))
    rcpt = getattr(m, "_guard_receipt", None)
    assert rcpt, (
        f"{name} has no guard receipt: committed assets must be stamped "
        "with a measured banked-guard score "
        "(tools/eval_asset_guard.py --stamp [--tpu])"
    )
    assert rcpt["params_sha256"] == params_fingerprint(m.params), (
        f"{name}: parameters changed since the guard receipt was measured "
        "— re-run tools/eval_asset_guard.py --stamp on the deployment "
        "backend before committing"
    )
    assert rcpt["frame_acc"] >= floor, (
        f"{name}: receipt frame_acc {rcpt['frame_acc']} below the "
        f"{floor} floor"
    )
    if platform is not None:
        assert rcpt["platform"] == platform, (
            f"{name}: receipt measured on {rcpt['platform']!r}; this "
            f"deployment asset requires a {platform!r}-measured guard "
            "(round-4: CPU 0.9999 vs TPU 0.4611 on the same cut)"
        )


def test_guard_receipt_roundtrip(tmp_path):
    """A stamped receipt survives save/load, and the params fingerprint
    actually detects a parameter change (the whole point)."""
    import dataclasses

    import jax.numpy as jnp

    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.utils.asset_guard import make_receipt, params_fingerprint

    tr, lb, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=1, n_test_seqs=1, seq_len=12, D=6, seed=3
    )
    m = GPMDM(D=6, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, lb):
        m.add_data(Y, c)
    m.init_X()
    m._guard_receipt = make_receipt(m, "headlinef", 500, 0.97, 0.96)
    path = tmp_path / "r.npz"
    m.save(path)
    m2 = GPMDM.load(path)
    assert m2._guard_receipt == m._guard_receipt
    assert m2._guard_receipt["params_sha256"] == params_fingerprint(m2.params)
    # any parameter perturbation invalidates the fingerprint
    m2.params = dataclasses.replace(
        m2.params, y_log_sigma_n=m2.params.y_log_sigma_n + 1e-6
    )
    assert m2._guard_receipt["params_sha256"] != params_fingerprint(m2.params)


def test_asset_live_cpu_guard_floor():
    """Live banked-guard score (small P, CPU) on the two fastest assets:
    catches guard-protocol or deployment-path breakage that a stored
    receipt cannot (receipts only bind params, not code)."""
    from gpmdm_tpu.utils.asset_guard import guard_score, load_asset

    for name, floor in [("bench_model.npz", 0.95),
                        ("bench_model_d4.npz", 0.90)]:
        m = load_asset(_asset(name))
        acc, _ = guard_score(m, "headlinef" if "d4" not in name else "d4f",
                             particles=300)
        assert acc >= floor, f"{name}: live CPU guard {acc} < {floor}"


def test_c8n5120_deploys_from_baked_cache_without_host_builds(monkeypatch):
    """The large-N exact-family asset must deploy 'auto' from persisted
    state: no exact O(N^3) precompute, no fresh eigendecomposition, no
    re-distillation.  This asset carries a guard-baked sparsified
    recommendation (M=384 kmeans, TPU guard 1.0 — round-3 bake), so 'auto'
    must return those persisted factors, not the threshold-policy
    compressed posterior."""
    from gpmdm_tpu.models import sparse as sparse_mod

    m = GPMDM.load(_asset("bench_model_c8n5120.npz"))
    # the load itself must be lazy: exact posterior deferred, caches baked
    assert m._posterior is None
    assert getattr(m, "_posterior_pending", False)
    assert getattr(m, "_compressed_cache", None), "baked compressed cache missing"
    rec = getattr(m, "_deploy_recommendation", None)
    assert rec and rec["family"] == "sparsified" and rec["M"] == 384

    def _boom(*a, **k):  # pragma: no cover - fires only on regression
        raise AssertionError("O(N^3)/host build ran during deployment")

    monkeypatch.setattr(core_mod, "precompute_host", _boom)
    monkeypatch.setattr(compressed_mod, "compress_host", _boom)
    monkeypatch.setattr(sparse_mod, "distill_host", _boom)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        post = pf.resolve_posterior(m, "auto")
    assert type(post).__name__ == "SparsePosterior"
    assert post.Zy.shape[0] == 384
    assert m._posterior is None  # exact build still deferred


def test_hourlong_sparse_asset_deploys_as_is(monkeypatch):
    """The sparse-family asset's posterior is its own deployment: 'auto'
    must return it without any exact-family compression machinery."""
    m = SparseGPMDM.load(_asset("bench_model_hourlong.npz"))
    assert m.layout.Ny == 108_000
    assert not m._deploys_core_posterior

    def _boom(*a, **k):  # pragma: no cover - fires only on regression
        raise AssertionError("host build ran during sparse deployment")

    monkeypatch.setattr(compressed_mod, "compress_host", _boom)
    post = pf.resolve_posterior(m, "auto")
    assert post is m.posterior


def test_headline_asset_deploys_exact():
    """Small-N (Ny=480) stays on the exact posterior under 'auto'."""
    m = GPMDM.load(_asset("bench_model.npz"))
    post = pf.resolve_posterior(m, "auto")
    assert post is m.posterior
    assert type(post).__name__ == "Posterior"


def test_baked_sparsified_deployments_present(monkeypatch):
    """bench.py's distilled sections look up SPECIFIC sparsified cache keys
    in the committed assets; a re-save that drops one would silently make
    the bench re-distill on the fly (and, for the kmeans bakes, possibly
    with different centroids if the k-means code drifted).  Pin the exact
    keys, and that fetching them runs no host distillation."""
    from gpmdm_tpu.models import sparse as sparse_mod

    expected = {
        "bench_model.npz": (128, None),              # banked section, stride
        "bench_model_c8.npz": (128, None, "kmeans"),
        "bench_model_c8n5120.npz": (384, None, "kmeans"),
        "bench_model_n5120.npz": (128, None),
        "bench_model_n2048.npz": (128, None),
    }

    def _boom(*a, **k):  # pragma: no cover - fires only on regression
        raise AssertionError("distill_host ran: baked factors missing")

    monkeypatch.setattr(sparse_mod, "distill_host", _boom)
    for name, key in expected.items():
        m = GPMDM.load(_asset(name))
        cache = getattr(m, "_sparsified_cache", None) or {}
        assert key in cache, f"{name}: baked sparsified key {key} missing"
        kw = {"n_inducing_y": key[0]}
        if len(key) == 3:
            kw["method"] = key[2]
        post = m.sparsified_posterior(**kw)
        assert type(post).__name__ == "SparsePosterior"
        assert post.Zy.shape[0] == key[0]


def test_bench_emit_helpers_importable():
    """The bench emit path must not be able to crash AFTER measurement:
    round 5's first driver-style run lost a complete measurement to a
    NameError inside _load_prev_bench (missing module-level os import) —
    the JSON line is the bench's entire product, so everything the tail
    touches gets exercised here on CPU."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.abspath(os.path.join(ASSETS, os.pardir, "bench.py")),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # import-time code only; main() is gated
    prev = mod._load_prev_bench()
    # a committed BENCH_r*.json exists in the repo -> helper must parse it
    assert prev is not None and isinstance(prev, dict)
    assert any(k.endswith("_acc") for k in prev)
