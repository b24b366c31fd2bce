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
