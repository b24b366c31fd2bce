"""Test configuration.

Tests run on CPU with 8 virtual devices (the standard JAX fake-multi-device
mechanism) so sharding/pjit paths are exercised without TPU hardware, and
with x64 enabled so float64 oracle comparisons against the reference math are
meaningful.
"""

import os

# Force CPU even when the session environment points JAX at a TPU tunnel:
# unit tests want x64 + 8 virtual devices, which only the host platform
# provides.  NOTE: a sitecustomize registers the TPU plugin at interpreter
# start and the JAX_PLATFORMS env var is ignored after that — the only
# effective override is jax.config (verified: env-only override left the
# whole suite silently running on 1 TPU device).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: most test time is XLA compiles; reuse them
# across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# Exclude XLA:CPU AOT kernel caches from the persisted entries: their
# feature negotiation treats compile-time prefs (+prefer-no-scatter/
# -gather) as required host CPU features, so loads warn about a machine
# mismatch on the SAME machine — and twice segfaulted the full suite
# inside serialize/deserialize (CLAUDE.md round-4 post-mortem).  The
# JAX-level executable cache (the actual compile-time saver) remains on.
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
