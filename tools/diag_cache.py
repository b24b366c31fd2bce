"""Diagnose the persistent-compile-cache miss across processes (VERDICT r2 #1).

BENCH_r02 paid 174 s of compile in a process whose predecessor had
populated /tmp/jax_bench_cache — the persistent cache missed.  CLAUDE.md
attributes this to a remote-session id in the cache key; this probe makes
the attribution concrete: it logs the hash of EVERY cache-key component
(jax._src.cache_key debug logging prints one line per component) for a
trivial jitted computation.  Run it twice in separate processes and diff
the component hashes — the component whose hash changes is the culprit.

Usage:
    python tools/diag_cache.py > /tmp/key1.txt 2>&1
    python tools/diag_cache.py > /tmp/key2.txt 2>&1
    diff /tmp/key1.txt /tmp/key2.txt
"""

from __future__ import annotations

import logging
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_explain_cache_misses", True)

# per-component key hashes are logged at DEBUG by jax._src.cache_key
logging.basicConfig(stream=sys.stdout, level=logging.DEBUG)
for name in ("jax._src.cache_key", "jax._src.compilation_cache",
             "jax._src.compiler"):
    logging.getLogger(name).setLevel(logging.DEBUG)
# silence the noisy ones
for name in ("jax._src.dispatch", "jax._src.interpreters",
             "jax._src.xla_bridge"):
    logging.getLogger(name).setLevel(logging.INFO)

import jax.numpy as jnp  # noqa: E402


@jax.jit
def f(x):
    return jnp.sin(x) @ jnp.cos(x).T


x = jnp.ones((256, 256), dtype=jnp.float32)
print("DEVICE:", jax.devices()[0], flush=True)
r = f(x)
r.block_until_ready()
print("RESULT OK:", float(r[0, 0]))
