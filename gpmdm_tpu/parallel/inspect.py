"""Static collective-count inspection of sharded programs.

SURVEY §5 "distributed communication backend" hardening: pin the number
of cross-device collectives a sharded program traces to, so a regression
that sneaks an extra all-gather/psum into a hot path is caught by the
virtual-CPU-mesh dryrun without any TPU hardware (``__graft_entry__.
dryrun_multichip`` asserts these counts; tests/test_parallel.py pins the
per-program tables).  The reference has no distributed layer (SURVEY
§2.6) — this guards a beyond-parity subsystem.

Counting is STATIC: each collective primitive appearing in the traced
jaxpr counts once, regardless of how many times an enclosing ``scan``
executes it at runtime.  That is the right invariant for regression
detection — an "extra collective" is a program change, and program
changes show up statically; runtime trip counts scale with data shape
and would make the pins shape-dependent.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable

import jax
from jax.extend import core as jcore

#: Cross-device communication primitives (jax.lax collectives as they
#: appear in jaxprs).  axis_index/axis_size are device-local reads, not
#: communication, and are deliberately not counted.  Inside a shard_map
#: body some collectives trace under a ``*_invariant`` variant name
#: (e.g. ``psum_invariant``) — :func:`_norm` folds those onto the base
#: name so pinned tables are stable across tracing contexts.
COLLECTIVE_PRIMS = frozenset(
    {
        "psum",
        "psum_scatter",
        "all_gather",
        "all_gather_invariant",
        "all_to_all",
        "ppermute",
        "pmax",
        "pmin",
        "pgather",
        "pbroadcast",
        "reduce_scatter",
        "psum_invariant",
    }
)


def _norm(name: str) -> str:
    return name[: -len("_invariant")] if name.endswith("_invariant") else name


def _sub_jaxprs(params: dict):
    """Yield every jaxpr nested in an eqn's params (scan/cond/pjit/
    shard_map/custom_* bodies), whatever the key or nesting shape."""
    for v in params.values():
        stack = [v]
        while stack:
            item = stack.pop()
            if isinstance(item, jcore.ClosedJaxpr):
                yield item.jaxpr
            elif isinstance(item, jcore.Jaxpr):
                yield item
            elif isinstance(item, (tuple, list)):
                stack.extend(item)


def count_collectives_jaxpr(jaxpr) -> Counter:
    """Recursively count collective primitives in a (Closed)Jaxpr."""
    if isinstance(jaxpr, jcore.ClosedJaxpr):
        jaxpr = jaxpr.jaxpr
    counts: Counter = Counter()
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in COLLECTIVE_PRIMS:
            counts[_norm(name)] += 1
        for sub in _sub_jaxprs(eqn.params):
            counts.update(count_collectives_jaxpr(sub))
    return counts


def count_collectives(fn: Callable, *args, **kwargs) -> dict:
    """Trace ``fn(*args, **kwargs)`` and return {primitive: static count}.

    ``fn`` is traced with ``jax.make_jaxpr`` — it must be jittable with
    these arguments (the same contract the sharded trainer already
    meets).  Returns a plain dict for stable comparison in asserts.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return dict(count_collectives_jaxpr(jaxpr))
