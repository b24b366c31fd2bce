"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock prints around training
epochs (gpmdm.py:862, 876-881) and around each PF update
(test_gpmdm_pf.ipynb cell 4).  Here profiling is first-class
(SURVEY.md §5): ``jax.profiler`` trace capture around any region, and a
lightweight stage timer whose numbers (steps/sec, PF fps) are the
benchmark's north-star metrics.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gpmdm_tpu_trace") -> Iterator[None]:
    """Capture a ``jax.profiler`` trace (viewable in TensorBoard /
    Perfetto) around a region:

        with profiling.trace("/tmp/trace"):
            train_step(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside a trace (shows up on the TraceMe track)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class StageTimer:
    """Accumulating wall-clock timer for named pipeline stages.

    Use ``with timer.stage("dynamics"): ...`` around *blocking* host-side
    stages; call ``block_until_ready`` inside the region when timing device
    work, otherwise dispatch time is measured instead of execution time.
    """

    totals: Dict[str, float] = dataclasses.field(default_factory=dict)
    counts: Dict[str, int] = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {n} calls, {total / n * 1e3:.2f} ms/call")
        return "\n".join(lines)

    def rates(self, name: str) -> float:
        """Calls per second for a stage."""
        return self.counts.get(name, 0) / self.totals.get(name, float("inf"))


def throughput(n_items: int, wall_s: float) -> float:
    return n_items / wall_s if wall_s > 0 else float("inf")


def warm_transport() -> float:
    """Initialize the device->host transfer path; returns the wait in
    seconds.

    On remote-TPU transports (the axon tunnel), ``jax.block_until_ready``
    is a NO-OP until the process's first device->host fetch initializes
    the path — timings taken before that measure dispatch enqueue
    (~0.2 ms), not compute, and the first fetch itself can take 2-450 s.
    Call this (or run it in a thread, as bench.py does) before any
    measurement loop.  Instant on local backends.
    """
    import time

    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    np.asarray(jnp.zeros((1,), dtype=jnp.float32) + 0)
    return time.perf_counter() - t0
