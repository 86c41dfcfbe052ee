"""Profiling and step-timing instrumentation.

The reference has no profiler hooks (SURVEY section 5); here tracing is a
first-class utility: jax.profiler trace capture around any phase, named
TraceAnnotations visible in the trace viewer, and a lightweight phase timer
whose results feed the Logger metric stream.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, *, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed phase.

    View with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(str(log_dir), create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Wall-clock phase timing with per-phase aggregation.

    Usage::

        timer = PhaseTimer()
        with timer.phase("simulate"):
            out = run(params, key)
            jax.block_until_ready(out)
        timer.report(logger, step=3)
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.last: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *, block_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            elapsed = time.perf_counter() - start
            self.totals[name] += elapsed
            self.counts[name] += 1
            self.last[name] = elapsed

    def mean(self, name: str) -> float:
        """Mean seconds per occurrence of a phase."""
        return self.totals[name] / max(1, self.counts[name])

    def report(self, logger=None, step: int = 0) -> dict[str, float]:
        """Latest per-phase seconds; optionally stream to a Logger."""
        snapshot = dict(self.last)
        if logger is not None:
            for name, seconds in snapshot.items():
                logger.log_metric(f"time.{name}", seconds, step=step)
        return snapshot
