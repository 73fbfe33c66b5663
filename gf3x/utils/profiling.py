"""Tracing/profiling hooks (SURVEY.md §6.1: "jax.profiler traces + a small
benchmark harness").

Usage:
    with gf3x.utils.profiling.trace("/tmp/gf3x-trace"):
        modem.decode_batch(rx)
    # -> TensorBoard/XProf trace in /tmp/gf3x-trace

or from the CLI/bench via GF3X_PROFILE=/tmp/gf3x-trace.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field

__all__ = ["trace", "maybe_trace", "Timer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler device trace context (TensorBoard format)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def maybe_trace(env: str = "GF3X_PROFILE"):
    """Trace only when the env var names a directory (CLI/bench hook)."""
    log_dir = os.environ.get(env)
    if log_dir:
        with trace(log_dir):
            yield
    else:
        yield


@dataclass
class Timer:
    """Wall-clock section timer for host-side pipeline accounting."""

    sections: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.sections.values()) or 1.0
        lines = [f"{k:24s} {v*1e3:9.1f} ms  {100*v/total:5.1f}%"
                 for k, v in sorted(self.sections.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)
