"""Stage timing + optional jax.profiler tracing.

The reference's only timing machinery is per-command ``Instant`` wall clocks
in the Rust CLI and ``time.time()`` deltas in the experiment harness
(run_experiments.py:141-163).  This keeps that surface (named stage timers,
report dict) and adds device-aware timing (block_until_ready) and optional
jax.profiler trace capture for TPU work.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

__all__ = ["StageTimer", "trace_to"]


class StageTimer:
    """Named wall-clock stage timers with a printable report."""

    def __init__(self, verbose: bool = True, sync: bool = False) -> None:
        self.durations: Dict[str, float] = {}
        self.verbose = verbose
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    jax.block_until_ready(jax.device_put(0))
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            if self.verbose:
                print(f"  [{name}] {dt:.3f}s")

    def report(self) -> Dict[str, float]:
        return dict(self.durations)

    @property
    def total(self) -> float:
        return sum(self.durations.values())


@contextlib.contextmanager
def trace_to(log_dir: Optional[str]):
    """Capture a jax.profiler trace when a directory is given."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
