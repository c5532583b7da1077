"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5) — its only instrumentation is a
steps/sec print.  Here: named phase timers with device synchronization
(so timings mean what they say under JAX's async dispatch) and a wrapper
over jax.profiler for XLA-level traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating wall-clock timers keyed by phase name.

    with timer.phase("encode"):  ... device work ...
    Synchronizes the device on exit so async dispatch doesn't hide work.
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        if self.sync:
            _sync_all()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                _sync_all()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.report(), indent=2, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


def _sync_all():
    try:
        jax.effects_barrier()
    except Exception:
        pass
    for d in jax.live_arrays():
        pass  # live_arrays() itself does not block; explicit barrier below
    (jax.device_put(0.0) + 0).block_until_ready()


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace (open with TensorBoard's profile plugin
    or Perfetto).  Usage: `with xla_trace('traces/encode'): run()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)
