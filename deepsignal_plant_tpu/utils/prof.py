"""Tracing / profiling subsystem.

The reference has only coarse wall-clock prints (SURVEY.md §5.1,
call_modifications.py:640). Here: named stage timers + throughput counters
aggregated per process, and an optional ``jax.profiler`` trace context for
device-level timelines (open the dump with TensorBoard / xprof).
"""
from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageStat:
    seconds: float = 0.0
    calls: int = 0
    items: int = 0

    @property
    def items_per_s(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0


@dataclass
class Profiler:
    """Thread-safe per-stage wall-clock + item counters."""
    stages: dict[str, StageStat] = field(
        default_factory=lambda: defaultdict(StageStat))
    _lock: threading.Lock = field(default_factory=threading.Lock)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                s = self.stages[name]
                s.seconds += dt
                s.calls += 1
                s.items += items

    def add_items(self, name: str, items: int) -> None:
        with self._lock:
            self.stages[name].items += items

    def reset(self) -> None:
        with self._lock:
            self.stages.clear()

    def report(self) -> str:
        lines = ["stage                 calls      seconds        items   items/s"]
        for name in sorted(self.stages):
            s = self.stages[name]
            lines.append("%-20s %6d %12.3f %12d %9.0f" % (
                name, s.calls, s.seconds, s.items, s.items_per_s))
        return "\n".join(lines)


# process-global profiler used by the pipelines
PROFILER = Profiler()


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace context; no-op when trace_dir is None."""
    if trace_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
    print(f"[prof] device trace written to {trace_dir}")
