"""Profiling/tracing utilities — the framework's measurement discipline.

The reference hand-rolls per-scan wall timing + /proc sampling into a
terminal dashboard (odom.cc:743,828,1831-1869; runtime/metrics.py provides
that role here). This module adds the device-side layer the reference never
needed:

- ``slope_timer``: HONEST device timing. Through an asynchronous dispatch
  path (and in particular through relayed/deferred runtimes, where even
  ``jax.block_until_ready`` may not force execution), the only trustworthy
  wall measurement is: chain fresh data through the computation, end the
  window by fetching a scalar that data-depends on the result, and take the
  SLOPE between a short and a long window so fixed round-trip overhead
  cancels. This utility packages that protocol.
- ``device_trace``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (XLA op-level timeline), with a
  guard for backends that cannot serve the profiler.
- ``StageTimer``: named-stage wall aggregation for host-side pipelines
  (replay loop, packet parsing), printable as a table.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

__all__ = ["slope_timer", "device_trace", "StageTimer"]


def slope_timer(run_window: Callable[[int], None], *, n1: int = 3,
                n2: int = 9, warmup: int = 1) -> float:
    """Measure true per-op seconds of ``run_window(k)`` (which must execute
    ``k`` chained fresh-data ops and end with a dependent fetch).

    Returns seconds/op = (t(n2) - t(n1)) / (n2 - n1); compile time and the
    fixed fetch/round-trip overhead cancel in the difference.
    """
    if n2 <= n1:
        raise ValueError("n2 must exceed n1")
    run_window(warmup)
    t0 = time.perf_counter()
    run_window(n1)
    t1 = time.perf_counter()
    run_window(n2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


@contextlib.contextmanager
def device_trace(logdir: str):
    """``with device_trace("/tmp/trace"):`` — wraps jax.profiler.trace,
    tolerating backends without profiler support (yields a bool flag)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield started
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StageTimer:
    """Accumulate named host-side stage durations; render as a table.

    >>> st = StageTimer()
    >>> with st("parse"):
    ...     ...
    >>> print(st.table())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def mean_ms(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1) * 1e3

    def table(self) -> str:
        rows = ["stage                     calls   total_s   mean_ms"]
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            rows.append(f"{k:<25} {self.counts[k]:>5} "
                        f"{self.totals[k]:>9.3f} {self.mean_ms(k):>9.2f}")
        return "\n".join(rows)
