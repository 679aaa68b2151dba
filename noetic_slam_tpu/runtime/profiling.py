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

    def snapshot(self) -> dict:
        """Copy of the cumulative totals/counts — callers diff successive
        snapshots for per-window stage attribution (soak artifact)."""
        return {"totals": dict(self.totals), "counts": dict(self.counts)}

    @staticmethod
    def delta(before: dict, after: dict) -> dict:
        """Stage table covering the interval between two snapshots."""
        out = {}
        for k, v in after["totals"].items():
            dv = v - before["totals"].get(k, 0.0)
            dc = after["counts"][k] - before["counts"].get(k, 0)
            if dc or dv > 1e-9:
                out[k] = {"calls": dc, "total_s": round(dv, 3)}
        return out

    def table(self) -> str:
        rows = ["stage                     calls   total_s   mean_ms"]
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            rows.append(f"{k:<25} {self.counts[k]:>5} "
                        f"{self.totals[k]:>9.3f} {self.mean_ms(k):>9.2f}")
        return "\n".join(rows)


# ---------------------------------------------------------------------------
# Roofline accounting (BASELINE "speed of light" quantification)
# ---------------------------------------------------------------------------

# device_kind prefix -> (bf16 MXU TFLOP/s, HBM GB/s) per chip. Public specs;
# order matters (first prefix match wins, so "v5 lite" precedes "v5").
CHIP_PEAKS = (
    ("TPU v5 lite", (197.0, 819.0)),      # v5e
    ("TPU v5e", (197.0, 819.0)),
    ("TPU v5p", (459.0, 2765.0)),
    ("TPU v5", (459.0, 2765.0)),
    ("TPU v4", (275.0, 1228.0)),
    ("TPU v6", (918.0, 1640.0)),          # v6e / Trillium
)


def chip_peaks():
    """(bf16_tflops, hbm_gbps) for the attached chip, or None off-TPU."""
    import jax

    kind = jax.devices()[0].device_kind
    for prefix, peaks in CHIP_PEAKS:
        if kind.startswith(prefix):
            return peaks, kind
    return None, kind


def roofline_report(name: str, seconds: float, flops: float | None = None,
                    bytes_moved: float | None = None) -> str:
    """One line of absolute utilization: achieved GFLOP/s / GB/s and the
    percent of the chip's MXU / HBM peak (the BASELINE.md requirement that
    "fast" be measured against the hardware ceiling, not a prior attempt).

    ``flops``/``bytes_moved`` are per call; the caller states the counting
    basis (e.g. dense-equivalent FLOPs for a pruned kernel) at the call
    site."""
    peaks, kind = chip_peaks()
    parts = [f"{name:<34}"]
    if flops is not None:
        gf = flops / seconds / 1e9
        parts.append(f"{gf:10.1f} GFLOP/s")
        if peaks:
            parts.append(f"({gf / (peaks[0] * 1e3) * 100:5.1f}% of "
                         f"{peaks[0]:.0f}T bf16 MXU)")
    if bytes_moved is not None:
        gb = bytes_moved / seconds / 1e9
        parts.append(f"{gb:8.1f} GB/s")
        if peaks:
            parts.append(f"({gb / peaks[1] * 100:5.1f}% of "
                         f"{peaks[1]:.0f}GB/s HBM)")
    if not peaks:
        parts.append(f"[no peak table for {kind}]")
    return " ".join(parts)
