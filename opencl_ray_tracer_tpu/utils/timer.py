"""Timing — the reference's PerformanceCounter + DeltaTime subsystems.

PerformanceCounter (misc/PerformanceCounter.cpp:30-64) wraps Win32 QPC and
returns elapsed MICROSECONDS; same API here over a monotonic ns clock, with
the device-aware benchmark discipline the reference lacks: a `time_fn` helper
that blocks on device results (block_until_ready) so compile time and async
dispatch don't pollute measurements.

When the native C++ runtime library is built (native/), the monotonic clock
is taken from it (octrt_native.now_ns) — the lodepng/QPC-style native role —
with a pure-python fallback.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, Dict, Sequence

import jax

try:  # native monotonic clock (C++), optional
    from opencl_ray_tracer_tpu.native import now_ns as _now_ns
except Exception:  # pragma: no cover - fallback when lib not built
    _now_ns = time.perf_counter_ns


def now_ns() -> int:
    return _now_ns()


class PerformanceCounter:
    """start/stop microsecond counter (PerformanceCounter.cpp API shape)."""

    def __init__(self) -> None:
        self._start: int | None = None
        self.elapsed_us: float = 0.0

    def start_counter(self) -> None:
        self._start = now_ns()

    def stop_counter(self) -> float:
        if self._start is None:
            raise RuntimeError("stopCounter called before startCounter")
        self.elapsed_us = (now_ns() - self._start) / 1e3
        self._start = None
        return self.elapsed_us


class DeltaTime:
    """Frame-to-frame seconds (misc/DeltaTime.cpp:21-26)."""

    def __init__(self) -> None:
        self._last = now_ns()
        self.delta = 0.0

    def update(self) -> float:
        t = now_ns()
        self.delta = (t - self._last) / 1e9
        self._last = t
        return self.delta


class SimpleTimer:
    """Countdown timer (misc/Utility.h:188-307 role)."""

    def __init__(self, duration_s: float):
        self.duration = duration_s
        self.restart()

    def restart(self) -> None:
        self._t0 = now_ns()

    @property
    def expired(self) -> bool:
        return (now_ns() - self._t0) / 1e9 >= self.duration


def time_fn(
    fn: Callable[[], object],
    iters: int = 10,
    warmup: int = 2,
    batches: int = 4,
) -> Dict[str, float]:
    """Time a device computation: warm up (compile), then `batches` batches
    of `iters` back-to-back dispatches with ONE device fence per batch.

    Per-call block_until_ready is NOT used as the primary measure: on the
    tunneled axon TPU platform it occasionally returns before the work is
    complete, producing impossible sub-100us frame times. Saturating the
    queue with `iters` launches and fencing once amortizes dispatch overhead
    and measures true device throughput (in-order per-device execution).
    Returns stats in microseconds per call (the reference's display unit,
    MainState.cpp:894-903)."""

    out = None
    for _ in range(max(warmup, 1)):
        out = fn()
    jax.block_until_ready(out)

    samples: Sequence[float] = []
    for _ in range(batches):
        t0 = now_ns()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        samples.append((now_ns() - t0) / 1e3 / iters)
    return {
        "mean_us": statistics.fmean(samples),
        "median_us": statistics.median(samples),
        "min_us": min(samples),
        "max_us": max(samples),
        "stdev_us": statistics.pstdev(samples) if len(samples) > 1 else 0.0,
        "iters": float(iters * batches),
    }
