"""Device-throughput measurement that survives a high-latency control path.

The axon-tunneled TPU has large per-dispatch latency and slow host<->device
transfers, and XLA will CSE identical pure render calls inside one graph.
Per-call block_until_ready timing therefore measures the tunnel, not the
chip (and can even under-report: the platform occasionally returns early).

`device_frame_time_us` measures the real thing in two moves:

1. N frames inside ONE jitted lax.scan, each frame with a DIFFERENT camera
   origin (defeats CSE; identical compute), each frame consumed into a
   scalar carry (defeats DCE). One dispatch, one fence.
2. TWO-POINT SLOPE: even a single dispatch+fence costs ~28-30 ms on this
   platform (measured round 4 — a trivial-body scan run costs the same
   ~30 ms as a 25-frame render run), so wall/N carries a +30ms/N bias
   that looked like a ~300 us/frame floor at N=100 and inflated every
   round-1..3 number. Timing BOTH an N1- and an N2-frame run and taking
   (t(N2) - t(N1)) / (N2 - N1) cancels the per-call constant exactly;
   what remains is pure per-frame device time.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp


def _scan_total_us(render_fn, camera, n_frames: int, reps: int,
                   scalar_body: bool) -> float:
    """Median total wall time (us) of ONE jitted n_frames-scan dispatch."""

    @jax.jit
    def run(cam0):
        jit_eps = jnp.linspace(0.0, 0.125, n_frames)

        def body(acc, e):
            cam = dataclasses.replace(cam0, o0=cam0.o0 + e * 1e-3)
            if scalar_body:
                return acc + render_fn(cam).astype(jnp.float32), ()
            fb = render_fn(cam)
            if fb.ndim == 2:  # packed int32 words
                probe = (fb[5, 5] & 0xFF).astype(jnp.float32) + (
                    fb[-1, -1] & 0xFF
                ).astype(jnp.float32)
            else:
                probe = fb[5, 5, 0].astype(jnp.float32) + fb[
                    -1, -1, 1
                ].astype(jnp.float32)
            return acc + probe, ()

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jit_eps)
        return acc

    out = run(camera)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter_ns()
        out = run(camera)
        jax.block_until_ready(out)
        samples.append((time.perf_counter_ns() - t0) / 1e3)
    # median, NOT min: dispatch noise is additive and heavy-tailed, which
    # argues for minima — but this platform's fence OCCASIONALLY RETURNS
    # EARLY (under-reporting a run), and a minimum selects exactly that
    # outlier (observed: an early return drove a headline sample to an
    # impossible 44 us, 1.6x above its own roofline). The median tolerates
    # up to 2 contaminated reps in either direction out of 5.
    samples.sort()
    return samples[len(samples) // 2]


def _slope_us(render_fn, camera, n_frames: int, reps: int,
              scalar_body: bool) -> float:
    # baseline run: an eighth of the frames (>= 4 when possible, always
    # at most half so the slope denominator stays meaningful)
    n1 = max(min(n_frames // 2, max(n_frames // 8, 4)), 1)
    if n_frames <= n1:  # degenerate request: no slope to take
        return max(
            _scan_total_us(render_fn, camera, n_frames, reps, scalar_body)
            / max(n_frames, 1),
            1e-3,
        )
    t1 = _scan_total_us(render_fn, camera, n1, reps, scalar_body)
    t2 = _scan_total_us(render_fn, camera, n_frames, reps, scalar_body)
    slope = (t2 - t1) / (n_frames - n1)
    if slope <= 0.0:
        # clamp to a small positive epsilon, not 0.0: callers divide by
        # this (rays/s) and must not ZeroDivisionError — but a
        # non-positive slope means the measurement FAILED (session noise
        # swamped the per-frame cost), so say so loudly rather than let
        # an absurd ~1e15 rays/s ride into a record unmarked.
        print(
            f"# WARNING: invalid slope ({slope:.1f} us/frame <= 0: "
            f"t({n1})={t1:.0f}us, t({n_frames})={t2:.0f}us) — clamped to "
            f"1e-3 us; this sample is measurement noise, not throughput",
            file=sys.stderr,
        )
        return 1e-3
    return slope


def median_spread(samples) -> tuple:
    """(median, min, max) of an iterable of measurements — the one
    aggregation policy for repeated slope samples (median tolerates the
    occasional early-returning fence in either direction; min/max carry
    the session spread into records)."""
    s = sorted(samples)
    return s[len(s) // 2], s[0], s[-1]


def device_frame_time_us(
    render_fn: Callable,
    camera,
    n_frames: int = 100,
    reps: int = 5,
) -> float:
    """Per-frame device time in microseconds (two-point slope, see module
    docstring). render_fn(camera) -> framebuffer array; camera is a Camera
    pytree whose o0 is perturbed per frame by a sub-pixel jitter (identical
    compute)."""
    return _slope_us(render_fn, camera, n_frames, reps, scalar_body=False)


def device_step_time_us(
    step_fn: Callable,
    camera,
    n_frames: int = 30,
    reps: int = 5,
) -> float:
    """Per-step device time in microseconds for SCALAR-returning steps
    (e.g. a loss whose grad was already consumed into it) — the shape for
    timing fwd+bwd passes. Same slope structure as device_frame_time_us."""
    return _slope_us(step_fn, camera, n_frames, reps, scalar_body=True)
