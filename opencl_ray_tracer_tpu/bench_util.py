"""Device-throughput measurement that survives a high-latency control path.

The axon-tunneled TPU has ~ms per-dispatch latency and slow host<->device
transfers, and XLA will CSE identical pure render calls inside one graph.
Per-call block_until_ready timing therefore measures the tunnel, not the
chip (and can even under-report: the platform occasionally returns early).

`device_frame_time_us` measures the real thing: N frames inside ONE jitted
lax.scan, each frame with a DIFFERENT camera origin (defeats CSE; identical
compute cost), each frame consumed into a scalar carry (defeats DCE). One
dispatch, one fence; wall time / N converges to pure device time as N grows.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_frame_time_us(
    render_fn: Callable,
    camera,
    n_frames: int = 100,
    reps: int = 3,
) -> float:
    """Median per-frame device time in microseconds.

    render_fn(camera) -> framebuffer array; camera is a Camera pytree whose
    o0 is perturbed per frame by a sub-pixel jitter (identical compute).
    """

    @jax.jit
    def run(cam0):
        jit_eps = jnp.linspace(0.0, 0.125, n_frames)

        def body(acc, e):
            cam = dataclasses.replace(cam0, o0=cam0.o0 + e * 1e-3)
            fb = render_fn(cam)
            probe = fb[5, 5, 0].astype(jnp.float32) + fb[-1, -1, 1].astype(
                jnp.float32
            )
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
        samples.append((time.perf_counter_ns() - t0) / 1e3 / n_frames)
    samples.sort()
    return samples[len(samples) // 2]


def device_step_time_us(
    step_fn: Callable,
    camera,
    n_frames: int = 30,
    reps: int = 3,
) -> float:
    """Median per-step device time in microseconds for SCALAR-returning steps.

    Same CSE/DCE-defeating scan structure as device_frame_time_us, but
    step_fn(camera) -> scalar (e.g. a loss whose grad was already consumed
    into it) — the shape for timing fwd+bwd passes.
    """

    @jax.jit
    def run(cam0):
        jit_eps = jnp.linspace(0.0, 0.125, n_frames)

        def body(acc, e):
            cam = dataclasses.replace(cam0, o0=cam0.o0 + e * 1e-3)
            return acc + step_fn(cam).astype(jnp.float32), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jit_eps)
        return acc

    out = run(camera)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter_ns()
        out = run(camera)
        jax.block_until_ready(out)
        samples.append((time.perf_counter_ns() - t0) / 1e3 / n_frames)
    samples.sort()
    return samples[len(samples) // 2]
