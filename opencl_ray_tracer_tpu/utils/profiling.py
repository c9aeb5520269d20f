"""Profiling / tracing — the TPU equivalent of PerformanceCounter+logging
(SURVEY.md §5): jax.profiler traces, annotated ranges, and a speed-of-light
calculator for the ray-trace kernels."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

from opencl_ray_tracer_tpu.utils.log import log_info

# Rough v5e per-chip ceilings for SOL estimates (public numbers).
V5E_VPU_FLOPS = 2.0e12       # f32 vector ops/s (8x128 lanes, ~1 GHz, FMA=2)
V5E_HBM_BW = 8.1e11          # bytes/s
V5E_MXU_BF16_FLOPS = 1.97e14


@contextlib.contextmanager
def trace(dump_dir: str = "/tmp/octrt_trace") -> Iterator[None]:
    """Capture a jax.profiler trace around a region (view with xprof/TB)."""
    jax.profiler.start_trace(dump_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log_info("profiler trace written to %s", dump_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named range in profiler timelines (TraceAnnotation role)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def rays_per_second(n_pixels: int, frame_us: float) -> float:
    return n_pixels / (frame_us / 1e6)


def sol_fraction(
    frame_us: float,
    n_pixels: int,
    n_prim_slots: int,
    ops_per_pair: float = 14.0,
    bytes_per_pixel: float = 36.0,
    vpu_flops: float = V5E_VPU_FLOPS,
    hbm_bw: float = V5E_HBM_BW,
) -> dict:
    """Speed-of-light fraction for a brute/tiled trace kernel.

    Model: VPU ops = pixels * prim_slots * ops_per_pair; HBM = framebuffer
    writes (+ ray gen is in-register, scene is VMEM-resident). Returns the
    binding resource and achieved fraction of its ceiling.
    """
    t = frame_us / 1e6
    vpu_t = n_pixels * n_prim_slots * ops_per_pair / vpu_flops
    hbm_t = n_pixels * bytes_per_pixel / hbm_bw
    bound = "vpu" if vpu_t >= hbm_t else "hbm"
    ideal = max(vpu_t, hbm_t)
    return {
        "bound": bound,
        "ideal_us": ideal * 1e6,
        "achieved_fraction": ideal / t if t > 0 else 0.0,
        "vpu_us": vpu_t * 1e6,
        "hbm_us": hbm_t * 1e6,
    }


def device_kind() -> Optional[str]:
    d = jax.devices()[0]
    return getattr(d, "device_kind", None)
