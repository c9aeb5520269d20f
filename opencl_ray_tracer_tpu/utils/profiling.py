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
    shading_ops_per_pixel: float = 0.0,
    shaded_fraction: float = 1.0,
    vpu_flops: float = V5E_VPU_FLOPS,
    hbm_bw: float = V5E_HBM_BW,
) -> dict:
    """Speed-of-light fraction for a brute/tiled trace kernel.

    Model: VPU ops = pixels * (prim_slots * ops_per_pair +
    shaded_fraction * shading_ops_per_pixel); HBM = framebuffer writes
    (+ ray gen is in-register, scene is VMEM-resident). `n_prim_slots` is
    the mean EXECUTED candidate slots per pixel (after culling/ragged
    skipping); `shading_ops_per_pixel` is the per-pixel post-hit cost
    (normal + lighting + pack) charged only on the `shaded_fraction` of
    pixels whose tiles run the shading phase (empty tiles skip it).
    Returns the binding resource and achieved fraction of its ceiling.
    """
    t = frame_us / 1e6
    vpu_ops = n_pixels * (
        n_prim_slots * ops_per_pair
        + shaded_fraction * shading_ops_per_pixel
    )
    vpu_t = vpu_ops / vpu_flops
    return _sol_result(t, vpu_t, n_pixels * bytes_per_pixel / hbm_bw)


def sol_fraction_ops(
    frame_us: float,
    n_pixels: int,
    intersection_ops_per_pixel: float,
    shading_ops_per_pixel: float = 0.0,
    shaded_fraction: float = 1.0,
    bytes_per_pixel: float = 4.0,
    vpu_flops: float = V5E_VPU_FLOPS,
    hbm_bw: float = V5E_HBM_BW,
) -> dict:
    """sol_fraction with the intersection work given directly as ops/pixel —
    for callers that weight slot TYPES by their true per-slot cost (a
    shadow-frustum slot necessarily spends ~2x a primary affine slot)."""
    t = frame_us / 1e6
    vpu_ops = n_pixels * (
        intersection_ops_per_pixel
        + shaded_fraction * shading_ops_per_pixel
    )
    return _sol_result(
        t, vpu_ops / vpu_flops, n_pixels * bytes_per_pixel / hbm_bw
    )


def _sol_result(t: float, vpu_t: float, hbm_t: float) -> dict:
    bound = "vpu" if vpu_t >= hbm_t else "hbm"
    ideal = max(vpu_t, hbm_t)
    return {
        "bound": bound,
        "ideal_us": ideal * 1e6,
        "achieved_fraction": ideal / t if t > 0 else 0.0,
        "vpu_us": vpu_t * 1e6,
        "hbm_us": hbm_t * 1e6,
    }


def sol_fraction_bwd(
    step_us: float,
    n_pixels: int,
    n_prim_slots: int,
    ops_per_pair_fwd: float = 30.0,
    bwd_multiplier: float = 3.0,
    shading_ops_per_pixel: float = 250.0,
    grad_table_bytes_per_pixel: float = 0.0,
    out_bytes_per_pixel: float = 36.0,
    vpu_flops: float = V5E_VPU_FLOPS,
    hbm_bw: float = V5E_HBM_BW,
) -> dict:
    """Speed-of-light model for the SOFT fwd+bwd step (VERDICT r3 #2).

    The decomposed backward (kernels/soft_tiled.py) RECOMPUTES the forward
    per tile, then runs one vjp per candidate/occluder chunk, so:

      VPU ops = pixels * [ fwd work * (1 + bwd_multiplier) ]
        where fwd work = prim_slots * ops_per_pair_fwd + shading ops,
        and bwd_multiplier models vjp cost per recomputed op (reverse-mode
        FMA chains cost ~2-3x their primal).
      HBM = fwd output (8 f32 rows/px) + gradient TABLE blocks written per
        tile + their XLA scatter-add read-back (grad_table_bytes_per_pixel
        counts both directions).

    Soft candidate tests are heavier than hard ones (sigmoids + softmin
    bookkeeping): ops_per_pair_fwd ~30 vs the hard kernel's 14.
    """
    t = step_us / 1e6
    fwd_ops = n_prim_slots * ops_per_pair_fwd + shading_ops_per_pixel
    vpu_t = n_pixels * fwd_ops * (1.0 + bwd_multiplier) / vpu_flops
    hbm_t = (
        n_pixels * (out_bytes_per_pixel + grad_table_bytes_per_pixel) / hbm_bw
    )
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
