from opencl_ray_tracer_tpu.kernels.fwd import (
    PRIM_CHUNK,
    TILE_PIXELS,
    render_pallas,
    render_pallas_packed,
)
from opencl_ray_tracer_tpu.kernels.fwd_tiled import (
    TileBins,
    bin_scene,
    render_tiled,
    render_tiled_packed,
)
from opencl_ray_tracer_tpu.kernels.soft import render_soft_pallas

__all__ = [
    "PRIM_CHUNK",
    "TILE_PIXELS",
    "render_pallas",
    "render_pallas_packed",
    "TileBins",
    "bin_scene",
    "render_tiled",
    "render_tiled_packed",
    "render_soft_pallas",
]
