from opencl_ray_tracer_tpu.kernels.fwd import (
    PRIM_CHUNK,
    TILE_PIXELS,
    render_pallas,
)

__all__ = ["PRIM_CHUNK", "TILE_PIXELS", "render_pallas"]
