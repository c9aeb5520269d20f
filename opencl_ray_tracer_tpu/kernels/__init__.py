from opencl_ray_tracer_tpu.kernels.fwd import (
    PRIM_CHUNK,
    TILE_PIXELS,
    render_pallas,
    render_pallas_packed,
)

__all__ = ["PRIM_CHUNK", "TILE_PIXELS", "render_pallas", "render_pallas_packed"]
