from opencl_ray_tracer_tpu.ref.tracer import render_reference

__all__ = ["render_reference"]
