from opencl_ray_tracer_tpu.runtime.backend import (
    Backend,
    available_backends,
    default_backend,
    default_device,
    describe_devices,
    enable_hlo_dump,
    log_devices,
    on_accelerator,
    resolve_backend,
)

__all__ = [
    "Backend",
    "available_backends",
    "default_backend",
    "default_device",
    "describe_devices",
    "enable_hlo_dump",
    "log_devices",
    "on_accelerator",
    "resolve_backend",
]
