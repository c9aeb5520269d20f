from opencl_ray_tracer_tpu.parallel.mesh import (
    IMAGE_AXIS,
    make_mesh,
    mesh_from_config,
    render_sharded,
    replicate,
    shard_rows,
    shift_camera_rows,
)
from opencl_ray_tracer_tpu.parallel.train import (
    TrainState,
    init_train_state,
    make_train_step,
)
from opencl_ray_tracer_tpu.parallel import distributed

__all__ = [
    "IMAGE_AXIS",
    "make_mesh",
    "mesh_from_config",
    "render_sharded",
    "replicate",
    "shard_rows",
    "shift_camera_rows",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "distributed",
]
