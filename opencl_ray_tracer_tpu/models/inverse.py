"""Inverse rendering: fit scene parameters to a target image.

The capstone model family (BASELINE.json config 5): given a target
framebuffer, optimize sphere centers/radii/colours, cube vertices, and light
parameters by gradient descent through the soft differentiable renderer,
with the distributed train step from parallel/train.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from opencl_ray_tracer_tpu.camera import Camera, legacy_ortho_camera
from opencl_ray_tracer_tpu.config import RenderConfig
from opencl_ray_tracer_tpu.parallel import (
    init_train_state,
    make_mesh,
    make_train_step,
    replicate,
    shard_rows,
)
from opencl_ray_tracer_tpu.utils.log import log_info

# Leaves whose names make sense to optimize by default (geometry + colour +
# light); leave e.g. nothing frozen when filter is None.
SPHERE_PARAMS = ("sphere_origin", "sphere_radius", "sphere_colour")


def param_filter_from_names(names) -> Callable:
    names = tuple(names)

    def fltr(path) -> bool:
        keys = [getattr(p, "name", getattr(p, "key", None)) for p in path]
        return any(k in names for k in keys)

    return fltr


def fit_scene(
    init_scene,
    target,
    camera: Optional[Camera] = None,
    config: Optional[RenderConfig] = None,
    steps: int = 200,
    learning_rate: float = 0.5,
    trainable: Optional[tuple] = None,
    mesh=None,
    log_every: int = 50,
):
    """Gradient-fit `init_scene` to `target` (H, W, 4 in the 0..255 domain).

    Returns (scene, losses). Uses Adam; `trainable` optionally restricts to
    named scene fields (e.g. SPHERE_PARAMS).
    """
    config = config or RenderConfig(
        width=int(target.shape[1]),
        height=int(target.shape[0]),
        shading="lambert",
        soft=True,
        framebuffer_dtype="float",
    )
    camera = camera or legacy_ortho_camera()
    mesh = mesh or make_mesh()

    optimizer = optax.adam(learning_rate)
    fltr = param_filter_from_names(trainable) if trainable else None
    step = make_train_step(camera, config, optimizer, mesh=mesh, param_filter=fltr)

    target = jnp.asarray(np.asarray(target, np.float32))
    target_sharded = shard_rows(target, mesh)
    state = init_train_state(replicate(init_scene, mesh), optimizer)

    losses = []
    for i in range(steps):
        state, loss = step(state, target_sharded)
        if i % log_every == 0 or i == steps - 1:
            lv = float(loss)
            losses.append(lv)
            log_info("fit_scene step %d loss %.6f", i, lv)
    return state.scene, losses
