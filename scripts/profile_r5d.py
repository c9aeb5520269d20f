#!/usr/bin/env python
"""Round-5 profiling d: stress + headline fwd+bwd with the stored-finals
backward (all grad leaves consumed)."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
from opencl_ray_tracer_tpu.bench_util import device_step_time_us
from opencl_ray_tracer_tpu.kernels.soft import render_soft_pallas
from opencl_ray_tracer_tpu.scene import random_scene

W, H = 1920, 1080


def step_fn(scene, cfg):
    scene = jax.device_put(scene)

    def step(c):
        def loss(s):
            img = render_soft_pallas(s, c, cfg, interpret=False)
            return jnp.mean(img[..., :3] ** 2)

        val, g = jax.value_and_grad(loss)(scene)
        return val + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    return step


def main():
    print(f"# device: {jax.devices()[0].platform}", file=sys.stderr)
    cam = legacy_ortho_camera()

    scene_st = random_scene(100, 100, seed=0, bounds=(float(W) - 10, float(H) - 10))
    cfg_st = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                          soft=True, framebuffer_dtype="float",
                          tau_depth=1.0, tau_edge=0.5, cull_k=96,
                          shadow_cull_k=136)
    us = device_step_time_us(step_fn(scene_st, cfg_st), cam, n_frames=5)
    print(f"stress fwd+bwd stored-finals (ALL leaves): {us:.0f} us -> "
          f"{W*H/(us/1e6):.3e} rays/s", file=sys.stderr)

    scene_hl = random_scene(10, 1, seed=0, bounds=(float(W) - 10, float(H) - 10))
    cfg_hl = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                          soft=True, framebuffer_dtype="float",
                          tau_depth=1.0, tau_edge=0.5)
    us = device_step_time_us(step_fn(scene_hl, cfg_hl), cam, n_frames=20)
    print(f"headline fwd+bwd stored-finals (ALL leaves): {us:.0f} us -> "
          f"{W*H/(us/1e6):.3e} rays/s", file=sys.stderr)


if __name__ == "__main__":
    main()
