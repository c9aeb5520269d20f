"""Knob scan for the 100-prim soft fwd+bwd: does time track STATIC chunk
slots (cull_k / shadow_cull_k caps) or actual executed work?"""

import sys

import jax
import jax.numpy as jnp

from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
from opencl_ray_tracer_tpu.bench_util import device_step_time_us
from opencl_ray_tracer_tpu.kernels.soft import render_soft_pallas
from opencl_ray_tracer_tpu.scene import random_scene

W, H = 1920, 1080
scene = jax.device_put(random_scene(50, 4, seed=1, bounds=(float(W) - 10, float(H) - 10)))
cam = legacy_ortho_camera()


def bench(cull_k, shadow_k):
    cfg = RenderConfig(
        width=W, height=H, shading="phong", shadows=True, soft=True,
        framebuffer_dtype="float", tau_depth=1.0, tau_edge=0.5,
        cull_k=cull_k, shadow_cull_k=shadow_k,
    )

    def step(c):
        def loss(s):
            img = render_soft_pallas(s, c, cfg, interpret=False)
            return jnp.mean(img[..., :3] ** 2)

        val, g = jax.value_and_grad(loss)(scene)
        return val + jnp.sum(g.sphere_origin) + jnp.sum(g.sphere_radius) + jnp.sum(
            g.lights.position
        )

    us = device_step_time_us(step, cam, n_frames=10)
    print(f"cull_k={cull_k} shadow_k={shadow_k}: {us:.0f} us", file=sys.stderr)


for ck, sk in [(32, 64), (16, 64), (32, 24), (16, 24)]:
    bench(ck, sk)
