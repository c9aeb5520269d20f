#!/usr/bin/env python
"""A-row only (stress fwd+bwd, all leaves), N independent slope reps."""
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


def main():
    cam = legacy_ortho_camera()
    scene = jax.device_put(
        random_scene(100, 100, seed=0, bounds=(float(W) - 10, float(H) - 10))
    )
    cfg = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                       soft=True, framebuffer_dtype="float", tau_depth=1.0,
                       tau_edge=0.5, cull_k=96, shadow_cull_k=136)

    def step(c):
        def loss(s):
            img = render_soft_pallas(s, c, cfg, interpret=False)
            return jnp.mean(img[..., :3] ** 2)

        val, g = jax.value_and_grad(loss)(scene)
        return val + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    from opencl_ray_tracer_tpu.bench_util import median_spread

    med, lo, hi = median_spread(
        device_step_time_us(step, cam, n_frames=5) for _ in range(3)
    )
    print(f"CH={os.environ.get('OCTRT_SOFT_CH', '8')} "
          f"SUB={os.environ.get('OCTRT_SUB_PIX_BWD', '2048')} stress A-row: "
          f"median {med:.0f} us [{lo:.0f}, {hi:.0f}] -> "
          f"{W*H/(med/1e6):.3e} rays/s", file=sys.stderr)


if __name__ == "__main__":
    main()
