#!/usr/bin/env python
"""Mid-scale (50 sph + 4 cubes) fwd+bwd: stored-finals vs recompute regime
(the _FINALS_MIN_SLOTS threshold sits between the measured endpoints)."""
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
import opencl_ray_tracer_tpu.kernels.soft_tiled as stl
from opencl_ray_tracer_tpu.scene import random_scene

W, H = 1920, 1080


def main():
    cam = legacy_ortho_camera()
    scene = jax.device_put(
        random_scene(50, 4, seed=1, bounds=(float(W) - 10, float(H) - 10))
    )
    cfg = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                       soft=True, framebuffer_dtype="float", tau_depth=1.0,
                       tau_edge=0.5)

    def step(c):
        def loss(s):
            img = render_soft_pallas(s, c, cfg, interpret=False)
            return jnp.mean(img[..., :3] ** 2)

        val, g = jax.value_and_grad(loss)(scene)
        return val + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    from opencl_ray_tracer_tpu.bench_util import median_spread

    for thresh in (128, 10_000):  # finals regime vs forced recompute
        stl._FINALS_MIN_SLOTS = thresh
        med, lo, hi = median_spread(
            device_step_time_us(step, cam, n_frames=8) for _ in range(3)
        )
        label = "stored-finals" if thresh == 128 else "recompute"
        print(f"mid 50sph+4cubes {label}: median {med:.0f} us "
              f"[{lo:.0f}, {hi:.0f}] -> "
              f"{W*H/(med/1e6):.3e} rays/s", file=sys.stderr)


if __name__ == "__main__":
    main()
