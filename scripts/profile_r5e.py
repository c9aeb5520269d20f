#!/usr/bin/env python
"""Round-5 profiling e: stress-scale per-stage split (shadows on/off) and
fwd/bwd decomposition for the soft tiled path."""
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


def fwd_bwd(scene, cfg):
    scene = jax.device_put(scene)

    def step(c):
        def loss(s):
            img = render_soft_pallas(s, c, cfg, interpret=False)
            return jnp.mean(img[..., :3] ** 2)

        val, g = jax.value_and_grad(loss)(scene)
        return val + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    return step


def fwd_only(scene, cfg):
    scene = jax.device_put(scene)

    def step(c):
        img = render_soft_pallas(scene, c, cfg, interpret=False)
        return jnp.sum(img[::61, ::61])

    return step


def main():
    print(f"# device: {jax.devices()[0].platform} "
          f"SUB_PIX_BWD={os.environ.get('OCTRT_SUB_PIX_BWD', '2048')}",
          file=sys.stderr)
    cam = legacy_ortho_camera()
    scene = random_scene(100, 100, seed=0, bounds=(float(W) - 10, float(H) - 10))
    base = dict(width=W, height=H, shading="phong", soft=True,
                framebuffer_dtype="float", tau_depth=1.0, tau_edge=0.5,
                cull_k=96, shadow_cull_k=136)
    cfg_sh = RenderConfig(shadows=True, **base)
    cfg_nosh = RenderConfig(shadows=False, **base)

    rows = []
    for label, step, n in (
        ("A fwd+bwd shadows", fwd_bwd(scene, cfg_sh), 5),
        ("B fwd+bwd NO shadows", fwd_bwd(scene, cfg_nosh), 5),
        ("C fwd only shadows", fwd_only(scene, cfg_sh), 8),
        ("D fwd only NO shadows", fwd_only(scene, cfg_nosh), 8),
    ):
        us = device_step_time_us(step, cam, n_frames=n)
        rows.append((label, us))
        print(f"{label}: {us:.0f} us", file=sys.stderr)
    try:
        print(f"-> bwd shadows = {rows[0][1] - rows[2][1]:.0f} us total bwd; "
              f"shadow share of bwd = "
              f"{(rows[0][1] - rows[2][1]) - (rows[1][1] - rows[3][1]):.0f} us",
              file=sys.stderr)
    except Exception:
        pass


if __name__ == "__main__":
    main()
