"""Profile the 100-primitive soft fwd+bwd config (BASELINE config-4 analogue).

Separates fwd-only vs fwd+bwd time, and prints per-tile candidate-count
statistics so we can see whether intersection work or fixed per-tile
overhead dominates. Run on the real chip.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
from opencl_ray_tracer_tpu.bench_util import device_frame_time_us, device_step_time_us
from opencl_ray_tracer_tpu.kernels.soft import render_soft_pallas
from opencl_ray_tracer_tpu.scene import random_scene

W, H = 1920, 1080

scene = random_scene(50, 4, seed=1, bounds=(float(W) - 10, float(H) - 10))
cfg = RenderConfig(
    width=W, height=H, shading="phong", shadows=True, soft=True,
    framebuffer_dtype="float", tau_depth=1.0, tau_edge=0.5,
)
cam = legacy_ortho_camera()
scene = jax.device_put(scene)

# candidate-count stats from the soft binning
from opencl_ray_tracer_tpu.kernels.soft_tiled import _bin_soft

bins = _bin_soft(
    scene.pack(), jnp.float32(cfg.tau_edge), cam,
    height=H, width=W, k=cfg.cull_k, shadows=True, shadow_k=cfg.shadow_cull_k,
)
cnts = np.asarray(bins.counts)
print(f"# counts shape {cnts.shape} (tiles x [tri, sph, sh_tri/l, sh_sph/l...])",
      file=sys.stderr)
for j in range(cnts.shape[1]):
    c = cnts[:, j]
    ch = np.ceil(c / 8.0)
    print(f"#   col{j}: mean={c.mean():.2f} max={c.max()} "
          f"mean-chunks={ch.mean():.2f} frac-zero={(c == 0).mean():.2f}",
          file=sys.stderr)

# fwd only
fwd = lambda c: render_soft_pallas(scene, c, cfg, interpret=False)
us_f = device_frame_time_us(fwd, cam, n_frames=30)
print(f"fwd only: {us_f:.0f} us", file=sys.stderr)


def step(c):
    def loss(s):
        img = render_soft_pallas(s, c, cfg, interpret=False)
        return jnp.mean(img[..., :3] ** 2)

    val, g = jax.value_and_grad(loss)(scene)
    return val + jnp.sum(g.sphere_origin) + jnp.sum(g.sphere_radius) + jnp.sum(
        g.lights.position
    )


us_fb = device_step_time_us(step, cam, n_frames=10)
print(f"fwd+bwd: {us_fb:.0f} us (bwd ~= {us_fb - us_f:.0f})", file=sys.stderr)

# no-shadows variant: how much of the time is the shadow pass?
cfg_ns = cfg.replace(shadows=False)
fwd_ns = lambda c: render_soft_pallas(scene, c, cfg_ns, interpret=False)
us_fns = device_frame_time_us(fwd_ns, cam, n_frames=30)


def step_ns(c):
    def loss(s):
        img = render_soft_pallas(s, c, cfg_ns, interpret=False)
        return jnp.mean(img[..., :3] ** 2)

    val, g = jax.value_and_grad(loss)(scene)
    return val + jnp.sum(g.sphere_origin) + jnp.sum(g.sphere_radius) + jnp.sum(
        g.lights.position
    )


us_fbns = device_step_time_us(step_ns, cam, n_frames=10)
print(f"no-shadows fwd: {us_fns:.0f} us, fwd+bwd: {us_fbns:.0f} us",
      file=sys.stderr)
