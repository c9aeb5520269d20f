#!/usr/bin/env python
"""Round-5 profiling c: why are soft shadow candidates 33/tile when the
hard path's segment-hull culling gets ~2? Sweep the sigma pad and compare
against hard bins on the same scene."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from opencl_ray_tracer_tpu import legacy_ortho_camera
from opencl_ray_tracer_tpu.scene import random_scene
import opencl_ray_tracer_tpu.kernels.soft_tiled as stl
from opencl_ray_tracer_tpu.kernels.fwd_tiled import bin_scene

W, H = 1920, 1080


def main():
    cam = legacy_ortho_camera()
    scene = random_scene(100, 100, seed=0, bounds=(float(W) - 10, float(H) - 10))
    packed = jax.device_put(scene.pack())
    print(f"# lights z: {np.asarray(packed.lights.position)}", file=sys.stderr)
    r = np.asarray(packed.sph_radius[0][: packed.n_spheres])
    print(f"# sphere radii: min {r.min():.1f} mean {r.mean():.1f} "
          f"max {r.max():.1f}", file=sys.stderr)

    hard = bin_scene(packed, height=H, width=W, k=96, shadows=True,
                     shadow_k=136, camera=None)
    hc = np.asarray(hard.counts)
    print(f"hard bins: mean tri={hc[:, 0].mean():.1f} sph={hc[:, 1].mean():.1f} "
          f"shadow={hc[:, 2:].mean(0)}", file=sys.stderr)

    for sig in (16.0, 8.0, 4.0, 1.0, 0.0):
        orig = stl.SOFT_CULL_SIGMAS
        stl.SOFT_CULL_SIGMAS = sig
        try:
            sb = stl._bin_soft(packed, jnp.float32(0.5), cam, height=H,
                               width=W, k=96, shadows=True, shadow_k=136)
        finally:
            stl.SOFT_CULL_SIGMAS = orig
        c = np.asarray(sb.counts)
        ch = np.ceil(c / 8.0)
        print(f"soft bins sigma={sig:4.1f} (pad={sig * 0.5:4.1f}): "
              f"tri={c[:, 0].mean():5.1f} sph={c[:, 1].mean():4.1f} "
              f"sh={c[:, 2:].mean(0)} | chunks prim "
              f"{ch[:, :2].sum(1).mean():4.1f} sh {ch[:, 2:].sum(1).mean():4.1f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
