#!/usr/bin/env python
"""Chase the headline row's session bimodality (VERDICT r4 #4): repeat the
full slope measurement N times with spacing and idle gaps, print each
sample + the scan totals, looking for drift/phase structure."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
from opencl_ray_tracer_tpu.bench_util import device_frame_time_us
from opencl_ray_tracer_tpu.kernels.fwd_tiled import bin_scene, render_tiled_packed
from opencl_ray_tracer_tpu.scene import random_scene

W, H = 1920, 1080


def main():
    cam = legacy_ortho_camera()
    scene = random_scene(10, 1, seed=0, bounds=(float(W) - 10, float(H) - 10))
    packed = jax.device_put(scene.pack())
    cfg = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                       framebuffer_dtype="packed")
    bins = bin_scene(packed, height=H, width=W, k=cfg.cull_k, shadows=True,
                     shadow_k=cfg.shadow_cull_k, camera=None)
    fn = lambda c: render_tiled_packed(packed, c, cfg, interpret=False,
                                       bins=bins)
    t0 = time.time()
    for i in range(12):
        us = device_frame_time_us(fn, cam, n_frames=100)
        print(f"t+{time.time() - t0:6.1f}s sample {i}: {us:7.1f} us/frame",
              file=sys.stderr)
        if i == 5:
            print("# idling 60 s (cool-down probe)", file=sys.stderr)
            time.sleep(60)


if __name__ == "__main__":
    main()
