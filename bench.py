#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): primary rays/s/chip at 1080p, forward, on the
BASELINE.json config-2 scene (10 spheres + 1 cube, Phong + hard shadows),
fused Pallas megakernel. vs_baseline is against the 1e9 rays/s/chip target.

Extra context rows (other scenes/modes) go to stderr so stdout stays one line.

Run on the real chip: plain `python bench.py` under the session env
(JAX_PLATFORMS=axon). Scene coordinates are scaled to fill the 1080p frame
(the reference's scenes live in 640x480 image-space units).
"""

from __future__ import annotations

import json
import sys

import jax

from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
from opencl_ray_tracer_tpu.kernels import render_pallas
from opencl_ray_tracer_tpu.scene import random_scene
from opencl_ray_tracer_tpu.utils import time_fn

TARGET_RAYS_PER_S = 1.0e9  # BASELINE.md north-star target per v5e chip

W, H = 1920, 1080


def bench_config(scene, config, iters=20, warmup=3):
    cam = legacy_ortho_camera()
    fn = lambda: render_pallas(scene, cam, config)
    stats = time_fn(fn, iters=iters, warmup=warmup)
    rays_per_s = (config.width * config.height) / (stats["median_us"] / 1e6)
    return stats, rays_per_s


def main() -> None:
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    # Headline: config 2 — 10 spheres + 1 cube, 1080p, phong + hard shadows.
    scene_hl = random_scene(10, 1, seed=0, bounds=(float(W) - 10, float(H) - 10))
    cfg_hl = RenderConfig(
        width=W, height=H, shading="phong", shadows=True,
        framebuffer_dtype="float",
    )
    stats, rays = bench_config(scene_hl, cfg_hl)
    print(
        f"# headline phong+shadows 1080p 10sph+1cube: {stats['median_us']:.0f} us "
        f"-> {rays:.3e} rays/s", file=sys.stderr,
    )

    # Context: legacy shading same scene; stress scene 100+100.
    try:
        cfg_legacy = RenderConfig(width=W, height=H, shading="legacy")
        st2, r2 = bench_config(scene_hl, cfg_legacy, iters=10)
        print(
            f"# legacy 1080p 10sph+1cube: {st2['median_us']:.0f} us -> {r2:.3e} rays/s",
            file=sys.stderr,
        )
        scene_stress = random_scene(
            100, 100, seed=0, bounds=(float(W) - 10, float(H) - 10)
        )
        st3, r3 = bench_config(scene_stress, cfg_legacy, iters=5, warmup=2)
        print(
            f"# legacy 1080p 100sph+100cubes (1200 tris): {st3['median_us']:.0f} us "
            f"-> {r3:.3e} rays/s", file=sys.stderr,
        )
    except Exception as e:  # context rows must never kill the headline
        print(f"# context bench failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_s_per_chip_1080p_fwd_phong_shadows",
                "value": rays,
                "unit": "rays/s",
                "vs_baseline": rays / TARGET_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
