#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): primary rays/s/chip at 1080p, forward, on the
BASELINE.json config-2 scene (10 spheres + 1 cube, Phong + hard shadows),
fused Pallas kernels. vs_baseline is against the 1e9 rays/s/chip target.

Timing: N frames inside one jitted lax.scan with per-frame camera jitter and
scalar consumption (see opencl_ray_tracer_tpu/bench_util.py) — this measures
device compute, not the control-tunnel latency of this environment.

Extra context rows (other scenes/modes) go to stderr so stdout stays one line.
Run on the real chip: plain `python bench.py` under the session env.
"""

from __future__ import annotations

import json
import sys

import jax

from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
from opencl_ray_tracer_tpu.bench_util import device_frame_time_us
from opencl_ray_tracer_tpu.kernels.fwd import render_pallas_packed
from opencl_ray_tracer_tpu.kernels.fwd_tiled import bin_scene, render_tiled_packed
from opencl_ray_tracer_tpu.scene import random_scene

TARGET_RAYS_PER_S = 1.0e9  # BASELINE.md north-star target per v5e chip

W, H = 1920, 1080


def bench_config(scene, config, tiled=True, n_frames=100):
    cam = legacy_ortho_camera()
    packed = jax.device_put(scene.pack())
    if tiled:
        # Scene-static binning precomputed once (the production hot-loop
        # pattern: scene fixed, camera varies per frame).
        bins = bin_scene(
            packed, height=config.height, width=config.width,
            k=config.cull_k, shadows=config.shadows,
            shadow_k=config.shadow_cull_k,
        )
        if bool(bins.overflow):
            print(f"# WARNING: cull_k={config.cull_k} overflow -> brute path",
                  file=sys.stderr)
        fn = lambda c: render_tiled_packed(
            packed, c, config, interpret=False, bins=bins
        )
    else:
        fn = lambda c: render_pallas_packed(packed, c, config, interpret=False)
    us = device_frame_time_us(fn, cam, n_frames=n_frames)
    rays_per_s = (config.width * config.height) / (us / 1e6)
    return us, rays_per_s


def row(label, us, rays):
    print(f"# {label}: {us:.0f} us/frame -> {rays:.3e} rays/s", file=sys.stderr)


def main() -> None:
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    scene_hl = random_scene(10, 1, seed=0, bounds=(float(W) - 10, float(H) - 10))
    cfg_hl = RenderConfig(
        width=W, height=H, shading="phong", shadows=True,
        framebuffer_dtype="float",
    )
    us, rays = bench_config(scene_hl, cfg_hl, tiled=True)
    row("headline tiled phong+shadows 1080p 10sph+1cube", us, rays)

    try:
        cfg_legacy = RenderConfig(width=W, height=H, shading="legacy")
        u2, r2 = bench_config(scene_hl, cfg_legacy, tiled=True)
        row("tiled legacy 1080p 10sph+1cube", u2, r2)
        u2b, r2b = bench_config(scene_hl, cfg_legacy, tiled=False, n_frames=30)
        row("brute legacy 1080p 10sph+1cube", u2b, r2b)
        scene_stress = random_scene(
            100, 100, seed=0, bounds=(float(W) - 10, float(H) - 10)
        )
        cfg_stress = cfg_legacy.replace(cull_k=96)
        u3, r3 = bench_config(scene_stress, cfg_stress, tiled=True, n_frames=30)
        row("tiled legacy 1080p 100sph+100cubes (1200 tris, k=96)", u3, r3)
    except Exception as e:  # context rows must never kill the headline
        print(f"# context bench failed: {type(e).__name__}: {e}", file=sys.stderr)

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
