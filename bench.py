#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric (BASELINE.md): primary rays/s/chip at 1080p, forward, on the
BASELINE.json config-2 scene (10 spheres + 1 cube, Phong + hard shadows),
fused Pallas kernels. vs_baseline is against the 1e9 rays/s/chip target.
The JSON line also carries the fwd+bwd (soft differentiable, fused Pallas
backward) rays/s and the headline's speed-of-light fraction.

Timing: N frames inside one jitted lax.scan with per-frame camera jitter and
scalar consumption (see opencl_ray_tracer_tpu/bench_util.py) — this measures
device compute, not the control-tunnel latency of this environment.

Extra context rows (other scenes/modes) go to stderr so stdout stays one line.
Run on the real chip: plain `python bench.py` under the session env.
CLI knobs (also reachable via `octrt bench`): --scene/--width/--height to
bench a library scene instead of the default matrix, --skip-context for the
headline rows only.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp

from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
from opencl_ray_tracer_tpu.bench_util import (
    device_frame_time_us,
    device_step_time_us,
)
from opencl_ray_tracer_tpu.kernels.fwd import render_pallas_packed
from opencl_ray_tracer_tpu.kernels.fwd_tiled import bin_scene, render_tiled_packed
from opencl_ray_tracer_tpu.scene import create_scene, random_scene
from opencl_ray_tracer_tpu.utils.profiling import sol_fraction

TARGET_RAYS_PER_S = 1.0e9       # BASELINE.md north-star target per v5e chip
TARGET_FWDBWD_RAYS_PER_S = 1.0e8  # VERDICT round-2 fwd+bwd target

W, H = 1920, 1080


def bench_config(scene, config, cam=None, tiled=True, n_frames=100):
    cam = cam or legacy_ortho_camera()
    packed = jax.device_put(scene.pack())
    if tiled:
        # Scene-static binning precomputed once (the production hot-loop
        # pattern: scene fixed, camera varies per frame).
        bins = bin_scene(
            packed, height=config.height, width=config.width,
            k=config.cull_k, shadows=config.shadows,
            shadow_k=config.shadow_cull_k,
            camera=cam if cam.normalize else None,
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


def bench_fwd_bwd_soft(scene, config, cam=None, n_frames=20):
    """fwd+bwd step time: fused Pallas forward AND backward through the soft
    differentiable renderer; grads w.r.t. every scene parameter."""
    from opencl_ray_tracer_tpu.kernels.soft import render_soft_pallas

    cam = cam or legacy_ortho_camera()
    scene = jax.device_put(scene)

    def step(c):
        def loss(s):
            img = render_soft_pallas(s, c, config, interpret=False)
            return jnp.mean(img[..., :3] ** 2)

        val, g = jax.value_and_grad(loss)(scene)
        # consume a few grad leaves so DCE can't drop the backward
        return (
            val
            + jnp.sum(g.sphere_origin)
            + jnp.sum(g.sphere_radius)
            + jnp.sum(g.lights.position)
        )

    us = device_step_time_us(step, cam, n_frames=n_frames)
    rays_per_s = (config.width * config.height) / (us / 1e6)
    return us, rays_per_s


def row(label, us, rays):
    print(f"# {label}: {us:.0f} us/frame -> {rays:.3e} rays/s", file=sys.stderr)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--scene", type=int, default=None,
                    help="bench a library scene (1-3) instead of the default matrix")
    ap.add_argument("--width", type=int, default=W)
    ap.add_argument("--height", type=int, default=H)
    ap.add_argument("--shading", default="phong",
                    choices=["legacy", "lambert", "phong"])
    ap.add_argument("--no-shadows", action="store_true")
    ap.add_argument("--cull-k", type=int, default=None)
    ap.add_argument("--skip-context", action="store_true",
                    help="headline fwd + fwd/bwd rows only")
    args = ap.parse_args(argv)

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    wid, hgt = args.width, args.height

    if args.scene is not None:
        # ad-hoc mode: bench one library scene, print its JSON line, done
        scene = create_scene(args.scene, seed=0)
        cfg = RenderConfig(
            width=wid, height=hgt, shading=args.shading,
            shadows=not args.no_shadows,
            framebuffer_dtype="int" if args.shading == "legacy" else "float",
            **({"cull_k": args.cull_k} if args.cull_k else {}),
        )
        us, rays = bench_config(scene, cfg, tiled=True)
        row(f"scene{args.scene} {args.shading} {wid}x{hgt}", us, rays)
        print(json.dumps({
            "metric": f"rays_per_s_scene{args.scene}_{args.shading}_{wid}x{hgt}",
            "value": rays, "unit": "rays/s",
            "vs_baseline": rays / TARGET_RAYS_PER_S,
        }))
        return

    scene_hl = random_scene(10, 1, seed=0, bounds=(float(wid) - 10, float(hgt) - 10))
    cfg_hl = RenderConfig(
        width=wid, height=hgt, shading="phong", shadows=True,
        framebuffer_dtype="float",
    )
    us, rays = bench_config(scene_hl, cfg_hl, tiled=True)
    row("headline tiled phong+shadows 1080p 10sph+1cube", us, rays)
    # SOL roofline context: tiled kernel visits ~cull_k primitive slots per
    # pixel (+1 light's shadow slots); count both passes' slots.
    packed_hl = scene_hl.pack()
    n_slots = min(cfg_hl.cull_k, packed_hl.padded_tris + packed_hl.padded_spheres)
    sol = sol_fraction(us, wid * hgt, n_prim_slots=2 * n_slots)
    print(
        f"# headline SOL: bound={sol['bound']} ideal={sol['ideal_us']:.0f}us "
        f"achieved_fraction={sol['achieved_fraction']:.3f}",
        file=sys.stderr,
    )

    # fwd+bwd: BASELINE config 3 — same scene, phong + shadows, backward pass
    cfg_soft = RenderConfig(
        width=wid, height=hgt, shading="phong", shadows=True, soft=True,
        framebuffer_dtype="float", tau_depth=1.0, tau_edge=0.5,
    )
    try:
        us_g, rays_g = bench_fwd_bwd_soft(scene_hl, cfg_soft)
        row("fwd+bwd soft phong+shadows 1080p 10sph+1cube", us_g, rays_g)
    except Exception as e:
        print(f"# fwd+bwd bench failed: {type(e).__name__}: {e}", file=sys.stderr)
        us_g, rays_g = float("nan"), 0.0

    if not args.skip_context:
        try:
            cfg_legacy = RenderConfig(width=wid, height=hgt, shading="legacy")
            u2, r2 = bench_config(scene_hl, cfg_legacy, tiled=True)
            row("tiled legacy 1080p 10sph+1cube", u2, r2)
            # real pinhole camera through the projective tiled path
            from opencl_ray_tracer_tpu import pinhole_camera

            cam_ph = pinhole_camera(
                position=(wid / 2.0, hgt / 2.0, 900.0),
                look_at=(wid / 2.0, hgt / 2.0, -85.0),
                fov_degrees=60.0, width=wid, height=hgt,
            )
            u2p, r2p = bench_config(scene_hl, cfg_legacy, cam=cam_ph, tiled=True)
            row("tiled legacy 1080p pinhole (projective culling)", u2p, r2p)
            u2b, r2b = bench_config(scene_hl, cfg_legacy, tiled=False, n_frames=30)
            row("brute legacy 1080p 10sph+1cube", u2b, r2b)
            scene_stress = random_scene(
                100, 100, seed=0, bounds=(float(wid) - 10, float(hgt) - 10)
            )
            cfg_stress = cfg_legacy.replace(cull_k=96)
            u3, r3 = bench_config(scene_stress, cfg_stress, tiled=True, n_frames=30)
            row("tiled legacy 1080p 100sph+100cubes (1200 tris, k=96)", u3, r3)
            # BASELINE config 4 analogue: ~100-primitive scene, fwd+bwd
            scene_100 = random_scene(
                50, 4, seed=1, bounds=(float(wid) - 10, float(hgt) - 10)
            )
            cfg_100 = RenderConfig(
                width=wid, height=hgt, shading="phong", shadows=True,
                soft=True, framebuffer_dtype="float",
                tau_depth=1.0, tau_edge=0.5,
            )
            u4, r4 = bench_fwd_bwd_soft(scene_100, cfg_100, n_frames=10)
            row("fwd+bwd soft phong+shadows 1080p 50sph+4cubes", u4, r4)
            # BASELINE config 5 analogue: 4K render, 200 primitives
            w4k, h4k = 3840, 2160
            scene_4k = random_scene(
                100, 100, seed=2, bounds=(float(w4k) - 10, float(h4k) - 10)
            )
            cfg_4k = RenderConfig(
                width=w4k, height=h4k, shading="legacy", cull_k=96
            )
            u5, r5 = bench_config(scene_4k, cfg_4k, tiled=True, n_frames=30)
            row("tiled legacy 4K 100sph+100cubes (1200 tris, k=96)", u5, r5)
        except Exception as e:  # context rows must never kill the headline
            print(f"# context bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_s_per_chip_1080p_fwd_phong_shadows",
                "value": rays,
                "unit": "rays/s",
                "vs_baseline": rays / TARGET_RAYS_PER_S,
                "sol_fraction": round(sol["achieved_fraction"], 4),
                "sol_bound": sol["bound"],
                "fwd_bwd_rays_per_s": rays_g,
                "fwd_bwd_vs_target": rays_g / TARGET_FWDBWD_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
