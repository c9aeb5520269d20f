#!/usr/bin/env python
"""Round-5 profiling: where does the in-graph binning time go, and what is
the honest (all-grad-leaf) stress fwd+bwd number? Run on the real chip."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
from opencl_ray_tracer_tpu.bench_util import device_frame_time_us, device_step_time_us
from opencl_ray_tracer_tpu.kernels.fwd_tiled import bin_scene, render_tiled_packed
from opencl_ray_tracer_tpu.scene import random_scene

W, H = 1920, 1080


def timed(label, fn, *args, reps=7):
    out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter_ns()
        out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter_ns() - t0) / 1e3)
    samples.sort()
    print(f"{label}: {samples[len(samples)//2]:.0f} us (min {samples[0]:.0f})",
          file=sys.stderr)
    return samples[len(samples) // 2]


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform}", file=sys.stderr)
    cam = legacy_ortho_camera()
    scene_hl = random_scene(10, 1, seed=0, bounds=(float(W) - 10, float(H) - 10))
    packed_hl = jax.device_put(scene_hl.pack())
    cfg_hl = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                          framebuffer_dtype="packed")

    # --- 1. binning cost, headline scene (single dispatch timing: includes
    # the ~30ms control overhead, so use the slope harness via a scan) ---
    def bins_probe(c):
        b = bin_scene(packed_hl, height=H, width=W, k=cfg_hl.cull_k,
                      shadows=True, shadow_k=cfg_hl.shadow_cull_k,
                      camera=c if c.normalize else None)
        # consume: sum of counts + first index words + shadow tables
        return (jnp.sum(b.counts) + jnp.sum(b.t_idx[:, :1])
                + jnp.sum(b.s_idx[:, :1])
                + jnp.sum(b.tri_sh_t[:, :, 0]).astype(jnp.int32)
                + jnp.sum(b.sph_sh_t[:, :, 0]).astype(jnp.int32))

    us_bin = device_step_time_us(bins_probe, cam, n_frames=30)
    print(f"bin_scene headline slope: {us_bin:.0f} us", file=sys.stderr)

    # binning WITHOUT shadows
    def bins_probe_nosh(c):
        b = bin_scene(packed_hl, height=H, width=W, k=cfg_hl.cull_k,
                      shadows=False, shadow_k=cfg_hl.shadow_cull_k,
                      camera=None)
        return (jnp.sum(b.counts) + jnp.sum(b.t_idx[:, :1])
                + jnp.sum(b.s_idx[:, :1])).astype(jnp.int32)

    us_bin_ns = device_step_time_us(bins_probe_nosh, cam, n_frames=30)
    print(f"bin_scene headline no-shadows slope: {us_bin_ns:.0f} us",
          file=sys.stderr)

    # full dynamic frame: bins in-graph + render
    def dyn_frame(c):
        b = bin_scene(packed_hl, height=H, width=W, k=cfg_hl.cull_k,
                      shadows=True, shadow_k=cfg_hl.shadow_cull_k,
                      camera=None)
        return render_tiled_packed(packed_hl, c, cfg_hl, interpret=False,
                                   bins=b)

    us_dyn = device_frame_time_us(dyn_frame, cam, n_frames=50)
    print(f"dynamic frame (in-graph bins + render): {us_dyn:.0f} us",
          file=sys.stderr)

    # static-bin render for contrast
    bins = bin_scene(packed_hl, height=H, width=W, k=cfg_hl.cull_k,
                     shadows=True, shadow_k=cfg_hl.shadow_cull_k, camera=None)
    us_static = device_frame_time_us(
        lambda c: render_tiled_packed(packed_hl, c, cfg_hl, interpret=False,
                                      bins=bins), cam, n_frames=50)
    print(f"static-bin render: {us_static:.0f} us", file=sys.stderr)

    # --- 2. honest stress fwd+bwd ---
    from opencl_ray_tracer_tpu.kernels.soft import render_soft_pallas

    scene_st = random_scene(100, 100, seed=0, bounds=(float(W) - 10, float(H) - 10))
    scene_st = jax.device_put(scene_st)
    cfg_st = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                          soft=True, framebuffer_dtype="float",
                          tau_depth=1.0, tau_edge=0.5, cull_k=96,
                          shadow_cull_k=136)

    def step_all(c):
        def loss(s):
            img = render_soft_pallas(s, c, cfg_st, interpret=False)
            return jnp.mean(img[..., :3] ** 2)
        val, g = jax.value_and_grad(loss)(scene_st)
        return val + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    def step_3leaf(c):
        def loss(s):
            img = render_soft_pallas(s, c, cfg_st, interpret=False)
            return jnp.mean(img[..., :3] ** 2)
        val, g = jax.value_and_grad(loss)(scene_st)
        return (val + jnp.sum(g.sphere_origin) + jnp.sum(g.sphere_radius)
                + jnp.sum(g.lights.position))

    us3 = device_step_time_us(step_3leaf, cam, n_frames=5)
    print(f"stress fwd+bwd (3-leaf consume, round-4 form): {us3:.0f} us -> "
          f"{W*H/(us3/1e6):.3e} rays/s", file=sys.stderr)
    usa = device_step_time_us(step_all, cam, n_frames=5)
    print(f"stress fwd+bwd (ALL leaves consumed): {usa:.0f} us -> "
          f"{W*H/(usa/1e6):.3e} rays/s", file=sys.stderr)

    # forward-only soft at stress scale for the fwd/bwd split
    def fwd_only(c):
        img = render_soft_pallas(scene_st, c, cfg_st, interpret=False)
        return jnp.sum(img[::97, ::97])

    usf = device_step_time_us(fwd_only, cam, n_frames=10)
    print(f"stress soft fwd only: {usf:.0f} us", file=sys.stderr)


if __name__ == "__main__":
    main()
