#!/usr/bin/env python
"""Round-5 profiling b: true camera-dependent in-graph binning cost."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from opencl_ray_tracer_tpu import (
    RenderConfig, legacy_ortho_camera, pinhole_camera,
)
from opencl_ray_tracer_tpu.bench_util import (
    device_frame_time_us, device_step_time_us,
)
from opencl_ray_tracer_tpu.kernels.fwd_tiled import (
    bin_scene, render_tiled, render_tiled_packed,
)
from opencl_ray_tracer_tpu.scene import random_scene

W, H = 1920, 1080


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform}", file=sys.stderr)
    cam = legacy_ortho_camera()
    cam_ph = pinhole_camera(
        position=(W / 2.0, H / 2.0, 900.0), look_at=(W / 2.0, H / 2.0, -85.0),
        fov_degrees=60.0, width=W, height=H,
    )
    scene_hl = random_scene(10, 1, seed=0, bounds=(float(W) - 10, float(H) - 10))
    packed = jax.device_put(scene_hl.pack())
    print(f"# lights: {packed.lights.position.shape[0]}", file=sys.stderr)
    cfg = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                       framebuffer_dtype="packed")

    # true dynamic frame: camera-dependent bins in graph (same recipe for
    # both camera families — only the camera passed differs)
    def dyn_frame(c):
        b = bin_scene(packed, height=H, width=W, k=cfg.cull_k,
                      shadows=True, shadow_k=cfg.shadow_cull_k, camera=c)
        return render_tiled_packed(packed, c, cfg, interpret=False, bins=b)

    us = device_frame_time_us(dyn_frame, cam, n_frames=50)
    print(f"dynamic ortho frame (camera-dep bins in graph): {us:.0f} us",
          file=sys.stderr)
    us = device_frame_time_us(dyn_frame, cam_ph, n_frames=50)
    print(f"dynamic pinhole frame (camera-dep bins in graph): {us:.0f} us",
          file=sys.stderr)

    # binning alone, camera-dependent (ortho)
    def bins_only(c):
        b = bin_scene(packed, height=H, width=W, k=cfg.cull_k,
                      shadows=True, shadow_k=cfg.shadow_cull_k, camera=c)
        return (jnp.sum(b.counts) + jnp.sum(b.t_idx[:, :1])
                + jnp.sum(b.tri_sh_t[..., 0]).astype(jnp.int32)
                + jnp.sum(b.sph_sh_t[..., 0]).astype(jnp.int32)
                + jnp.sum(b.tri_attr_t[..., 0]).astype(jnp.int32))

    us = device_step_time_us(bins_only, cam, n_frames=50)
    print(f"bin_scene ortho camera-dep alone: {us:.0f} us", file=sys.stderr)

    # binning alone, pinhole
    us = device_step_time_us(bins_only, cam_ph, n_frames=50)
    print(f"bin_scene pinhole alone: {us:.0f} us", file=sys.stderr)

    # primary binning only (no shadows), camera-dependent
    def bins_primary(c):
        b = bin_scene(packed, height=H, width=W, k=cfg.cull_k,
                      shadows=False, shadow_k=cfg.shadow_cull_k, camera=c)
        return (jnp.sum(b.counts) + jnp.sum(b.t_idx[:, :1])
                + jnp.sum(b.tri_attr_t[..., 0]).astype(jnp.int32))

    us = device_step_time_us(bins_primary, cam, n_frames=50)
    print(f"bin_scene ortho primary-only: {us:.0f} us", file=sys.stderr)

    us = device_step_time_us(bins_primary, cam_ph, n_frames=50)
    print(f"bin_scene pinhole primary-only: {us:.0f} us", file=sys.stderr)

    # stress-scale binning (the soft path bins are similar shape)
    scene_st = random_scene(100, 100, seed=0,
                            bounds=(float(W) - 10, float(H) - 10))
    packed_st = jax.device_put(scene_st.pack())

    def bins_stress(c):
        b = bin_scene(packed_st, height=H, width=W, k=96,
                      shadows=True, shadow_k=136, camera=c)
        return (jnp.sum(b.counts) + jnp.sum(b.t_idx[:, :1])
                + jnp.sum(b.tri_sh_t[..., 0]).astype(jnp.int32)
                + jnp.sum(b.sph_sh_t[..., 0]).astype(jnp.int32))

    us = device_step_time_us(bins_stress, cam, n_frames=30)
    print(f"bin_scene stress (200 prim, k=96) ortho: {us:.0f} us",
          file=sys.stderr)

    # candidate-count stats for the SOFT stress bins
    from opencl_ray_tracer_tpu.kernels.soft_tiled import _bin_soft
    import numpy as np

    sb = _bin_soft(packed_st, jnp.float32(0.5), cam, height=H, width=W,
                   k=96, shadows=True, shadow_k=136)
    cnts = np.asarray(sb.counts)
    print(f"soft stress bins: counts mean per tile "
          f"tri={cnts[:, 0].mean():.1f} sph={cnts[:, 1].mean():.1f} "
          f"shadow={cnts[:, 2:].mean(0)} max tri={cnts[:, 0].max()} "
          f"sph={cnts[:, 1].max()}", file=sys.stderr)
    chunks = np.ceil(cnts / 8.0)
    print(f"soft stress mean chunks/tile: primary "
          f"{chunks[:, :2].sum(1).mean():.1f} shadow "
          f"{chunks[:, 2:].sum(1).mean():.1f}", file=sys.stderr)

    hl = scene_hl.pack()
    sb2 = _bin_soft(jax.device_put(hl), jnp.float32(0.5), cam, height=H,
                    width=W, k=32, shadows=True, shadow_k=64)
    c2 = np.asarray(sb2.counts)
    print(f"soft headline bins: mean tri={c2[:, 0].mean():.1f} "
          f"sph={c2[:, 1].mean():.1f} shadow={c2[:, 2:].mean(0)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
