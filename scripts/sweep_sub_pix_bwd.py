#!/usr/bin/env python
"""Sweep SUB_PIX_BWD (the backward kernel's pixel-strip width) on the real
chip — closes the "4096: ?" hole from VERDICT r3 #2. Each width runs in a
fresh subprocess (the constant is read at import via OCTRT_SUB_PIX_BWD).

Also measures the per-stage split of the fwd+bwd step by config deltas:
  A fwd+bwd phong+shadows   (everything)
  B fwd+bwd phong           (minus occluder vjps + shadow-table writeback)
  C fwd-only phong+shadows  (minus every vjp + table writeback)
so  bwd total = A - C,  occluder-vjp share ~= A - B - (fwd shadow cost).

Usage: python scripts/sweep_sub_pix_bwd.py            # the sweep
       python scripts/sweep_sub_pix_bwd.py --worker N # internal
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
    from opencl_ray_tracer_tpu.bench_util import (
        device_frame_time_us,
        device_step_time_us,
    )
    from opencl_ray_tracer_tpu.kernels.soft import render_soft_pallas
    from opencl_ray_tracer_tpu.scene import random_scene

    W, H = 1920, 1080
    scene = jax.device_put(
        random_scene(10, 1, seed=0, bounds=(float(W) - 10, float(H) - 10))
    )
    cam = legacy_ortho_camera()

    def cfg(shadows):
        return RenderConfig(
            width=W, height=H, shading="phong", shadows=shadows, soft=True,
            framebuffer_dtype="float", tau_depth=1.0, tau_edge=0.5,
        )

    def fwd_bwd_us(config, n=20):
        def step(c):
            def loss(s):
                img = render_soft_pallas(s, c, config, interpret=False)
                return jnp.mean(img[..., :3] ** 2)

            val, g = jax.value_and_grad(loss)(scene)
            return val + jnp.sum(g.sphere_origin) + jnp.sum(g.sphere_radius)

        return device_step_time_us(step, cam, n_frames=n)

    def fwd_us(config, n=30):
        fn = lambda c: render_soft_pallas(scene, c, config, interpret=False)
        return device_frame_time_us(fn, cam, n_frames=n)

    width = int(os.environ.get("OCTRT_SUB_PIX_BWD", "2048"))
    out = {
        "sub_pix_bwd": width,
        "A_fwdbwd_shadows_us": fwd_bwd_us(cfg(True)),
    }
    if width == 2048:  # per-stage split only needed at the default width
        out["B_fwdbwd_noshadow_us"] = fwd_bwd_us(cfg(False))
        out["C_fwd_shadows_us"] = fwd_us(cfg(True))
        out["D_fwd_noshadow_us"] = fwd_us(cfg(False))
    print(json.dumps(out))


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    for width in (1024, 2048, 4096, 8192):
        env = dict(os.environ)
        env["OCTRT_SUB_PIX_BWD"] = str(width)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=3000,
        )
        if proc.returncode != 0:
            print(f"width {width} FAILED: {proc.stderr[-500:]}",
                  file=sys.stderr)
            continue
        print(proc.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
