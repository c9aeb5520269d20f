#!/usr/bin/env python
"""Diagnose the fixed-work CPU-mesh efficiency decay (VERDICT r3 #3).

BENCH_r03 recorded n=8 efficiency 0.60 at fixed 256x256 total work. Two
candidate causes:
  (a) per-shard program overhead (dispatch + XLA per-program fixed cost +
      psum sync barriers) — amortizes away as shard size grows;
  (b) communication volume — would NOT improve with bigger shards (psum
      payload is O(scene), constant).
So: measure efficiency at n in {1, 8} across work sizes 128/256/512, and
separately time the FWD-only sharded render (no psum at all) vs the train
step. Prints one JSON line per (mode, size, n) from subprocess workers.

Usage: python scripts/scaling_diagnosis.py           # full matrix
       python scripts/scaling_diagnosis.py --worker MODE SIZE N
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(mode: str, size: int, n: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import time

    import jax.numpy as jnp
    import optax

    from opencl_ray_tracer_tpu import RenderConfig, legacy_ortho_camera
    from opencl_ray_tracer_tpu.parallel import (
        init_train_state,
        make_mesh,
        make_train_step,
        render_sharded,
        replicate,
        shard_rows,
    )
    from opencl_ray_tracer_tpu.scene import create_scene

    cfg = RenderConfig(
        width=size, height=size, shading="lambert", soft=True,
        framebuffer_dtype="float", backend="xla",
    )
    cam = legacy_ortho_camera()
    scene = create_scene(1)
    mesh = make_mesh(n)

    if mode == "train":
        optimizer = optax.adam(1e-3)
        step = make_train_step(cam, cfg, optimizer, mesh=mesh)
        target = shard_rows(jnp.zeros((size, size, 4), jnp.float32), mesh)
        state = init_train_state(replicate(scene, mesh), optimizer)

        def run_once():
            nonlocal state
            state, loss = step(state, target)
            return loss
    else:  # fwd: sharded forward render, zero collectives
        cfg_f = cfg.replace(soft=False, shading="lambert")

        def run_once():
            return render_sharded(scene, cam, cfg_f, mesh=mesh)

    jax.block_until_ready(run_once())  # compile + warm
    n_steps = 10
    samples = []
    for _ in range(5):
        t0 = time.perf_counter_ns()
        for _ in range(n_steps):
            out = run_once()
        jax.block_until_ready(out)
        samples.append((time.perf_counter_ns() - t0) / 1e3 / n_steps)
    samples.sort()
    print(json.dumps({
        "mode": mode, "size": size, "n": n,
        "us": samples[len(samples) // 2],
        "us_min": samples[0], "us_max": samples[-1],
    }))


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3]))
        return
    results = []
    for mode in ("train", "fwd"):
        for size in (128, 256, 512):
            base = None
            for n in (1, 8):
                env = dict(os.environ)
                env["JAX_PLATFORMS"] = "cpu"
                flags = [
                    f for f in env.get("XLA_FLAGS", "").split()
                    if "host_platform_device_count" not in f
                ]
                flags.append(f"--xla_force_host_platform_device_count={n}")
                env["XLA_FLAGS"] = " ".join(flags)
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--worker", mode, str(size), str(n)],
                    env=env, cwd=REPO, capture_output=True, text=True,
                    timeout=2400,
                )
                if proc.returncode != 0:
                    print(f"{mode} {size} n={n} FAILED: "
                          f"{proc.stderr[-300:]}", file=sys.stderr)
                    continue
                rec = json.loads(proc.stdout.strip().splitlines()[-1])
                results.append(rec)
                if n == 1:
                    base = rec["us"]
                eff = base / rec["us"] if base else float("nan")
                print(f"{mode} {size}x{size} n={n}: {rec['us']:.0f} us "
                      f"[{rec['us_min']:.0f},{rec['us_max']:.0f}] "
                      f"eff={eff:.2f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
