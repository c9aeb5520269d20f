#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric (BASELINE.md): primary rays/s/chip at 1080p, forward, on the
BASELINE.json config-2 scene (10 spheres + 1 cube, Phong + hard shadows),
fused Pallas kernels emitting the PACKED int32 framebuffer (the PNG/display
byte stream). vs_baseline is against the 1e9 rays/s/chip target. The JSON
line also carries the fwd+bwd (soft differentiable, fused Pallas backward)
rays/s, forward AND backward speed-of-light fractions, and on-chip parity
scalars (tiled-vs-oracle image parity + soft-gradient parity vs the jnp
twin) so the cross-check claim is driver-recorded every round.

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
    median_spread,
)
from opencl_ray_tracer_tpu.kernels.fwd import render_pallas_packed
from opencl_ray_tracer_tpu.kernels.fwd_tiled import bin_scene, render_tiled_packed
from opencl_ray_tracer_tpu.scene import create_scene, random_scene
from opencl_ray_tracer_tpu.utils.profiling import (
    sol_fraction_bwd,
    sol_fraction_ops,
)

# Per-pixel post-hit shading cost of the PHONG+SHADOWS tiled kernel, for
# the VPU side of the SOL model (instruction count of fwd_tiled's shading
# phase, shared-direction camera, 1 light): shadow-ray setup ~14 ops
# (tl/tl2/rsqrt/dist/ld) + hit point & normal ~30 (px/nsx/flip/normalize)
# + diffuse ~25 + specular ~30 (reflect/rdotv/exp-log powf) + finalize ~15
# + int pack ~12, counting rsqrt/exp/log as 1 VPU op each (they cost more
# slots in reality, so this is a CEILING-friendly underestimate).
PHONG_SHADING_OPS = 126.0

TARGET_RAYS_PER_S = 1.0e9       # BASELINE.md north-star target per v5e chip
TARGET_FWDBWD_RAYS_PER_S = 1.0e8  # VERDICT round-2 fwd+bwd target

W, H = 1920, 1080


def bench_config(scene, config, cam=None, tiled=True, n_frames=100,
                 best_of=1, spread=False, dynamic_bins=False):
    cam = cam or legacy_ortho_camera()
    packed = jax.device_put(scene.pack())
    if tiled and not dynamic_bins:
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
    elif tiled:
        # DYNAMIC FRAME: bins recomputed in-graph from the per-frame
        # camera — the moving-camera / scene-edit cost, every launch pays
        # binning + gather + kernel (the analogue of the reference's full
        # per-launch scene re-upload, MainState.cpp:759-855).
        def fn(c):
            b = bin_scene(
                packed, height=config.height, width=config.width,
                k=config.cull_k, shadows=config.shadows,
                shadow_k=config.shadow_cull_k,
                camera=c if c.normalize else None,
            )
            return render_tiled_packed(
                packed, c, config, interpret=False, bins=b
            )
    else:
        fn = lambda c: render_pallas_packed(packed, c, config, interpret=False)
    # best_of > 1: repeat the whole slope measurement — session-level
    # device-state variance was observed at +-40% across otherwise
    # identical cache-hit runs; repeats are cheap (no compiles). The
    # MEDIAN is the reported value; spread=True also returns [min, max]
    # so the driver JSON records the session spread (VERDICT r4 #4).
    us, us_lo, us_hi = median_spread(
        device_frame_time_us(fn, cam, n_frames=n_frames)
        for _ in range(best_of)
    )
    rays_per_s = (config.width * config.height) / (us / 1e6)
    if spread:
        return us, rays_per_s, us_lo, us_hi
    return us, rays_per_s


def bench_fwd_bwd_soft(scene, config, cam=None, n_frames=20, best_of=1,
                       spread=False):
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
        # consume EVERY grad leaf so XLA cannot DCE any part of the
        # backward — including the per-leaf scatter-add / accumulation
        # chains of leaves a partial sum would leave dead (VERDICT r4 #3:
        # consuming only 3 leaves left cube-vertex/colour grad chains
        # prunable, making the fwd+bwd rows measure a partial backward).
        return val + sum(
            jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g)
        )

    us, us_lo, us_hi = median_spread(
        device_step_time_us(step, cam, n_frames=n_frames)
        for _ in range(best_of)
    )
    rays_per_s = (config.width * config.height) / (us / 1e6)
    if spread:
        return us, rays_per_s, us_lo, us_hi
    return us, rays_per_s


def bench_train_step(scene, config, cam=None, n_steps=10):
    """Full distributed train-step time on a 1-device mesh: fused Pallas soft
    fwd+bwd inside shard_map + psum + optax update (parallel/train.py) — the
    production inverse-rendering hot loop, optimizer state carried step to
    step (so CSE can't collapse the scan)."""
    import optax

    from opencl_ray_tracer_tpu.parallel import (
        init_train_state,
        make_mesh,
        make_train_step,
        replicate,
        shard_rows,
    )

    cam = cam or legacy_ortho_camera()
    mesh = make_mesh(1)
    optimizer = optax.adam(1e-3)
    step = make_train_step(cam, config, optimizer, mesh=mesh)
    target = shard_rows(
        jnp.zeros((config.height, config.width, 4), jnp.float32), mesh
    )
    state0 = init_train_state(replicate(scene, mesh), optimizer)

    import time

    def total_us(length):
        @jax.jit
        def run(state):
            def body(s, _):
                s2, loss = step(s, target)
                return s2, loss

            s, losses = jax.lax.scan(body, state, None, length=length)
            return losses[-1]

        out = run(state0)
        jax.block_until_ready(out)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter_ns()
            out = run(state0)
            jax.block_until_ready(out)
            samples.append((time.perf_counter_ns() - t0) / 1e3)
        samples.sort()
        return samples[1]

    # two-point slope: cancels the ~30 ms per-dispatch cost of this
    # platform exactly (see bench_util module docstring)
    n1 = max(n_steps // 4, 2)
    t1, t2 = total_us(n1), total_us(n_steps)
    us = max((t2 - t1) / (n_steps - n1), 0.0)
    rays_per_s = (config.width * config.height) / (us / 1e6)
    return us, rays_per_s


def bench_sharded_overhead(scene, config, cam=None, n_frames=50):
    """render_sharded on a 1-device mesh vs the direct tiled call WITH
    in-graph binning (like-for-like: the sharded path bins per shard inside
    the graph too) — isolates the shard_map wrapping overhead on the real
    chip (the honest single-chip stand-in; real 2-host numbers need pod HW).
    Returns (us_sharded, us_unsharded)."""
    from opencl_ray_tracer_tpu.kernels.fwd_tiled import render_tiled
    from opencl_ray_tracer_tpu.parallel import make_mesh
    from opencl_ray_tracer_tpu.parallel.mesh import render_sharded

    cam = cam or legacy_ortho_camera()
    mesh = make_mesh(1)
    fn_sh = lambda c: render_sharded(scene, c, config, mesh=mesh)
    fn_un = lambda c: render_tiled(scene, c, config)
    # best-of-3 each: the overhead is a ratio of two ~1.4 ms rows whose
    # session noise is ~+-15%; minima keep the ratio meaningful
    us_sh = min(
        device_frame_time_us(fn_sh, cam, n_frames=n_frames) for _ in range(3)
    )
    us_un = min(
        device_frame_time_us(fn_un, cam, n_frames=n_frames) for _ in range(3)
    )
    return us_sh, us_un


# -- sharding efficiency on the virtual CPU mesh (subprocess worker) --------
SCALE_W, SCALE_H = 256, 256  # FIXED total work, sharded n ways


def scaling_worker(n_devices: int) -> None:
    """Sharding-efficiency worker: CPU mesh of n devices, fixed total
    SCALE_H rows sharded n ways. The virtual devices share this host's few
    cores, so weak scaling is unmeasurable here — but fixed-total-work IS:
    ideal is t(n) == t(1) (same compute, same cores) and any rise is the
    shard_map + psum + per-shard-dispatch overhead of the n-way program.
    Real inter-host throughput scaling needs pod hardware (BASELINE.md).

    Run in a JAX_PLATFORMS=cpu subprocess (the parent process' backend is
    pinned to the one TPU chip). Uses the jnp-twin engine (backend="xla"):
    interpret-mode Pallas on CPU measures the Python interpreter, not the
    communication structure this row exists to measure — the kernel engine's
    on-chip time is covered by the train-step row. Prints one JSON line."""
    import optax

    from opencl_ray_tracer_tpu.parallel import (
        init_train_state,
        make_mesh,
        make_train_step,
        replicate,
        shard_rows,
    )
    from opencl_ray_tracer_tpu.scene import create_scene

    h = SCALE_H
    config = RenderConfig(
        width=SCALE_W, height=h, shading="lambert", soft=True,
        framebuffer_dtype="float", backend="xla",
    )
    cam = legacy_ortho_camera()
    scene = create_scene(1)
    mesh = make_mesh(n_devices)
    optimizer = optax.adam(1e-3)
    step = make_train_step(cam, config, optimizer, mesh=mesh)
    target = shard_rows(jnp.zeros((h, SCALE_W, 4), jnp.float32), mesh)
    state = init_train_state(replicate(scene, mesh), optimizer)

    import time

    state, loss = step(state, target)  # compile + warm
    jax.block_until_ready(loss)
    n_steps = 10
    samples = []
    for _ in range(5):
        t0 = time.perf_counter_ns()
        for _ in range(n_steps):
            state, loss = step(state, target)
        jax.block_until_ready(loss)
        samples.append((time.perf_counter_ns() - t0) / 1e3 / n_steps)
    samples.sort()
    print(json.dumps({
        "n": n_devices,
        "us_per_step": samples[len(samples) // 2],
        "us_min": samples[0],
        "us_max": samples[-1],
    }))


def bench_weak_scaling() -> dict:
    """Launch CPU-mesh sharding-efficiency workers for n=1,2,4,8; efficiency
    is t(1)/t(n) at FIXED total work (ideal 1.0 on shared cores; the drop is
    the n-way program's sharding overhead). Validates the communication /
    sharding structure, not ICI bandwidth — that needs pod hardware."""
    import os
    import subprocess

    results = {}
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(f"--xla_force_host_platform_device_count={n}")
        env["XLA_FLAGS"] = " ".join(flags)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker",
             str(n)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        if proc.returncode != 0:
            print(f"# scaling worker n={n} failed: {proc.stderr[-300:]}",
                  file=sys.stderr)
            continue
        line = proc.stdout.strip().splitlines()[-1]
        results[n] = json.loads(line)
    return results


def bench_bwd_sol(us_step, scene, config, cam) -> dict:
    """Roofline context for the soft fwd+bwd step (VERDICT r3 #2): executed
    slot counts from the SOFT bins (tau-padded bboxes) and the gradient-
    table HBM term from the per-tile grad block sizes."""
    import numpy as _np

    from opencl_ray_tracer_tpu.kernels.soft_tiled import (
        CH, TILE_PIX, _bin_soft,
    )

    cam = cam or legacy_ortho_camera()
    packed = scene.pack()
    bins = _bin_soft(
        packed, jnp.float32(config.tau_edge), cam,
        height=config.height, width=config.width,
        k=config.cull_k, shadows=config.shadows,
        shadow_k=config.shadow_cull_k,
    )
    cnts = _np.asarray(bins.counts)
    chunks = _np.ceil(cnts / float(CH)) * float(CH)
    n_slots = float(chunks.sum(axis=1).mean())
    n_lights = int(_np.asarray(packed.lights.position).shape[0])
    # floats written per tile into grad-table blocks (coef 16 + albedo 8
    # wide), then re-read by the XLA scatter-add (gather vjp): x2 traffic.
    rows = (
        bins.k_tri * 24 + bins.k_sph * 24
        + n_lights * (bins.k_sh_tri + bins.k_sh_sph) * 16
    )
    gt_bytes = rows * 4.0 * 2.0 / TILE_PIX
    # stored-finals residual block (round 5): when the config's static
    # slot count selects that regime, the fwd writes R f32 rows/px of
    # streaming finals the bwd reads back — charge both directions. The
    # recompute regime (small scenes, e.g. the headline) moves none.
    from opencl_ray_tracer_tpu.kernels.soft_tiled import (
        _finals_rows,
        _use_stored_finals,
    )

    aggregate = config.shading == "phong" or (
        config.shadows and config.shading == "lambert"
    )
    fin_bytes = 0.0
    if _use_stored_finals(bins, n_lights, config.shadows):
        r_fin = _finals_rows(aggregate, n_lights if config.shadows else 0)
        fin_bytes = 2.0 * 4.0 * r_fin
    return sol_fraction_bwd(
        us_step, config.width * config.height, n_prim_slots=n_slots,
        grad_table_bytes_per_pixel=gt_bytes,
        # fwd writes 8 f32 rows/px, the retiled upstream g costs a write +
        # a read of the same (32 + 32 + 32 B/px), plus the finals block
        # when the stored-finals regime is active
        out_bytes_per_pixel=96.0 + fin_bytes,
    )


def bench_parity(cam=None) -> dict:
    """On-chip parity scalars for the driver record (VERDICT r3 #5): the F1
    cross-check (MainState.cpp:137-154 role) as machine-readable numbers.
    Renders scene 1 on the session backend through the tiled kernel vs the
    CPU-oracle implementation, plus soft-gradient parity vs the jnp twin."""
    from opencl_ray_tracer_tpu.diff import render_soft
    from opencl_ray_tracer_tpu.kernels.fwd_tiled import render_tiled
    from opencl_ray_tracer_tpu.kernels.soft import render_soft_pallas
    from opencl_ray_tracer_tpu.ref import render_reference

    cam = cam or legacy_ortho_camera()
    scene = create_scene(1)
    out = {}

    cfg_i = RenderConfig(width=640, height=480, shading="legacy")
    a = render_tiled(scene, cam, cfg_i)
    b = render_reference(scene, cam, cfg_i)
    out["parity_legacy_frac_identical"] = float(
        jnp.mean(jnp.all(a == b, axis=-1))
    )

    cfg_f = RenderConfig(width=640, height=480, shading="phong",
                         shadows=True, framebuffer_dtype="float")
    af = render_tiled(scene, cam, cfg_f)
    bf = render_reference(scene, cam, cfg_f)
    out["parity_phong_frac_close"] = float(
        jnp.mean(jnp.max(jnp.abs(af - bf), axis=-1) < 0.5)
    )

    cfg_s = RenderConfig(width=256, height=128, shading="phong",
                         shadows=True, soft=True, framebuffer_dtype="float",
                         tau_depth=1.0, tau_edge=0.5)

    def loss(render_fn):
        def f(s):
            img = render_fn(s, cam, cfg_s)
            return jnp.mean(img[..., :3] ** 2)

        return f

    gp = jax.grad(loss(render_soft_pallas))(scene)
    gj = jax.grad(loss(render_soft))(scene)
    gerr, gscale = 0.0, 0.0
    for leaf_p, leaf_j in zip(
        jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gj)
    ):
        if leaf_p.size:
            gerr = max(gerr, float(jnp.max(jnp.abs(leaf_p - leaf_j))))
            gscale = max(gscale, float(jnp.max(jnp.abs(leaf_j))))
    out["parity_soft_grad_max_err"] = gerr
    # the scale-free form of the BASELINE grad-parity criterion: max abs
    # error over every scene-parameter grad leaf, relative to the largest
    # oracle-grad magnitude
    out["parity_soft_grad_rel_err"] = gerr / (gscale + 1e-20)

    # PIXEL-gradient parity — the BASELINE criterion AS WRITTEN (VERDICT
    # r4 #5): max-abs error of exact jacobian rows d(pixel)/d(params),
    # pixel values in NORMALIZED 0..1 units (raw image / 255; params in
    # their native world/colour units — see docs/PERF.md). One vjp per
    # probe pixel gives the exact row; probes are the 8 strongest-edge
    # pixels (where soft silhouette gradients live) + 8 spread across the
    # image. Unlike a summed loss functional, single rows carry no
    # accumulation rounding, so the 1e-4 tolerance is meaningful.
    import numpy as _np2

    h_, w_ = cfg_s.height, cfg_s.width
    img01_p, vjp_p = jax.vjp(
        lambda s: render_soft_pallas(s, cam, cfg_s)[..., :3] / 255.0, scene
    )
    _, vjp_j = jax.vjp(
        lambda s: render_soft(s, cam, cfg_s)[..., :3] / 255.0, scene
    )
    img_np = _np2.asarray(img01_p)
    edge = _np2.abs(_np2.diff(img_np, axis=0)).sum(-1)[:, : w_ - 1] + (
        _np2.abs(_np2.diff(img_np, axis=1)).sum(-1)[: h_ - 1, :]
    )
    flat = _np2.argsort(edge.ravel())[-8:]
    probes = [(int(q // (w_ - 1)), int(q % (w_ - 1))) for q in flat]
    rng = _np2.random.default_rng(7)
    probes += [
        (int(rng.integers(h_)), int(rng.integers(w_))) for _ in range(8)
    ]
    perr = 0.0
    for pi, (yy, xx) in enumerate(probes):
        # cycle the probed channel: shading is channel-separable, so a
        # red-only probe would leave green/blue albedo gradient chains
        # entirely unchecked
        ct = jnp.zeros((h_, w_, 3), jnp.float32).at[yy, xx, pi % 3].set(1.0)
        (row_p,) = vjp_p(ct)
        (row_j,) = vjp_j(ct)
        for lp, lj in zip(
            jax.tree_util.tree_leaves(row_p), jax.tree_util.tree_leaves(row_j)
        ):
            if lp.size:
                perr = max(perr, float(jnp.max(jnp.abs(lp - lj))))
    out["parity_pixel_grad_max_err"] = perr
    return out


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
    ap.add_argument("--scaling-worker", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--skip-scaling", action="store_true",
                    help="skip the CPU-mesh weak-scaling subprocess rows")
    args = ap.parse_args(argv)

    if args.scaling_worker is not None:
        # Subprocess mode: force the CPU mesh before first backend use (the
        # session sitecustomize can pin the platform programmatically).
        jax.config.update("jax_platforms", "cpu")
        scaling_worker(args.scaling_worker)
        return

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
    # Headline measures the PACKED framebuffer path — the product a frame
    # loop consumes (one int32 RGBA word per pixel, the PNG/display byte
    # stream; the reference's own kernel writes packed int RGBA,
    # rayTracer.cl:198-201). 4 B/px HBM out, no post-kernel untangling.
    cfg_hl = RenderConfig(
        width=wid, height=hgt, shading="phong", shadows=True,
        framebuffer_dtype="packed",
    )
    # n_frames=300: at ~150 us/frame the slope differences two ~10-45 ms
    # scan walls whose residual jitter is a few ms; 88 frames of signal
    # (n=100) left +-40% sample noise that rounds 1-3 mis-read as a fast
    # "92 us phase". 263 frames of signal tightens the spread to ~+-6%
    # (measured round 5, scripts/headline_variance.py).
    us, rays, us_min, us_max = bench_config(
        scene_hl, cfg_hl, tiled=True, best_of=3, spread=True, n_frames=300
    )
    row("headline tiled phong+shadows 1080p 10sph+1cube (packed fb)", us, rays)
    print(f"# headline spread over 3 slope measurements: "
          f"[{us_min:.0f}, {us_max:.0f}] us (median {us:.0f})",
          file=sys.stderr)
    # SOL roofline context: count the slots the kernel ACTUALLY executes —
    # per-tile candidate counts rounded up to 8-chunks (ragged skipping),
    # primary + per-light shadow, averaged over pixels — plus the per-pixel
    # shading phase on the fraction of pixels whose tiles shade at all
    # (empty tiles skip shading AND candidate tests).
    packed_hl = scene_hl.pack()
    bins_hl = bin_scene(
        packed_hl, height=cfg_hl.height, width=cfg_hl.width,
        k=cfg_hl.cull_k, shadows=cfg_hl.shadows,
        shadow_k=cfg_hl.shadow_cull_k,
    )
    import numpy as _np

    cnts = _np.asarray(bins_hl.counts)  # [tri, sph, (sh_tri, sh_sph)/light]
    chunks = _np.ceil(cnts / 8.0) * 8.0
    n_slots = float(chunks.sum(axis=1).mean())  # mean executed slots/tile
    shaded_frac = float((cnts[:, 0] + cnts[:, 1] > 0).mean())
    # per-slot-TYPE op costs (instruction counts of the kernel's tests):
    # tri affine u/v/t 6 FMA + 3 cmp + nearest-hit update ~15; sphere
    # quadratic ~16; shadow-frustum 4 planes x (3 FMA + add + cmp) + any-
    # reduce ~22; shadow-sphere segment ~16. A uniform 14 undercharged the
    # shadow slots the kernel necessarily executes.
    ops_w = _np.array([15.0, 16.0] + [22.0, 16.0] * (
        (cnts.shape[1] - 2) // 2
    ))
    ops_px = float((chunks * ops_w).sum(axis=1).mean())
    sol = sol_fraction_ops(
        us, wid * hgt,
        intersection_ops_per_pixel=ops_px,
        shading_ops_per_pixel=PHONG_SHADING_OPS,
        shaded_fraction=shaded_frac,
        bytes_per_pixel=4.0,  # packed int32 out; tables are <1 B/px
    )
    print(
        f"# headline SOL (intersection {n_slots:.0f} slots/px = "
        f"{ops_px:.0f} ops/px type-weighted + shading "
        f"{PHONG_SHADING_OPS:.0f} ops/px on {100 * shaded_frac:.0f}% of "
        f"pixels, 4 B/px out): bound={sol['bound']} "
        f"ideal={sol['ideal_us']:.0f}us "
        f"achieved_fraction={sol['achieved_fraction']:.3f}",
        file=sys.stderr,
    )

    # DYNAMIC FRAME (VERDICT r4 #2): bins recomputed IN-GRAPH from the
    # per-frame camera — a moving pinhole camera, so XLA cannot hoist the
    # binning out of the frame loop. This is the honest cost of a
    # flythrough / interactive frame, the analogue of the reference paying
    # its full scene upload every launch (MainState.cpp:759-855).
    from opencl_ray_tracer_tpu import pinhole_camera

    cam_ph = pinhole_camera(
        position=(wid / 2.0, hgt / 2.0, 900.0),
        look_at=(wid / 2.0, hgt / 2.0, -85.0),
        fov_degrees=60.0, width=wid, height=hgt,
    )
    us_dyn = float("nan")
    try:
        us_dyn, rays_dyn = bench_config(
            scene_hl, cfg_hl, cam=cam_ph, tiled=True, dynamic_bins=True,
            n_frames=150, best_of=3,
        )
        row("DYNAMIC frame phong+shadows 1080p pinhole (in-graph rebin)",
            us_dyn, rays_dyn)
    except Exception as e:
        print(f"# dynamic-frame bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # fwd+bwd: BASELINE config 3 — same scene, phong + shadows, backward pass
    cfg_soft = RenderConfig(
        width=wid, height=hgt, shading="phong", shadows=True, soft=True,
        framebuffer_dtype="float", tau_depth=1.0, tau_edge=0.5,
    )
    sol_bwd = None
    us_g_min = us_g_max = float("nan")
    try:
        us_g, rays_g, us_g_min, us_g_max = bench_fwd_bwd_soft(
            scene_hl, cfg_soft, best_of=3, spread=True
        )
        row("fwd+bwd soft phong+shadows 1080p 10sph+1cube", us_g, rays_g)
        print(f"# fwd+bwd spread over 3 slope measurements: "
              f"[{us_g_min:.0f}, {us_g_max:.0f}] us (median {us_g:.0f})",
              file=sys.stderr)
        sol_bwd = bench_bwd_sol(us_g, scene_hl, cfg_soft, None)
        print(
            f"# fwd+bwd SOL (recompute-vjp model): bound={sol_bwd['bound']} "
            f"ideal={sol_bwd['ideal_us']:.0f}us "
            f"achieved_fraction={sol_bwd['achieved_fraction']:.3f}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# fwd+bwd bench failed: {type(e).__name__}: {e}", file=sys.stderr)
        us_g, rays_g = float("nan"), 0.0

    rays_stress = None
    if not args.skip_context:
        try:
            # fast rows measure at n_frames=300: sub-300-us frames carry
            # so little signal per scan that n=100 slopes swing +-40%
            # (the headline's diagnosed differencing noise, PERF.md #7)
            cfg_legacy = RenderConfig(width=wid, height=hgt, shading="legacy",
                                      framebuffer_dtype="packed")
            u2, r2 = bench_config(scene_hl, cfg_legacy, tiled=True,
                                  n_frames=300)
            row("tiled legacy 1080p 10sph+1cube (packed fb)", u2, r2)
            # real pinhole camera through the projective tiled path
            u2p, r2p = bench_config(scene_hl, cfg_legacy, cam=cam_ph,
                                    tiled=True, n_frames=300)
            row("tiled legacy 1080p pinhole (projective culling)", u2p, r2p)
            # the brute kernel has no packed mode (it is the fallback, not
            # the product path) — bench it on its own int framebuffer
            u2b, r2b = bench_config(
                scene_hl, cfg_legacy.replace(framebuffer_dtype="int"),
                tiled=False, n_frames=30,
            )
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
            # reference-scale differentiable stress (VERDICT r3 #8): the
            # scene-3 class (100 sph + 100 cubes = 1200 tris) through the
            # soft fwd+bwd path
            cfg_stress_soft = cfg_100.replace(cull_k=96, shadow_cull_k=136)
            u4s, r4s = bench_fwd_bwd_soft(
                scene_stress, cfg_stress_soft, n_frames=5, best_of=3
            )
            row("fwd+bwd soft phong+shadows 1080p 100sph+100cubes (k=96)",
                u4s, r4s)
            rays_stress = r4s  # driver-recorded (VERDICT r4 #1)
            # BASELINE config 5 analogue: 4K render, 200 primitives
            w4k, h4k = 3840, 2160
            scene_4k = random_scene(
                100, 100, seed=2, bounds=(float(w4k) - 10, float(h4k) - 10)
            )
            cfg_4k = RenderConfig(
                width=w4k, height=h4k, shading="legacy", cull_k=96,
                framebuffer_dtype="packed",
            )
            u5, r5 = bench_config(scene_4k, cfg_4k, tiled=True, n_frames=30)
            row("tiled legacy 4K 100sph+100cubes (1200 tris, k=96, packed)",
                u5, r5)
            # pinhole rows through the projective tiled paths (VERDICT r2 #8)
            u6, r6 = bench_config(scene_hl, cfg_hl, cam=cam_ph, tiled=True,
                                  n_frames=300)
            row("tiled phong+shadows 1080p pinhole", u6, r6)
            u7, r7 = bench_fwd_bwd_soft(scene_hl, cfg_soft, cam=cam_ph)
            row("fwd+bwd soft phong+shadows 1080p pinhole", u7, r7)
        except Exception as e:  # context rows must never kill the headline
            print(f"# context bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # on-chip parity scalars (the F1 cross-check, driver-recorded)
    parity = {}
    try:
        parity = bench_parity()
        print(
            "# parity (scene 1, on-chip): legacy identical "
            f"{parity['parity_legacy_frac_identical']:.4f}, phong close "
            f"{parity['parity_phong_frac_close']:.4f}, soft-grad max err "
            f"{parity['parity_soft_grad_max_err']:.2e}, pixel-grad max err "
            f"{parity['parity_pixel_grad_max_err']:.2e}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# parity bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # distributed train step on the real chip (the fused engine end-to-end)
    try:
        us_ts, rays_ts = bench_train_step(scene_hl, cfg_soft)
        row("train step (shard_map+psum+adam) soft phong+shadows 1080p",
            us_ts, rays_ts)
    except Exception as e:
        print(f"# train-step bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        us_ts, rays_ts = float("nan"), 0.0

    # shard_map wrapping overhead on a 1-device mesh (single-chip stand-in
    # for the sharded fwd path; real multi-host needs pod hardware)
    sharded_overhead = None
    try:
        us_sh, us_un = bench_sharded_overhead(scene_hl, cfg_hl)
        sharded_overhead = us_sh / us_un - 1.0
        print(
            f"# sharded fwd (1-device mesh): {us_sh:.0f} us/frame vs "
            f"{us_un:.0f} unsharded, both with in-graph binning "
            f"(shard_map overhead {100.0 * sharded_overhead:+.1f}%)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# sharded-overhead bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # weak scaling of the sharded train step on the virtual CPU mesh
    scaling_eff = None
    scaling_eff_lo = scaling_eff_hi = None
    if not args.skip_scaling:
        try:
            sc = bench_weak_scaling()
            if sc and 1 in sc:
                for n in sorted(sc):
                    r = sc[n]
                    eff = sc[1]["us_per_step"] / r["us_per_step"]
                    print(
                        f"# sharding efficiency (CPU mesh, fixed "
                        f"{SCALE_H}x{SCALE_W}): n={n} "
                        f"{r['us_per_step']:.0f} us/step "
                        f"[{r['us_min']:.0f}, {r['us_max']:.0f}] "
                        f"efficiency={eff:.2f}",
                        file=sys.stderr,
                    )
                nmax = max(sc)
                scaling_eff = sc[1]["us_per_step"] / sc[nmax]["us_per_step"]
                # ERROR BARS (VERDICT r4 #8): the ratio's extreme range
                # from the per-n sample spreads — this row runs 8 virtual
                # devices on this host's few cores, so it validates the
                # SHARDING STRUCTURE (program compiles, runs, converges at
                # every n), not ICI bandwidth; swings inside these bars
                # are host scheduling noise, not regressions.
                scaling_eff_lo = sc[1]["us_min"] / sc[nmax]["us_max"]
                scaling_eff_hi = sc[1]["us_max"] / sc[nmax]["us_min"]
        except Exception as e:
            print(f"# weak-scaling bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_s_per_chip_1080p_fwd_phong_shadows",
                "value": rays,
                "unit": "rays/s",
                "vs_baseline": rays / TARGET_RAYS_PER_S,
                # spread over 3 independent slope measurements (VERDICT r4
                # #4): value is the MEDIAN; min/max carry session variance
                "value_min": (wid * hgt) / (us_max / 1e6),
                "value_max": (wid * hgt) / (us_min / 1e6),
                "sol_fraction": round(sol["achieved_fraction"], 4),
                "sol_bound": sol["bound"],
                **(
                    {"dynamic_frame_us": round(us_dyn, 1)}
                    if us_dyn == us_dyn else {}
                ),
                "fwd_bwd_rays_per_s": rays_g,
                "fwd_bwd_vs_target": rays_g / TARGET_FWDBWD_RAYS_PER_S,
                **(
                    {
                        "fwd_bwd_us_min": round(us_g_min, 1),
                        "fwd_bwd_us_max": round(us_g_max, 1),
                    }
                    if us_g_min == us_g_min else {}
                ),
                # the reference's own stress fixture (scene-3 class,
                # 100 sph + 100 cubes) through the soft fwd+bwd path —
                # the BASELINE-criterion scale (VERDICT r4 #1)
                **(
                    {
                        "stress_fwd_bwd_rays_per_s": rays_stress,
                        "stress_fwd_bwd_vs_target":
                            rays_stress / TARGET_FWDBWD_RAYS_PER_S,
                    }
                    if rays_stress is not None else {}
                ),
                **(
                    {
                        "sol_fraction_bwd": round(
                            sol_bwd["achieved_fraction"], 4
                        ),
                        "sol_bwd_bound": sol_bwd["bound"],
                    }
                    if sol_bwd is not None
                    else {}
                ),
                # 4 significant figures, not fixed decimals: the grad
                # relative error is ~1e-7 and must not round to 0.0
                **{k: float(f"{v:.4g}") for k, v in parity.items()},
                "train_step_us": None if us_ts != us_ts else round(us_ts),
                **(
                    {
                        "sharding_eff_8dev_fixed_work": round(scaling_eff, 3),
                        # error bars + semantics: a CPU-mesh structure
                        # check (host-core timesharing noise dominates the
                        # point value; see PERF.md scaling section)
                        "sharding_eff_range": [
                            round(scaling_eff_lo, 3),
                            round(scaling_eff_hi, 3),
                        ],
                        "sharding_eff_semantics": "cpu-mesh-structure-check",
                    }
                    if scaling_eff is not None
                    else {}
                ),
                **(
                    {"shard_map_overhead": round(sharded_overhead, 4)}
                    if sharded_overhead is not None
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
