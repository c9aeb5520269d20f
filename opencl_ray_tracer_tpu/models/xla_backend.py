"""XLA backend: the whole pipeline as one jitted jnp program on the default
device (TPU when present).

This is the "let XLA fuse it" renderer: ray gen, intersection, nearest-hit
and shading are written at the jnp level (ops/) and compiled as one program.
It is both a production fallback for shapes/modes the Pallas megakernel does
not cover and the apples-to-apples baseline the Pallas kernel must beat.

Memory is bounded by mapping over row chunks with lax.map (sequential, so
peak intermediate size is chunk*W*numPrims, not H*W*numPrims) — the XLA
analogue of the Pallas pixel-tile grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from opencl_ray_tracer_tpu.camera import Camera
from opencl_ray_tracer_tpu.config import RenderConfig
from opencl_ray_tracer_tpu.ops import (
    nearest_hit,
    shade_lambert,
    shade_legacy,
    shade_phong,
    to_int_framebuffer,
)


def trace_pixels(scene, o, d, *, shading: str, shadows: bool):
    """Trace arbitrary ray bundles: o/d (..., 3) -> RGBA float (..., 4)."""
    hit = nearest_hit(o, d, scene)
    if shading == "legacy":
        return shade_legacy(hit)
    if shading == "lambert":
        return shade_lambert(hit, d, scene, shadows=shadows)
    if shading == "phong":
        return shade_phong(hit, d, scene, shadows=shadows)
    raise ValueError(f"unknown shading mode {shading!r}")


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "shading", "shadows", "row_chunk", "as_int"),
)
def render_xla_jit(
    scene,
    camera: Camera,
    height: int,
    width: int,
    shading: str = "legacy",
    shadows: bool = False,
    row_chunk: int = 32,
    as_int: bool = True,
):
    o, d = camera.rays(height, width)

    def do_chunk(args):
        oc, dc = args
        return trace_pixels(scene, oc, dc, shading=shading, shadows=shadows)

    if height > row_chunk and height % row_chunk == 0:
        o = o.reshape(height // row_chunk, row_chunk, width, 3)
        d = d.reshape(height // row_chunk, row_chunk, width, 3)
        rgba = jax.lax.map(do_chunk, (o, d))
        rgba = rgba.reshape(height, width, 4)
    else:
        rgba = do_chunk((o, d))

    return to_int_framebuffer(rgba) if as_int else rgba


def render_xla(scene, camera: Camera, config: RenderConfig) -> jax.Array:
    return render_xla_jit(
        scene,
        camera,
        height=config.height,
        width=config.width,
        shading=config.shading,
        shadows=config.shadows,
        as_int=config.framebuffer_dtype == "int",
    )
