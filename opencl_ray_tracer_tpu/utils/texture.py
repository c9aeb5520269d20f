"""Texture — framebuffer compositing (the reference's Texture wrapper role).

The reference wraps SDL_Texture with draw-at-position, rotated draw,
scaled draw and colour tinting (Texture.cpp:30-195; SURVEY.md §2 #10), used
to composite the rendered image and UI labels onto the screen. This build
is headless — the "screen" is an (H, W, 4) framebuffer array — so the same
surface is provided as pure-jnp compositing ops: alpha-blended blit,
nearest-neighbour scaled blit, rotated blit about a pivot, and a
multiplicative colour tint. Everything is jittable and runs on-device, so
UI composition costs no host round-trip; blit positions may be traced
arrays (masked blend) or host ints (sliced update). Rotation angles are
trace-time constants (they select the inverse map).

Values are in the framebuffer's 0..255 domain (int32 or float32); alpha is
the blend weight exactly as SDL's SDL_BLENDMODE_BLEND treats it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _as_f32(img) -> jax.Array:
    return jnp.asarray(img).astype(jnp.float32)


@dataclasses.dataclass
class Texture:
    """An (H, W, 4) RGBA image plus the reference wrapper's draw surface.

    Mirrors Texture.{h,cpp}: `dimensions`, `set_colour_tint`
    (Texture.cpp:188-195), `draw` (:82-118 incl. rotation about a pivot),
    `draw_scaled` (:120-176). Draw calls return a NEW destination
    framebuffer (functional, jit-friendly) instead of mutating a renderer.
    """

    pixels: jax.Array                       # (H, W, 4) float32, 0..255
    tint: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    def __init__(self, pixels, tint: Sequence[float] = (1.0, 1.0, 1.0)):
        self.pixels = _as_f32(pixels)
        if self.pixels.ndim != 3 or self.pixels.shape[-1] != 4:
            raise ValueError("Texture expects an (H, W, 4) RGBA array")
        self.tint = tuple(float(c) for c in tint)

    # -- reference API parity ------------------------------------------------
    @property
    def dimensions(self) -> Tuple[int, int]:
        """(width, height) like Texture::getDimensions."""
        return (self.pixels.shape[1], self.pixels.shape[0])

    def set_colour_tint(self, r: float, g: float, b: float) -> "Texture":
        """Multiplicative tint (SDL_SetTextureColorMod semantics where
        255 = identity when called with 0..255 ints; accepts 0..1 floats)."""
        scale = 1.0 / 255.0 if max(r, g, b) > 1.0 else 1.0
        return Texture(self.pixels, (r * scale, g * scale, b * scale))

    def _tinted(self) -> jax.Array:
        t = jnp.asarray(self.tint + (1.0,), jnp.float32)
        return self.pixels * t

    def draw(self, dest, pos: Tuple[int, int], rotation_degrees: float = 0.0,
             pivot: Optional[Tuple[float, float]] = None):
        """Alpha-blend this texture onto `dest` at integer (x, y), optionally
        rotated about `pivot` (texture-local coords; defaults to the
        centre, as the reference's rotated draw overloads do)."""
        src = self._tinted()
        if rotation_degrees:
            src = _rotate_rgba(src, rotation_degrees, pivot)
        return blit(dest, src, pos)

    def draw_scaled(self, dest, pos: Tuple[int, int],
                    size: Tuple[int, int]):
        """Nearest-neighbour scaled alpha blit (Texture::drawScaled)."""
        w, h = int(size[0]), int(size[1])
        return blit(dest, resize_nearest(self._tinted(), h, w), pos)


def resize_nearest(img, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbour resample of an (H, W, C) image (SDL's default
    texture scale mode)."""
    img = _as_f32(img)
    h, w = img.shape[:2]
    ys = jnp.clip((jnp.arange(out_h) + 0.5) * (h / out_h), 0, h - 1)
    xs = jnp.clip((jnp.arange(out_w) + 0.5) * (w / out_w), 0, w - 1)
    return img[ys.astype(jnp.int32)][:, xs.astype(jnp.int32)]


def blit(dest, src, pos) -> jax.Array:
    """Alpha-blend `src` onto `dest` with its top-left corner at (x, y).

    out.rgb = src.rgb * a + dest.rgb * (1 - a), a = src.alpha / 255
    (SDL_BLENDMODE_BLEND). Off-framebuffer regions are clipped. Returns a
    new array in dest's dtype.

    Positions may be host ints (a sliced update touching only the overlap)
    OR traced arrays (a masked full-framebuffer blend — jit-safe for
    dynamic positions, e.g. a sprite animated inside one compiled frame)."""
    dest_f = _as_f32(dest)
    src = _as_f32(src)
    hd, wd = dest_f.shape[:2]
    hs, ws = src.shape[:2]
    x, y = pos[0], pos[1]

    if isinstance(x, (int,)) and isinstance(y, (int,)):
        # python-level clip (positions are host ints, like the reference's)
        sy0, sx0 = max(0, -y), max(0, -x)
        dy0, dx0 = max(0, y), max(0, x)
        dy1, dx1 = min(hd, y + hs), min(wd, x + ws)
        if dy1 <= dy0 or dx1 <= dx0:
            return jnp.asarray(dest)
        sub = src[sy0 : sy0 + (dy1 - dy0), sx0 : sx0 + (dx1 - dx0)]
        region = dest_f[dy0:dy1, dx0:dx1]
        a = jnp.clip(sub[..., 3:4] * (1.0 / 255.0), 0.0, 1.0)
        rgb = sub[..., :3] * a + region[..., :3] * (1.0 - a)
        out_region = jnp.concatenate([rgb, region[..., 3:4]], axis=-1)
        out = dest_f.at[dy0:dy1, dx0:dx1].set(out_region)
        return out.astype(jnp.asarray(dest).dtype)

    # traced positions: per-dest-pixel source lookup with an inside mask —
    # identical clip semantics, static shapes, no host sync.
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    yy = jnp.arange(hd, dtype=jnp.int32)[:, None] - y
    xx = jnp.arange(wd, dtype=jnp.int32)[None, :] - x
    inside = (yy >= 0) & (yy < hs) & (xx >= 0) & (xx < ws)
    iy = jnp.clip(yy, 0, hs - 1)
    ix = jnp.clip(xx, 0, ws - 1)
    sub = src[iy, ix]
    a = jnp.clip(sub[..., 3:4] * (1.0 / 255.0), 0.0, 1.0)
    a = a * inside[..., None].astype(jnp.float32)
    rgb = sub[..., :3] * a + dest_f[..., :3] * (1.0 - a)
    out = jnp.concatenate([rgb, dest_f[..., 3:4]], axis=-1)
    return out.astype(jnp.asarray(dest).dtype)


def _rotate_rgba(img, degrees: float, pivot=None) -> jax.Array:
    """Rotate an RGBA image about a pivot (texture-local), exposing
    transparent (alpha 0) pixels outside the source — the SDL_RenderCopyEx
    role. Nearest-neighbour sampling on the inverse map."""
    img = _as_f32(img)
    h, w = img.shape[:2]
    cy, cx = (
        (h / 2.0, w / 2.0) if pivot is None else (float(pivot[1]), float(pivot[0]))
    )
    th = jnp.deg2rad(jnp.float32(degrees))
    cos, sin = jnp.cos(th), jnp.sin(th)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    # inverse rotation: destination pixel -> source pixel
    sx = cos * xx + sin * yy + cx
    sy = -sin * xx + cos * yy + cy
    ix = jnp.round(sx).astype(jnp.int32)
    iy = jnp.round(sy).astype(jnp.int32)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    sampled = img[iy, ix]
    return jnp.where(inside[..., None], sampled, 0.0)
