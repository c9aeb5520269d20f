"""Tiled Pallas kernel with per-tile primitive culling.

Covers BOTH camera families: shared-direction (legacy ortho — affine
coefficient fast path) and shared-origin pinhole (projective coefficient
path, see _prep_projective_coefs). The reference has neither camera
generality nor culling (rayTracer.cl:111-202 brute-forces every primitive
per pixel with one fixed direction).

The brute-force megakernel (fwd.py) tests every pixel against every
primitive slot, and its 128-wide lane chunks mean even a 22-primitive scene
pays 256 slots per pixel. This kernel is the acceleration structure the
reference never had (SURVEY.md §2: "no BVH"), built the TPU way — as a
dense two-level grid, not a pointer tree:

1. BINNING (XLA, ~50-100 us in-graph at 1080p — round-5 slope-harness
   measurement; earlier rounds' "~1.5 ms" figure was a single-dispatch
   artifact of the tunnel's per-call latency): with the legacy camera's
   shared direction (0,0,-1), a primitive can only cover a 64x128-pixel tile
   if its screen-space bbox overlaps the tile rect. A (tiles x prims)
   overlap matrix -> top-K compaction gives each tile a padded candidate
   list + a CANDIDATE COUNT; the affine intersection COEFFICIENTS
   (fwd.py _prep_affine_coefs) are gathered into per-tile tables.
2. TRACE (Pallas): one grid step per tile. Layout is transposed vs fwd.py:
   PRIMITIVES live on the SUBLANE axis in 8-granular chunks and 2048-pixel
   sub-blocks live on the LANE axis. Each candidate type is consumed by a
   `fori_loop` whose trip count comes from the per-tile count (SMEM), so a
   tile with 0 triangle candidates does ZERO triangle work — the ragged
   dynamic-work trick that makes sparse scenes cheap. Attribute gather is a
   (8, k) @ (k, 2048) MXU matmul; no transposes anywhere.
3. OVERFLOW: if any tile has more than K candidates the whole frame falls
   back to the brute kernel via jax.lax.cond — never silently wrong.

Shadows (the TPU-native trick): a point p is occluded by triangle T from
point light L iff p lies inside the LIGHT FRUSTUM of T — behind T's plane
(far side from L) and inside the three side planes through L and each edge.
The four planes are precomputed per (light, triangle) at binning time
(16 floats = one table row), and because hit points are p = (x + t*d0x,
y + t*d0y, t*d0z) under the shared-direction camera, each plane test is
AFFINE in (x, y, t): 3 FMA + compare. No Möller–Trumbore, no divides, no
per-pixel shadow-ray setup. Sphere occlusion keeps the geometric segment
test (its direction normalisation is shared with the shading path).
Shadow candidates are binned per (light, tile) against the tile->light
corridor bbox.

Shading runs SUBLANE-FOLDED: per-pixel winner state is reshuffled from
(1, N)-row layout (1/8 VPU utilization) into (8, N/8) so lighting math uses
the full vector unit, and the folded channel rows are stored directly to a
channel-major output layout — the wrapper's single XLA reshape/transpose
untangles (tile, channel, sub-block, fold-row) back to (H, W) planes.
"""

from __future__ import annotations

import dataclasses as _dc
import functools
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_ray_tracer_tpu.camera import Camera
from opencl_ray_tracer_tpu.config import RenderConfig
from opencl_ray_tracer_tpu.kernels.fwd import (
    _LIGHT_STRIDE,
    _P_AMBIENT,
    _P_D0,
    _P_DDX,
    _P_DDY,
    _P_LIGHTS,
    _P_O0,
    _P_SHINE,
    _P_SPEC,
    _camera_params,
    _prep_affine_coefs,
    _prep_scene_arrays,
    _use_interpret,
)
from opencl_ray_tracer_tpu.ops.intersect import EPSILON, MISS_T
from opencl_ray_tracer_tpu.ops.shading import LEGACY_FOG_MAX

TILE_H = 64
TILE_W = 128
TILE_PIX = TILE_H * TILE_W       # 8192
# Sub-block width trades per-iteration overhead against Mosaic compile
# time/code size: every vector op on a (K, SUB_PIX) temporary expands to
# SUB_PIX/128 native lane-tiles of code. 512 was iteration-overhead-bound
# at runtime; 8192 (whole tile) made kernels take 10+ minutes to compile.
# 2048 amortizes overhead over 4 iterations with 16 lane-tiles per op.
SUB_PIX = 2048
ROWS_PER_SUB = SUB_PIX // TILE_W
N_SUB = TILE_PIX // SUB_PIX      # 4
CHUNK = 8                        # prims per chunk (one sublane group)

# Shadow epsilons: the CPU oracle offsets the shadow origin 1e-2 along the
# normal and requires t > 1e-3 (ops/shading.py:49, fwd.py occluded_along).
# The frustum test's equivalent is a distance margin on the (normalised)
# occluder-plane test; side planes use exact >= 0.
_SH_PLANE_EPS = 1e-2


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot_prim(attr_chunk, onehot):
    """(kc, 8) attrs x (kc, TP) one-hot -> (8, TP), exact, on the MXU."""
    return jax.lax.dot_general(
        attr_chunk,
        onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Binning (XLA)
# ---------------------------------------------------------------------------

def _prim_bboxes(packed):
    """Screen-space (x0, x1, y0, y1) per triangle / sphere (ortho camera)."""
    v0 = packed.tri_v0  # (3, Tp)
    v1 = packed.tri_v0 + packed.tri_e1
    v2 = packed.tri_v0 + packed.tri_e2
    txs = jnp.stack([v0[0], v1[0], v2[0]])
    tys = jnp.stack([v0[1], v1[1], v2[1]])
    tri_box = (
        jnp.min(txs, 0) - 1e-3, jnp.max(txs, 0) + 1e-3,
        jnp.min(tys, 0) - 1e-3, jnp.max(tys, 0) + 1e-3,
    )
    c = packed.sph_origin  # (3, Sp)
    r = packed.sph_radius[0] + 1e-3
    sph_box = (c[0] - r, c[0] + r, c[1] - r, c[1] + r)
    return tri_box, sph_box


def _prim_z_extents(packed, pad):
    """World-z AABB extents (z0, z1) per triangle / sphere, padded — the
    occluder z inputs of the segment-hull shadow culling."""
    v0 = packed.tri_v0
    v1 = packed.tri_v0 + packed.tri_e1
    v2 = packed.tri_v0 + packed.tri_e2
    tzs = jnp.stack([v0[2], v1[2], v2[2]])
    tri_z = (jnp.min(tzs, 0) - pad, jnp.max(tzs, 0) + pad)
    r = packed.sph_radius[0] + pad
    sph_z = (packed.sph_origin[2] - r, packed.sph_origin[2] + r)
    return tri_z, sph_z


def _tile_hit_z(t_idx, t_valid, s_idx, s_valid, tri_zext, sph_zext,
                nty, ntx):
    """PER-TILE z range hit points can occupy: the min/max of the (padded)
    z extents over the tile's PRIMARY candidate primitives — hits lie on
    candidate surfaces, and the soft path's softmin t is a convex
    combination of per-candidate hits, so the combined z stays inside the
    candidates' hull. Feeding this as the segment-hull tile_z (instead of
    the global scene slab) kills occluders that sit between the light and
    SOME part of the scene but not this tile's hits. Tiles with no primary
    candidates get an inverted slab; their shadow lists are garbage-but-
    unread (the kernels skip primary-empty tiles entirely). Safe under
    primary overflow: overflow falls back to the brute kernel for the
    frame, so truncated candidate lists never feed a used bound.
    Returns (tz0, tz1) shaped (nty, ntx, 1) for _bin_prims broadcasting."""
    big = jnp.float32(1e30)

    def rng(idx, valid, zext):
        z0 = jnp.where(valid, zext[0][idx], big)
        z1 = jnp.where(valid, zext[1][idx], -big)
        return jnp.min(z0, axis=1), jnp.max(z1, axis=1)

    t0, t1 = rng(t_idx, t_valid, tri_zext)
    s0, s1 = rng(s_idx, s_valid, sph_zext)
    tz0 = jnp.minimum(t0, s0).reshape(nty, ntx, 1)
    tz1 = jnp.maximum(t1, s1).reshape(nty, ntx, 1)
    return tz0, tz1


def _pinhole_bboxes(packed, camera: Camera):
    """Screen-space conservative bboxes under a shared-origin pinhole camera.

    Pixel (x, y) traces direction d0 + x*ddx + y*ddy from origin o, so a
    world point P projects to [x*k, y*k, k] = M^-1 (P - o) with
    M = [ddx | ddy | d0] columns. A convex primitive's screen bbox is the
    bbox of its projected corner points (central projection preserves convex
    hulls in front of the camera); any corner at or behind the near plane
    makes the bbox conservatively cover the whole screen — correct, just
    uncullable for that primitive.
    """
    M = jnp.stack([camera.ddx, camera.ddy, camera.d0], axis=1)
    Minv = jnp.linalg.inv(M)
    big = 1e9

    def box(P):  # (N, K, 3) corner points per primitive
        v = jnp.einsum("ij,nkj->nki", Minv, P - camera.o0)
        w = v[..., 2]
        front = w > 1e-6
        ok = jnp.all(front, axis=1)
        sw = jnp.where(front, w, 1.0)
        sx = v[..., 0] / sw
        sy = v[..., 1] / sw
        pad = 1.0  # half-pixel centre offset + f32 slack
        return (
            jnp.where(ok, jnp.min(sx, 1) - pad, -big),
            jnp.where(ok, jnp.max(sx, 1) + pad, big),
            jnp.where(ok, jnp.min(sy, 1) - pad, -big),
            jnp.where(ok, jnp.max(sy, 1) + pad, big),
        )

    v0 = packed.tri_v0.T  # (Tp, 3)
    tri_box = box(
        jnp.stack([v0, v0 + packed.tri_e1.T, v0 + packed.tri_e2.T], axis=1)
    )
    c = packed.sph_origin.T  # (Sp, 3)
    r = packed.sph_radius[0]
    signs = jnp.array(
        [
            [sx, sy, sz]
            for sx in (-1.0, 1.0)
            for sy in (-1.0, 1.0)
            for sz in (-1.0, 1.0)
        ],
        jnp.float32,
    )  # (8, 3) AABB corner pattern
    sph_box = box(c[:, None, :] + r[:, None, None] * signs[None])
    return tri_box, sph_box


def _prep_projective_coefs(packed, camera: Camera):
    """Per-primitive projective coefficients for shared-ORIGIN (pinhole)
    cameras — the perspective analogue of fwd.py's _prep_affine_coefs.

    With origin o fixed and UNNORMALIZED direction d(x, y) = d0 + x*ddx +
    y*ddy, Möller–Trumbore is projective in pixel coords:

        pvec  = d x e2                    affine in (x, y)   (cross linear in d)
        det   = e1 . pvec                 affine
        u_num = (o - v0) . pvec           affine
        qvec  = (o - v0) x e1             constant per triangle
        v_num = d . qvec                  affine
        t_num = e2 . qvec                 constant

    u = u_num/det, v = v_num/det and the WORLD distance along the unit
    direction is t = (t_num/det) * |d|. The kernel evaluates validity
    sign-aware (multiply through by sign(det)) so the inner loop stays
    FMA + compares with a single divide for t. Sphere (geometric, reference
    quirks preserved): L = c - o is constant per sphere, tca = (L . d)/|d|,
    d^2 = |L|^2 - tca^2.

    Returns tri_coef (10, Tp) rows [det0,detx,dety, un0,unx,uny,
    vn0,vnx,vny, tnum]; sph_coef (5, Sp) rows [tc0,tcx,tcy, L2, r2].
    Zero-padded triangles give det == 0 everywhere and fail the kernel's
    |det| >= eps*|d| test. Pure jnp, differentiable.
    """
    o0, d0, ddx, ddy = camera.o0, camera.d0, camera.ddx, camera.ddy

    v0 = packed.tri_v0.T  # (Tp, 3)
    e1 = packed.tri_e1.T
    e2 = packed.tri_e2.T
    pv0 = jnp.cross(jnp.broadcast_to(d0, e2.shape), e2)
    pvx = jnp.cross(jnp.broadcast_to(ddx, e2.shape), e2)
    pvy = jnp.cross(jnp.broadcast_to(ddy, e2.shape), e2)
    det0 = jnp.sum(e1 * pv0, -1)
    detx = jnp.sum(e1 * pvx, -1)
    dety = jnp.sum(e1 * pvy, -1)
    base = o0 - v0
    un0 = jnp.sum(base * pv0, -1)
    unx = jnp.sum(base * pvx, -1)
    uny = jnp.sum(base * pvy, -1)
    q = jnp.cross(base, e1)
    vn0 = jnp.sum(d0 * q, -1)
    vnx = jnp.sum(ddx * q, -1)
    vny = jnp.sum(ddy * q, -1)
    tnum = jnp.sum(e2 * q, -1)
    tri_coef = jnp.stack(
        [det0, detx, dety, un0, unx, uny, vn0, vnx, vny, tnum], 0
    )

    C = packed.sph_origin.T  # (Sp, 3)
    r = packed.sph_radius[0]
    L = C - o0
    tc0 = jnp.sum(L * d0, -1)
    tcx = jnp.sum(L * ddx, -1)
    tcy = jnp.sum(L * ddy, -1)
    l2 = jnp.sum(L * L, -1)
    sph_coef = jnp.stack([tc0, tcx, tcy, l2, r * r], 0)
    return tri_coef, sph_coef


def _axis_s_interval(b0, b1, L, o0, o1):
    """Feasible s-interval for one axis of the segment-hull test.

    Points reachable by shadow segments are (1-s)*p + s*L, p in the tile's
    hit box B, s in [0, 1]. Per axis, the occluder interval [o0, o1] is
    reachable iff (1-s)*b0 + s*L <= o1 AND (1-s)*b1 + s*L >= o0 — two
    linear inequalities in s. Returns (lo, hi, ok): feasible s in [lo, hi]
    when ok (ok=False encodes an unconditionally-empty degenerate axis)."""
    eps = 1e-12
    big = jnp.float32(1e30)
    dA = L - b0
    rA = o1 - b0
    hiA = jnp.where(dA > eps, rA / jnp.where(dA > eps, dA, 1.0), big)
    loA = jnp.where(dA < -eps, rA / jnp.where(dA < -eps, dA, 1.0), -big)
    okA = jnp.where(jnp.abs(dA) <= eps, rA >= 0, True)
    dB = L - b1
    rB = o0 - b1
    loB = jnp.where(dB > eps, rB / jnp.where(dB > eps, dB, 1.0), -big)
    hiB = jnp.where(dB < -eps, rB / jnp.where(dB < -eps, dB, 1.0), big)
    okB = jnp.where(jnp.abs(dB) <= eps, rB <= 0, True)
    return jnp.maximum(loA, loB), jnp.minimum(hiA, hiB), okA & okB


def _bin_prims(box, n_real, nty, ntx, k, light_xy=None, offs=None,
               light_z=None, prim_z=None, tile_z=None):
    """(tiles x prims) overlap -> per-tile top-k candidate indices.

    With light_xy=(lx, ly), tiles are expanded to the bbox of the
    tile->light corridor: an occluder can only shadow a tile's hit points
    (which sit in the tile's xy column under the shared -z direction) if its
    xy-bbox overlaps bbox(tile_rect ∪ light_xy) — the conservative
    shadow-candidate test.

    With light_z + prim_z=(pz0, pz1) per prim + tile_z=(tz0, tz1) (the z
    range hit points can occupy — scalars or per-tile (nty, ntx, 1)
    arrays, see _tile_hit_z), the corridor tightens
    to the SEGMENT-HULL test: the occluder AABB must intersect the convex
    hull of (tile hit box x light point). Per axis the feasible segment
    parameter s is an interval (_axis_s_interval); a prim is a candidate iff
    the three intervals and [0, 1] intersect. This kills the corridor's
    biggest false positives — slab-bound occluders midway to an elevated
    light sit BELOW every actual shadow segment there.

    offs=(x_off, y_off) shifts the tile rects into WORLD coordinates for
    shifted ortho cameras (the shard_map camera-shift trick: shard i's local
    pixel row 0 is world row o0.y).

    Returns idx (n_tiles, k) int32, valid (n_tiles, k) bool,
    count (n_tiles,) int32 (clamped to k), overflow ()."""
    x0, x1, y0, y1 = box
    p = x0.shape[0]
    x_off, y_off = offs if offs is not None else (0.0, 0.0)
    tx0 = (jnp.arange(ntx, dtype=jnp.float32) * TILE_W)[None, :, None] + x_off
    ty0 = (jnp.arange(nty, dtype=jnp.float32) * TILE_H)[:, None, None] + y_off
    tx1 = tx0 + TILE_W
    ty1 = ty0 + TILE_H
    # padded prims beyond n_real never overlap (their bbox is degenerate far
    # away for spheres / all-zero for tris, but mask explicitly anyway)
    real = jnp.arange(p) < n_real
    if (
        light_xy is not None
        and light_z is not None
        and prim_z is not None
        and tile_z is not None
    ):
        lx, ly = light_xy
        pz0, pz1 = prim_z
        tz0, tz1 = tile_z
        sx0, sx1, okx = _axis_s_interval(
            tx0, tx1, lx, x0[None, None, :], x1[None, None, :]
        )
        sy0, sy1, oky = _axis_s_interval(
            ty0, ty1, ly, y0[None, None, :], y1[None, None, :]
        )
        sz0, sz1, okz = _axis_s_interval(
            tz0, tz1, light_z, pz0[None, None, :], pz1[None, None, :]
        )
        lo = jnp.maximum(jnp.maximum(sx0, sy0), jnp.maximum(sz0, 0.0))
        hi = jnp.minimum(jnp.minimum(sx1, sy1), jnp.minimum(sz1, 1.0))
        overlap = (
            (lo <= hi) & okx & oky & okz & real[None, None, :]
        ).reshape(nty * ntx, p)
    else:
        if light_xy is not None:
            lx, ly = light_xy
            tx0 = jnp.minimum(tx0, lx)
            tx1 = jnp.maximum(tx1, lx)
            ty0 = jnp.minimum(ty0, ly)
            ty1 = jnp.maximum(ty1, ly)
        overlap = (
            (x0[None, None, :] <= tx1)
            & (x1[None, None, :] >= tx0)
            & (y0[None, None, :] <= ty1)
            & (y1[None, None, :] >= ty0)
            & real[None, None, :]
        ).reshape(nty * ntx, p)
    counts = jnp.sum(overlap, axis=1, dtype=jnp.int32)
    overflow = jnp.max(counts) > k
    # top-k by (overlap, ascending index): score = P - i for overlapping.
    # k may exceed the padded primitive count (chunk-granularity rounding);
    # top_k runs at min(k, p) and the tail columns pad invalid.
    ktop = min(k, p)
    score = jnp.where(overlap, p - jnp.arange(p, dtype=jnp.int32), 0)
    top, _ = jax.lax.top_k(score, ktop)       # (n_tiles, ktop), descending
    valid = top > 0
    idx = jnp.where(valid, p - top, 0)
    if ktop < k:
        idx = jnp.pad(idx, ((0, 0), (0, k - ktop)))
        valid = jnp.pad(valid, ((0, 0), (0, k - ktop)))
    return idx, valid, jnp.minimum(counts, k), overflow


# null coefficient columns: guarantee "never valid" in the kernel tests.
_NULL_TRI = np.array(
    [-1e9, 0, 0, -1e9, 0, 0, 0, 0, 0], np.float32
)  # u0 = v0 = -1e9
_NULL_SPH = np.array(
    [-1e9, 0, 0, 1e9, 0, 0, 0, 0, 0, -1.0], np.float32
)  # tca < 0 and r2 < 0 and d2 huge
# projective nulls: det == 0 fails |det| >= eps*|d|; tca < 0 fails tca >= 0.
_NULL_TRI_PROJ = np.zeros((10,), np.float32)
_NULL_SPH_PROJ = np.array([-1e9, 0, 0, 0, -1.0], np.float32)


def _tri_shadow_planes(packed, lpos):
    """Light-frustum planes per triangle for point light `lpos` (3,).

    Row layout (16 floats): [m0(3) c0  m1(3) c1  m2(3) c2  n(3) cp] where a
    point p is occluded iff  mi.p + ci >= 0 for the three (normalised) side
    planes through the light and each edge, and n.p + cp >= eps for the
    (normalised) triangle plane oriented away from the light. Degenerate
    triangles / light-in-plane rows are disabled via c = -1e9."""
    v0 = packed.tri_v0.T            # (Tp, 3)
    e1 = packed.tri_e1.T
    e2 = packed.tri_e2.T
    v1 = v0 + e1
    v2 = v0 + e2
    L = lpos[None, :]

    def _norm_rows(m):
        n = jnp.linalg.norm(m, axis=-1, keepdims=True)
        return m / jnp.maximum(n, 1e-20), n[..., 0]

    def side(vi, vj, vk):
        m = jnp.cross(vj - vi, L - vi)
        m, mag = _norm_rows(m)
        s_k = jnp.sum(m * (vk - vi), -1)
        m = m * jnp.where(s_k < 0, -1.0, 1.0)[:, None]
        c = -jnp.sum(m * vi, -1)
        degen = (jnp.abs(s_k) < 1e-9) | (mag < 1e-12)
        c = jnp.where(degen, -1e9, c)
        return m, c

    m0, c0 = side(v0, v1, v2)
    m1, c1 = side(v1, v2, v0)
    m2, c2 = side(v2, v0, v1)
    n = jnp.cross(e1, e2)
    n, nmag = _norm_rows(n)
    s_l = jnp.sum(n * (L - v0), -1)
    n = n * jnp.where(s_l > 0, -1.0, 1.0)[:, None]
    cp = -jnp.sum(n * v0, -1)
    degen = (jnp.abs(s_l) < 1e-9) | (nmag < 1e-12)
    cp = jnp.where(degen, -1e9, cp)
    return jnp.concatenate(
        [
            m0, c0[:, None], m1, c1[:, None],
            m2, c2[:, None], n, cp[:, None],
        ],
        axis=1,
    )  # (Tp, 16)


def _sph_shadow_rows(packed):
    """Sphere occluder rows: [cx, cy, cz, r2, 0...] (padded: r2=0, far z)."""
    sp = packed.padded_spheres
    rows = jnp.zeros((sp, 16), jnp.float32)
    rows = rows.at[:, 0:3].set(packed.sph_origin.T)
    rows = rows.at[:, 3].set(packed.sph_radius[0] ** 2)
    return rows


# null shadow rows: tri planes all fail (c = -1e9); spheres at z=+1e9, r2=0.
_NULL_SH_TRI = np.array(
    [0, 0, 0, -1e9, 0, 0, 0, -1e9, 0, 0, 0, -1e9, 0, 0, 0, -1e9], np.float32
)
_NULL_SH_SPH = np.array(
    [0, 0, 1e9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], np.float32
)


def _shadow_tables(rows_per_light, box, n_real, nty, ntx, k, lights_pos,
                   null_row, offs=None, prim_z=None, tile_z=None):
    """Per-(light, tile) shadow-candidate tables, flattened to 3-D
    (n_tiles, L*k, 16) — light li owns candidate rows [li*k, (li+1)*k).
    (4-D block refs made Mosaic compiles pathologically slow.)

    rows_per_light: callable li -> (P, 16) candidate rows for that light.
    prim_z/tile_z enable the segment-hull z tightening (see _bin_prims).
    Returns (tables, counts (n_tiles, L) int32, overflow)."""
    tabs, cnts = [], []
    overflow = jnp.zeros((), bool)
    for li in range(lights_pos.shape[0]):
        idx, valid, count, over = _bin_prims(
            box, n_real, nty, ntx, k,
            light_xy=(lights_pos[li, 0], lights_pos[li, 1]), offs=offs,
            light_z=lights_pos[li, 2], prim_z=prim_z, tile_z=tile_z,
        )
        g = rows_per_light(li)[idx]                    # (n_tiles, k, 16)
        g = jnp.where(valid[..., None], g, null_row)
        tabs.append(g)
        cnts.append(count)
        overflow |= over
    return jnp.concatenate(tabs, axis=1), jnp.stack(cnts, axis=1), overflow


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

_ALPHA_BITS = -16777216  # 0xFF000000 as int32: alpha=255 in packed RGBA words


def _build_tiled_kernel(
    *,
    ntx: int,
    k_tri: int,
    k_sph: int,
    k_sh_tri: int,
    k_sh_sph: int,
    n_lights: int,
    shading: str,
    shadows: bool,
    projective: bool = False,
    out_packed: bool = False,
):
    TP = SUB_PIX
    # Folded layout: (1, TP) <-> (FOLD, FT). The unpacked kernel folds to
    # 8 sublanes (one vreg) per channel row; the PACKED kernel folds to 16
    # sublanes so FT == TILE_W — each folded sublane is then a literal
    # image row and the packed int32 words store straight into an (H, W)
    # framebuffer block with no post-kernel untangling at all.
    FOLD = 16 if out_packed else 8
    FT = SUB_PIX // FOLD

    def fold(a):
        """(1, TP) -> (FOLD, FT): row s holds pixels [s*FT, (s+1)*FT).

        (1, N) vectors occupy only sublane 0 of each vreg (1/8 VPU
        utilization); the shading phase folds its per-pixel state into all
        sublanes so every elementwise op runs at full width. Flattening
        (FOLD, FT) row-major gives back the original pixel order, so indices
        line up with iota-derived coordinates."""
        return jnp.concatenate(
            [a[:, s * FT : (s + 1) * FT] for s in range(FOLD)], axis=0
        )

    # There is deliberately NO unfold: the kernel writes folded (8, FT)
    # channel rows straight to a channel-major output layout and the
    # wrapper's XLA untangle pass absorbs the fold order. (Unfolding
    # in-kernel needs a lane<->sublane relayout that Mosaic either rejects
    # — "offset mismatch on non-concat dimension" — or compiles
    # pathologically slowly as a reshape.)

    def cols(ref, off, qs):
        """(CHUNK, 1) coefficient columns at dynamic sublane offset `off`."""
        return tuple(ref[0, pl.ds(off, CHUNK), q : q + 1] for q in qs)

    def scalar(params_ref, i):
        return params_ref[i]

    def best_update(t, valid, attr_chunk, best_t, best_attr):
        """Streaming nearest-hit; prims on sublanes. attr_chunk: (CHUNK, 8).
        Strict < keeps the earlier chunk's winner on ties; within a chunk
        the lowest sublane (lowest primitive index) wins — the reference's
        first-in-order tie break (rayTracer.cl:140-184)."""
        sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TP), 0)
        tpair = jnp.where(valid, t, MISS_T)
        cmin = jnp.min(tpair, axis=0, keepdims=True)         # (1, TP)
        wins = cmin < best_t                                 # (1, TP)
        first = jnp.min(
            jnp.where(tpair == cmin, sub, CHUNK), axis=0, keepdims=True
        )
        onehot = ((sub == first) & wins).astype(jnp.float32)  # (CHUNK, TP)
        upd = _dot_prim(attr_chunk, onehot)                   # (8, TP)
        best_attr = jnp.where(wins, upd, best_attr)
        best_t = jnp.where(wins, cmin, best_t)
        return best_t, best_attr

    def tri_affine(coef_ref, off, x, y):
        u0, ux, uy, v0, vx, vy, t0, tx, ty = cols(coef_ref, off, range(9))
        u = u0 + x * ux + y * uy
        v = v0 + x * vx + y * vy
        t = t0 + x * tx + y * ty
        valid = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        return t, valid

    def sph_affine(coef_ref, off, x, y, x2, y2, xy):
        (tc0, tcx, tcy, d20, d2x, d2y, d2xx, d2yy, d2xy, r2) = cols(
            coef_ref, off, range(10)
        )
        tca = tc0 + x * tcx + y * tcy
        d2 = d20 + x * d2x + y * d2y + x2 * d2xx + y2 * d2yy + xy * d2xy
        hit = (tca >= 0.0) & (d2 <= r2)
        thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
        t0 = tca - thc
        return t0, hit & (t0 != 0.0)

    # --- projective (pinhole) tests: see _prep_projective_coefs -------------
    def tri_proj(coef_ref, off, x, y, len_d):
        (det0, detx, dety, un0, unx, uny, vn0, vnx, vny, tn) = cols(
            coef_ref, off, range(10)
        )
        det = det0 + x * detx + y * dety
        un = un0 + x * unx + y * uny
        vn = vn0 + x * vnx + y * vny
        # sign-aware barycentric tests: u in [0,1], v >= 0, u+v <= 1 without
        # dividing; |det| >= eps*|d| matches the oracle's normalized-dir eps.
        sgn = jnp.where(det >= 0.0, 1.0, -1.0)
        dets = det * sgn
        uns = un * sgn
        vns = vn * sgn
        valid = (
            (dets >= EPSILON * len_d)
            & (uns >= 0.0)
            & (vns >= 0.0)
            & (uns + vns <= dets)
        )
        t = tn / jnp.where(valid, det, 1.0) * len_d
        return t, valid

    def sph_proj(coef_ref, off, x, y, inv_len):
        tc0, tcx, tcy, l2, r2 = cols(coef_ref, off, range(5))
        tca = (tc0 + x * tcx + y * tcy) * inv_len
        d2 = l2 - tca * tca
        hit = (tca >= 0.0) & (d2 <= r2)
        thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
        t0 = tca - thc
        return t0, hit & (t0 != 0.0)

    def trace_type(coef_ref, attr_ref, count, test, best):
        """Dynamic chunk loop over one candidate type (ragged skip)."""
        n_ch = (count + (CHUNK - 1)) // CHUNK

        def body(c, carry):
            best_t, best_attr = carry
            off = c * CHUNK
            t, valid = test(off)
            attr_chunk = attr_ref[0, pl.ds(off, CHUNK), :]   # (CHUNK, 8)
            return best_update(t, valid, attr_chunk, best_t, best_attr)

        return jax.lax.fori_loop(0, n_ch, body, best)

    # --- shadow tests ------------------------------------------------------
    # Triangles: light-frustum plane tests, affine in (x, y, t) because
    # p = (x + t*d0x, y + t*d0y, t*d0z). Spheres: geometric segment test
    # along the (already computed) unit light direction.
    def tri_sh_chunk(ref, li, off, x, y, t, d0, o0c):
        d0x, d0y, d0z = d0
        o0x, o0y, o0z = o0c
        occ_c = None
        for pi in range(4):
            mx, my, mz, cc = cols(ref, li * k_sh_tri + off, range(4 * pi, 4 * pi + 4))
            md = mx * d0x + my * d0y + mz * d0z      # (CHUNK, 1) column math
            # p = o0 + (x, y, 0) + t*d: fold m.o0 into the plane offset
            s = (cc + mx * o0x + my * o0y + mz * o0z) + mx * x + my * y + md * t
            eps = _SH_PLANE_EPS if pi == 3 else 0.0
            cond = s >= eps
            occ_c = cond if occ_c is None else (occ_c & cond)
        return occ_c                                  # (CHUNK, TP)

    def tri_sh_chunk_proj(ref, li, off, o0c, dn, t):
        """Frustum plane test under the pinhole: p = o + t*dn, so
        m.p + c = (m.o + c) + t*(m.dn) — per-prim column math + one FMA
        against the per-pixel unit direction."""
        o0x, o0y, o0z = o0c
        dnx, dny, dnz = dn
        occ_c = None
        for pi in range(4):
            mx, my, mz, cc = cols(ref, li * k_sh_tri + off, range(4 * pi, 4 * pi + 4))
            md = mx * dnx + my * dny + mz * dnz       # (CHUNK, TP)
            s = (cc + mx * o0x + my * o0y + mz * o0z) + md * t
            eps = _SH_PLANE_EPS if pi == 3 else 0.0
            cond = s >= eps
            occ_c = cond if occ_c is None else (occ_c & cond)
        return occ_c                                  # (CHUNK, TP)

    def sph_sh_chunk(ref, li, off, p, ld, dist):
        px, py, pz = p
        ldx, ldy, ldz = ld
        cx, cy, cz, r2 = cols(ref, li * k_sh_sph + off, range(4))
        lx, ly, lz = cx - px, cy - py, cz - pz
        tca = lx * ldx + ly * ldy + lz * ldz
        m2 = lx * lx + ly * ly + lz * lz - tca * tca
        hit = (tca >= 0.0) & (m2 <= r2)
        thc = jnp.sqrt(jnp.maximum(r2 - m2, 0.0))
        t0 = tca - thc
        return hit & (t0 > 1e-3) & (t0 < dist)

    def occluded(tri_sh_ref, sph_sh_ref, li, cnt_t, cnt_s, tri_args,
                 p, ld, dist):
        # The visibility accumulator is f32 0/1 rather than bool: i1 vector
        # carries through dynamic-trip-count loops tickle a Mosaic layout
        # bug (vpad mismatch in arith.ori), and the caller wants a float
        # multiplier anyway.
        vis = jnp.ones((1, TP), jnp.float32)

        if k_sh_tri:
            def body_t(c, vis):
                if projective:
                    o0c, dn, t = tri_args
                    blocked = tri_sh_chunk_proj(
                        tri_sh_ref, li, c * CHUNK, o0c, dn, t
                    )
                else:
                    x, y, t, d0, o0c = tri_args
                    blocked = tri_sh_chunk(
                        tri_sh_ref, li, c * CHUNK, x, y, t, d0, o0c
                    )
                clear = ~jnp.any(blocked, axis=0, keepdims=True)
                return vis * clear.astype(jnp.float32)

            vis = jax.lax.fori_loop(
                0, (cnt_t + (CHUNK - 1)) // CHUNK, body_t, vis
            )
        if k_sh_sph:
            def body_s(c, vis):
                blocked = sph_sh_chunk(sph_sh_ref, li, c * CHUNK, p, ld, dist)
                clear = ~jnp.any(blocked, axis=0, keepdims=True)
                return vis * clear.astype(jnp.float32)

            vis = jax.lax.fori_loop(
                0, (cnt_s + (CHUNK - 1)) // CHUNK, body_s, vis
            )
        return vis

    def kernel(
        *refs,
        # unpacked:  (params, counts, tri_coef, tri_attr, sph_coef,
        #             sph_attr, tri_sh, sph_sh, out)
        # packed:    (inmap, params, counts, tri_coef, tri_attr, sph_coef,
        #             sph_attr, tri_sh, sph_sh, prefill, out) — inmap is
        #            the scalar-prefetched TILE WORKLIST (see the packed
        #            wrapper): step i processes tile inmap[i] (nonempty
        #            tiles first; steps past the worklist length pin to
        #            the last nonempty tile so trailing empty steps
        #            re-visit a resident block — zero DMA), and prefill is
        #            the output-aliased empty-tile constant buffer.
    ):
        if out_packed:
            (inmap_ref, params_ref, counts_ref, tri_coef_ref,
             tri_attr_ref, sph_coef_ref, sph_attr_ref, tri_sh_ref,
             sph_sh_ref, _prefill_ref, out_ref) = refs
            step = pl.program_id(0)
            i = inmap_ref[step]
            # worklist length M rides in the last slot of the prefetched
            # map (see the packed wrapper). Steps >= M are no-ops: their
            # blocks all pin to the last nonempty tile (resident, no DMA)
            # and they store nothing — the aliased prefill buffer already
            # holds the empty-tile constant. step == 0 stays active so an
            # all-empty frame still writes tile 0's (visited) out block.
            m = inmap_ref[inmap_ref.shape[0] - 1]
            active = (step < m) | (step == 0)
        else:
            (params_ref, counts_ref, tri_coef_ref, tri_attr_ref,
             sph_coef_ref, sph_attr_ref, tri_sh_ref, sph_sh_ref,
             out_ref) = refs
            i = pl.program_id(0)
            active = None
        ty = i // ntx
        tx = i - ty * ntx
        x0 = (tx * TILE_W).astype(jnp.float32)
        y0 = (ty * TILE_H).astype(jnp.float32)

        cnt_tri = counts_ref[i, 0]
        cnt_sph = counts_ref[i, 1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TP), 1)
        lx_pix = (lane % TILE_W).astype(jnp.float32)
        lrow = (lane // TILE_W).astype(jnp.float32)

        d0x, d0y, d0z = (scalar(params_ref, _P_D0 + q) for q in range(3))
        o0x, o0y, o0z = (scalar(params_ref, _P_O0 + q) for q in range(3))
        if projective:
            ddxv = tuple(scalar(params_ref, _P_DDX + q) for q in range(3))
            ddyv = tuple(scalar(params_ref, _P_DDY + q) for q in range(3))

        def sub_block(sb, _):
            x = x0 + lx_pix
            y = y0 + (sb * ROWS_PER_SUB).astype(jnp.float32) + lrow

            if projective:
                # per-pixel unnormalized direction + its length, once per
                # sub-block; every candidate test reuses them.
                dux = d0x + x * ddxv[0] + y * ddyv[0]
                duy = d0y + x * ddxv[1] + y * ddyv[1]
                duz = d0z + x * ddxv[2] + y * ddyv[2]
                len2 = jnp.maximum(dux * dux + duy * duy + duz * duz, 1e-20)
                inv_len = jax.lax.rsqrt(len2)
                len_d = len2 * inv_len
                tri_test = lambda off: tri_proj(tri_coef_ref, off, x, y, len_d)
                sph_test = lambda off: sph_proj(sph_coef_ref, off, x, y, inv_len)
            else:
                x2, y2, xy = x * x, y * y, x * y
                tri_test = lambda off: tri_affine(tri_coef_ref, off, x, y)
                sph_test = lambda off: sph_affine(
                    sph_coef_ref, off, x, y, x2, y2, xy
                )

            best = (
                jnp.full((1, TP), MISS_T, jnp.float32),
                jnp.zeros((8, TP), jnp.float32),
            )
            if k_tri:
                best = trace_type(
                    tri_coef_ref, tri_attr_ref, cnt_tri, tri_test, best
                )
            if k_sph:
                best = trace_type(
                    sph_coef_ref, sph_attr_ref, cnt_sph, sph_test, best
                )
            best_t, best_attr = best

            # Winner state folds to (8, FT) so all shading below runs at
            # full VPU width; pixel coords regenerate from iota.
            t8 = fold(best_t)
            hit8 = t8 < MISS_T
            cr8 = fold(best_attr[0:1])
            cg8 = fold(best_attr[1:2])
            cb8 = fold(best_attr[2:3])

            if shading == "legacy":
                scalar_t = 255.0 - t8 * (255.0 / LEGACY_FOG_MAX)
                r8 = jnp.where(hit8, cr8 * scalar_t, 0.0)
                g8 = jnp.where(hit8, cg8 * scalar_t, 0.0)
                b8 = jnp.where(hit8, cb8 * scalar_t, 0.0)
            else:
                # ---- shadow phase: (1, TP) pixel rows vs sublane-chunked
                # occluder candidates (the layouts the tests want).
                vis_list = []
                if shadows:
                    if projective:
                        dn = (dux * inv_len, duy * inv_len, duz * inv_len)
                        px = o0x + best_t * dn[0]   # p = o + t * unit dir
                        py = o0y + best_t * dn[1]
                        pz = o0z + best_t * dn[2]
                        tri_args = ((o0x, o0y, o0z), dn, best_t)
                    else:
                        # origin o0 + (x, y, 0) + t*d (o0 is the row-shard
                        # shift under sharded cameras; zero for the base)
                        px = o0x + x + best_t * d0x
                        py = o0y + y + best_t * d0y
                        pz = o0z + best_t * d0z
                        tri_args = (
                            x, y, best_t, (d0x, d0y, d0z), (o0x, o0y, o0z)
                        )
                    for li in range(n_lights):
                        base = _P_LIGHTS + li * _LIGHT_STRIDE
                        lpx, lpy, lpz = (
                            scalar(params_ref, base + q) for q in range(3)
                        )
                        tlx, tly, tlz = lpx - px, lpy - py, lpz - pz
                        tl2 = jnp.maximum(
                            tlx * tlx + tly * tly + tlz * tlz, 1e-20
                        )
                        rinv = jax.lax.rsqrt(tl2)
                        dist = tl2 * rinv
                        ld = (tlx * rinv, tly * rinv, tlz * rinv)
                        vis_list.append(occluded(
                            tri_sh_ref, sph_sh_ref, li,
                            counts_ref[i, 2 + 2 * li],
                            counts_ref[i, 3 + 2 * li],
                            tri_args,
                            (px, py, pz), ld, dist,
                        ))

                # ---- shading phase, FOLDED to (8, FT) for full VPU width.
                # Pixel coords regenerate from iota (no relayout); only the
                # winner state + visibility masks fold. All formulas are
                # bit-identical to the unfolded math, so oracle parity is
                # unaffected.
                lane8 = jax.lax.broadcasted_iota(jnp.int32, (FOLD, FT), 1)
                sub8 = jax.lax.broadcasted_iota(jnp.int32, (FOLD, FT), 0)
                x8 = x0 + (lane8 % TILE_W).astype(jnp.float32)
                row8 = (FT // TILE_W) * sub8 + lane8 // TILE_W
                y8 = (
                    y0
                    + (sb * ROWS_PER_SUB).astype(jnp.float32)
                    + row8.astype(jnp.float32)
                )
                ax8, ay8, az8 = (
                    fold(best_attr[3:4]), fold(best_attr[4:5]),
                    fold(best_attr[5:6]),
                )
                irad8 = fold(best_attr[6:7])  # 1/r (0 when padded)
                is_sph8 = fold(best_attr[7:8])
                vis8 = [fold(v) for v in vis_list]

                if projective:
                    # folded per-pixel unit direction regenerates from iota
                    du8x = d0x + x8 * ddxv[0] + y8 * ddyv[0]
                    du8y = d0y + x8 * ddxv[1] + y8 * ddyv[1]
                    du8z = d0z + x8 * ddxv[2] + y8 * ddyv[2]
                    inv8 = jax.lax.rsqrt(jnp.maximum(
                        du8x * du8x + du8y * du8y + du8z * du8z, 1e-20
                    ))
                    rdx, rdy, rdz = du8x * inv8, du8y * inv8, du8z * inv8
                    px8 = o0x + t8 * rdx
                    py8 = o0y + t8 * rdy
                    pz8 = o0z + t8 * rdz
                    vx, vy, vz = -rdx, -rdy, -rdz  # unit already
                else:
                    rdx, rdy, rdz = d0x, d0y, d0z
                    px8 = o0x + x8 + t8 * d0x
                    py8 = o0y + y8 + t8 * d0y
                    pz8 = o0z + t8 * d0z
                    # view dir is a per-frame scalar (shared camera direction)
                    vinv = jax.lax.rsqrt(
                        jnp.maximum(d0x * d0x + d0y * d0y + d0z * d0z, 1e-20)
                    )
                    vx, vy, vz = -d0x * vinv, -d0y * vinv, -d0z * vinv
                nsx = (px8 - ax8) * irad8
                nsy = (py8 - ay8) * irad8
                nsz = (pz8 - az8) * irad8
                flip = jnp.where(
                    ax8 * rdx + ay8 * rdy + az8 * rdz > 0, -1.0, 1.0
                )
                nx = jnp.where(is_sph8 > 0.5, nsx, ax8 * flip)
                ny = jnp.where(is_sph8 > 0.5, nsy, ay8 * flip)
                nz = jnp.where(is_sph8 > 0.5, nsz, az8 * flip)
                ninv = jax.lax.rsqrt(
                    jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20)
                )
                nx, ny, nz = nx * ninv, ny * ninv, nz * ninv

                ambient = scalar(params_ref, _P_AMBIENT)
                spec_k = scalar(params_ref, _P_SPEC)
                shine = scalar(params_ref, _P_SHINE)
                diff_r = jnp.zeros((FOLD, FT), jnp.float32)
                diff_g = jnp.zeros((FOLD, FT), jnp.float32)
                diff_b = jnp.zeros((FOLD, FT), jnp.float32)
                spec_r = jnp.zeros((FOLD, FT), jnp.float32)
                spec_g = jnp.zeros((FOLD, FT), jnp.float32)
                spec_b = jnp.zeros((FOLD, FT), jnp.float32)
                for li in range(n_lights):
                    base = _P_LIGHTS + li * _LIGHT_STRIDE
                    lpx, lpy, lpz = (scalar(params_ref, base + q) for q in range(3))
                    lcr, lcg, lcb = (
                        scalar(params_ref, base + 3 + q) for q in range(3)
                    )
                    lint = scalar(params_ref, base + 6)
                    tlx, tly, tlz = lpx - px8, lpy - py8, lpz - pz8
                    tl2 = jnp.maximum(
                        tlx * tlx + tly * tly + tlz * tlz, 1e-20
                    )
                    rinv = jax.lax.rsqrt(tl2)
                    ldx, ldy, ldz = tlx * rinv, tly * rinv, tlz * rinv
                    ndl = nx * ldx + ny * ldy + nz * ldz
                    ndotl = jnp.maximum(ndl, 0.0)
                    vis = vis8[li] if shadows else 1.0
                    wdiff = lint * ndotl * vis
                    diff_r += wdiff * lcr
                    diff_g += wdiff * lcg
                    diff_b += wdiff * lcb
                    if shading == "phong":
                        two_ndl = 2.0 * ndl
                        rx = two_ndl * nx - ldx
                        ry = two_ndl * ny - ldy
                        rz = two_ndl * nz - ldz
                        rdotv = jnp.maximum(rx * vx + ry * vy + rz * vz, 0.0)
                        wspec = (
                            spec_k
                            * jnp.exp(
                                shine * jnp.log(jnp.maximum(rdotv, 1e-20))
                            )
                            * lint
                            * vis
                            * (ndotl > 0.0)
                        )
                        spec_r += wspec * lcr
                        spec_g += wspec * lcg
                        spec_b += wspec * lcb

                r8 = jnp.clip(cr8 * (ambient + diff_r) + spec_r, 0.0, 1.0) * 255.0
                g8 = jnp.clip(cg8 * (ambient + diff_g) + spec_g, 0.0, 1.0) * 255.0
                b8 = jnp.clip(cb8 * (ambient + diff_b) + spec_b, 0.0, 1.0) * 255.0
                r8 = jnp.where(hit8, r8, 0.0)
                g8 = jnp.where(hit8, g8, 0.0)
                b8 = jnp.where(hit8, b8, 0.0)

            if out_packed:
                # PACKED store: clamp to the byte range (the display-path
                # semantics of utils/image.pack_rgba), truncate to int (the
                # reference's int cast, rayTracer.cl:193-196) and pack
                # R | G<<8 | B<<16 | 255<<24 into ONE int32 per pixel — the
                # little-endian RGBA byte stream the PNG/display path wants.
                # The multiplies are exact shifts (channels < 256, no
                # carries). With FOLD=16, FT == TILE_W, so the (16, 128)
                # word block IS image rows [sb*16, +16) of the tile: one
                # aligned store, 4 B/pixel, nothing to untangle after.
                ri = jnp.clip(r8, 0.0, 255.0).astype(jnp.int32)
                gi = jnp.clip(g8, 0.0, 255.0).astype(jnp.int32)
                bi = jnp.clip(b8, 0.0, 255.0).astype(jnp.int32)
                word = ri + gi * 256 + bi * 65536 + jnp.int32(_ALPHA_BITS)
                base_row = pl.multiple_of(sb * ROWS_PER_SUB, 8)
                out_ref[pl.ds(base_row, ROWS_PER_SUB), :] = word
            else:
                # Channel-major folded stores: channel c of sub-block sb owns
                # output rows [c*N_SUB*8 + sb*8, +8). All 8-sublane-aligned,
                # no relayout; the wrapper's untangle pass restores image
                # order. Only the 4 RGBA channels are emitted: aux (t/hit)
                # channels had no consumer and doubled both the HBM store
                # traffic and the post-kernel untangle cost.
                channels = (
                    r8, g8, b8,
                    jnp.full((FOLD, FT), 255.0, jnp.float32),
                )
                base_row = pl.multiple_of(sb * 8, 8)
                for c, val8 in enumerate(channels):
                    out_ref[0, pl.ds(c * (N_SUB * 8) + base_row, 8), :] = val8
            return 0

        # Empty tiles (no primary candidates — ~89% of the sparse headline
        # frame): zero hits means the full pipeline provably writes rgb=0,
        # alpha=255, so skip ray tests AND shading and store the constant.
        empty = (cnt_tri + cnt_sph) == 0
        if active is not None:
            # packed worklist: inactive steps do NOTHING (their out block
            # is the last nonempty tile's, already fully stored by an
            # earlier step; storing here would corrupt it, and the aliased
            # prefill already covers every unvisited empty tile).
            store_const = empty & active
            compute = jnp.logical_not(empty) & active
        else:
            store_const = empty
            compute = jnp.logical_not(empty)

        @pl.when(store_const)
        def _():
            if out_packed:
                out_ref[:, :] = jnp.full(
                    (TILE_H, TILE_W), _ALPHA_BITS, jnp.int32
                )
            else:
                out_ref[0, pl.ds(0, 3 * N_SUB * 8), :] = jnp.zeros(
                    (3 * N_SUB * 8, FT), jnp.float32
                )
                out_ref[0, pl.ds(3 * N_SUB * 8, N_SUB * 8), :] = jnp.full(
                    (N_SUB * 8, FT), 255.0, jnp.float32
                )

        @pl.when(compute)
        def _():
            # fori_loop (not an unrolled python loop) so each sub-block
            # reuses the same VMEM temporaries — unrolling all sub-blocks
            # blows the 16MB scoped-vmem budget with shadows on.
            jax.lax.fori_loop(0, N_SUB, sub_block, 0)

    return kernel


# ---------------------------------------------------------------------------
# Binning products + wrapper
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@_dc.dataclass
class TileBins:
    """Scene-static binning products, reusable across frames/cameras.

    Everything here depends only on the scene (and light xy for shadow
    tables) — NOT on the camera. For animation/optimization loops, compute
    once per scene with `bin_scene` and pass to render; the per-frame work
    is then just the (camera-dependent) affine-coefficient gather + kernel.
    """

    t_idx: jax.Array       # (n_tiles, k_tri) int32
    t_valid: jax.Array     # (n_tiles, k_tri) bool
    s_idx: jax.Array       # (n_tiles, k_sph)
    s_valid: jax.Array
    tri_attr_t: jax.Array  # (n_tiles, k_tri, 8)
    sph_attr_t: jax.Array  # (n_tiles, k_sph, 8)
    tri_sh_t: jax.Array    # (n_tiles | 1, L*k_sh_tri, 16) frustum planes
    sph_sh_t: jax.Array    # (n_tiles | 1, L*k_sh_sph, 16) occluder rows
    counts: jax.Array      # (n_tiles, 2 + 2L) int32
    overflow: jax.Array    # () bool
    k_tri: int = _dc.field(metadata=dict(static=True), default=0)
    k_sph: int = _dc.field(metadata=dict(static=True), default=0)
    k_sh_tri: int = _dc.field(metadata=dict(static=True), default=0)
    k_sh_sph: int = _dc.field(metadata=dict(static=True), default=0)
    nty: int = _dc.field(metadata=dict(static=True), default=0)
    ntx: int = _dc.field(metadata=dict(static=True), default=0)
    # pinhole bins: perspective bboxes, shared full shadow tables. A
    # projective bins object only renders with a normalize camera (and
    # vice versa); _render_tiled_jit enforces the match.
    projective: bool = _dc.field(metadata=dict(static=True), default=False)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "k", "shadows", "shadow_k")
)
def bin_scene(packed, *, height: int, width: int, k: int = 32,
              shadows: bool = False, shadow_k: int = 64,
              camera: Optional[Camera] = None) -> TileBins:
    """Tile binning (primary + shadow candidate lists).

    Without `camera` (or with a shared-direction one): scene-static ortho
    binning, reusable across frames/cameras. With a normalize (pinhole)
    `camera`: perspective screen-space bboxes — the bins then depend on the
    camera pose and must be recomputed when it moves.

    Shared-direction cameras contribute only their origin OFFSET (o0.xy):
    tile rects shift into world coordinates, which is what makes the
    shard_map camera-shift trick bin correctly per row shard. (The ortho
    binning assumes the legacy image-space convention dox = x, doy = y.)"""
    projective = camera is not None and camera.normalize
    offs = (
        (camera.o0[0], camera.o0[1])
        if (camera is not None and not projective) else None
    )
    nty = _round_up(height, TILE_H) // TILE_H
    ntx = _round_up(width, TILE_W) // TILE_W
    n_tiles = nty * ntx
    n_lights = packed.lights.position.shape[0]
    _, tri_attr, _, sph_attr = _prep_scene_arrays(packed)
    if projective:
        tri_box, sph_box = _pinhole_bboxes(packed, camera)
    else:
        tri_box, sph_box = _prim_bboxes(packed)

    k_tri = (
        min(k, _round_up(max(packed.n_tris, 1), CHUNK)) if packed.n_tris else 0
    )
    k_sph = (
        min(k, _round_up(max(packed.n_spheres, 1), CHUNK))
        if packed.n_spheres else 0
    )

    overflow = jnp.zeros((), bool)
    zero_cnt = jnp.zeros((n_tiles,), jnp.int32)
    if k_tri:
        t_idx, t_valid, cnt_tri, over = _bin_prims(
            tri_box, packed.n_tris, nty, ntx, k_tri, offs=offs
        )
        overflow |= over
        tri_attr_t = jnp.where(t_valid[..., None], tri_attr[t_idx], 0.0)
    else:
        t_idx = jnp.zeros((n_tiles, CHUNK), jnp.int32)
        t_valid = jnp.zeros((n_tiles, CHUNK), bool)
        tri_attr_t = jnp.zeros((n_tiles, CHUNK, 8), jnp.float32)
        cnt_tri = zero_cnt
    if k_sph:
        s_idx, s_valid, cnt_sph, over = _bin_prims(
            sph_box, packed.n_spheres, nty, ntx, k_sph, offs=offs
        )
        overflow |= over
        sph_attr_t = jnp.where(s_valid[..., None], sph_attr[s_idx], 0.0)
    else:
        s_idx = jnp.zeros((n_tiles, CHUNK), jnp.int32)
        s_valid = jnp.zeros((n_tiles, CHUNK), bool)
        sph_attr_t = jnp.zeros((n_tiles, CHUNK, 8), jnp.float32)
        cnt_sph = zero_cnt

    # Shadow candidate tables. Ortho: per-(light, tile) corridor binning.
    # Pinhole: shadow rays fan out from hit points anywhere in the tile's
    # view frustum toward the light, so no screen-space corridor bounds the
    # occluder set (an occluder between surface and light need not be
    # visible in the tile at all). Shadow candidates are then the FULL
    # primitive set, stored ONCE and shared by every tile (the kernel's
    # shadow block specs pin to block 0). Primary-ray culling is unaffected;
    # the perf-critical legacy pinhole mode has no shadows.
    sh_tiles = 1 if projective else n_tiles
    if projective:
        k_sh_tri = packed.padded_tris if (shadows and packed.n_tris) else 0
        k_sh_sph = packed.padded_spheres if (shadows and packed.n_spheres) else 0
    else:
        k_sh_tri = (
            min(shadow_k, _round_up(packed.n_tris, CHUNK))
            if (shadows and packed.n_tris) else 0
        )
        k_sh_sph = (
            min(shadow_k, _round_up(packed.n_spheres, CHUNK))
            if (shadows and packed.n_spheres) else 0
        )
    lpos = packed.lights.position
    # z inputs of the segment-hull shadow culling (small pad: exact hard
    # occlusion plus the shadow-ray t_min offset margin). tile_z is the
    # PER-TILE hit-z slab from the primary candidate lists (round 5) —
    # strictly tighter than the global scene slab it replaces.
    z_pad = 0.1
    tri_zext, sph_zext = _prim_z_extents(packed, z_pad)
    tile_z = _tile_hit_z(
        t_idx, t_valid, s_idx, s_valid, tri_zext, sph_zext, nty, ntx
    )
    if k_sh_tri:
        if projective:
            planes = jnp.stack(
                [_tri_shadow_planes(packed, lpos[li]) for li in range(n_lights)]
            )  # (L, Tp, 16); padded tris have degenerate rows (c = -1e9)
            tri_sh_t = planes.reshape(1, n_lights * k_sh_tri, 16)
            cnt_sh_tri = jnp.full((n_tiles, n_lights), packed.n_tris, jnp.int32)
        else:
            tri_sh_t, cnt_sh_tri, over = _shadow_tables(
                lambda li: _tri_shadow_planes(packed, lpos[li]),
                tri_box, packed.n_tris, nty, ntx, k_sh_tri, lpos, _NULL_SH_TRI,
                offs=offs, prim_z=tri_zext, tile_z=tile_z,
            )
            overflow |= over
    else:
        tri_sh_t = jnp.broadcast_to(
            _NULL_SH_TRI, (sh_tiles, n_lights * CHUNK, 16)
        )
        cnt_sh_tri = jnp.zeros((n_tiles, n_lights), jnp.int32)
    if k_sh_sph:
        sph_rows = _sph_shadow_rows(packed)
        if projective:
            # null the padded slots (zero-radius spheres at the origin could
            # false-occlude a ray passing exactly through it)
            real = jnp.arange(packed.padded_spheres) < packed.n_spheres
            sph_rows = jnp.where(real[:, None], sph_rows, _NULL_SH_SPH)
            sph_sh_t = jnp.broadcast_to(
                sph_rows, (n_lights, k_sh_sph, 16)
            ).reshape(1, n_lights * k_sh_sph, 16)
            cnt_sh_sph = jnp.full(
                (n_tiles, n_lights), packed.n_spheres, jnp.int32
            )
        else:
            sph_sh_t, cnt_sh_sph, over = _shadow_tables(
                lambda li: sph_rows,
                sph_box, packed.n_spheres, nty, ntx, k_sh_sph, lpos,
                _NULL_SH_SPH, offs=offs, prim_z=sph_zext, tile_z=tile_z,
            )
            overflow |= over
    else:
        sph_sh_t = jnp.broadcast_to(
            _NULL_SH_SPH, (sh_tiles, n_lights * CHUNK, 16)
        )
        cnt_sh_sph = jnp.zeros((n_tiles, n_lights), jnp.int32)

    # counts layout: [tri, sph, (sh_tri, sh_sph) per light]
    sh_cols = jnp.stack([cnt_sh_tri, cnt_sh_sph], axis=-1).reshape(
        n_tiles, 2 * n_lights
    )
    counts = jnp.concatenate(
        [cnt_tri[:, None], cnt_sph[:, None], sh_cols], axis=1
    ).astype(jnp.int32)

    return TileBins(
        t_idx=t_idx, t_valid=t_valid, s_idx=s_idx, s_valid=s_valid,
        tri_attr_t=tri_attr_t, sph_attr_t=sph_attr_t,
        tri_sh_t=tri_sh_t, sph_sh_t=sph_sh_t, counts=counts,
        overflow=overflow,
        k_tri=k_tri, k_sph=k_sph, k_sh_tri=k_sh_tri, k_sh_sph=k_sh_sph,
        nty=nty, ntx=ntx, projective=projective,
    )


def _gather_coefs(coef, idx, valid, null_col):
    """Camera-dependent per-frame gather: coef (C, P) -> (n_tiles, k, 16)."""
    c = coef.shape[0]
    g = coef.T[idx]
    g = jnp.where(valid[..., None], g, null_col[:c])
    pad = 16 - c
    if pad:
        g = jnp.concatenate(
            [g, jnp.zeros(g.shape[:2] + (pad,), jnp.float32)], axis=-1
        )
    return g


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "shading", "shadows", "out_format",
                     "interpret"),
)
def _render_tiled_jit(
    packed,
    camera: Camera,
    bins: TileBins,
    *,
    height: int,
    width: int,
    shading: str,
    shadows: bool,
    out_format: str = "int",
    interpret: bool = False,
):
    from opencl_ray_tracer_tpu.kernels.fwd import _render_pallas_jit

    projective = camera.normalize
    if bins.projective != projective:
        raise ValueError(
            "TileBins/camera mismatch: pinhole cameras need bins computed "
            "with bin_scene(..., camera=camera)"
        )
    nty, ntx = bins.nty, bins.ntx
    n_tiles = nty * ntx

    if projective:
        tri_coef, sph_coef = _prep_projective_coefs(packed, camera)
        null_tri, null_sph = _NULL_TRI_PROJ, _NULL_SPH_PROJ
    else:
        tri_coef, sph_coef = _prep_affine_coefs(packed, camera)
        null_tri, null_sph = _NULL_TRI, _NULL_SPH
    if bins.k_tri:
        tri_coef_t = _gather_coefs(tri_coef, bins.t_idx, bins.t_valid, null_tri)
    else:
        tri_coef_t = jnp.broadcast_to(
            jnp.concatenate(
                [null_tri, jnp.zeros(16 - null_tri.shape[0])]
            ).astype(jnp.float32),
            (n_tiles, CHUNK, 16),
        )
    if bins.k_sph:
        sph_coef_t = _gather_coefs(sph_coef, bins.s_idx, bins.s_valid, null_sph)
    else:
        sph_coef_t = jnp.broadcast_to(
            jnp.concatenate(
                [null_sph, jnp.zeros(16 - null_sph.shape[0])]
            ).astype(jnp.float32),
            (n_tiles, CHUNK, 16),
        )

    params = _camera_params(camera, packed.lights)
    n_lights = packed.lights.position.shape[0]

    out_packed = out_format == "packed"
    kernel = _build_tiled_kernel(
        ntx=ntx,
        k_tri=bins.k_tri,
        k_sph=bins.k_sph,
        k_sh_tri=bins.k_sh_tri,
        k_sh_sph=bins.k_sh_sph,
        n_lights=n_lights,
        shading=shading,
        shadows=shadows,
        projective=projective,
        out_packed=out_packed,
    )

    tile3 = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # projective shadow tables are shared by all tiles: pin to block 0
    # (the pipeline keeps a revisited block resident — no per-tile DMA).
    shared3 = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    sh_spec = shared3 if projective else tile3

    def in_specs():
        return [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile3(tri_coef_t.shape),
            tile3(bins.tri_attr_t.shape),
            tile3(sph_coef_t.shape),
            tile3(bins.sph_attr_t.shape),
            sh_spec(bins.tri_sh_t.shape),
            sh_spec(bins.sph_sh_t.shape),
        ]

    def tiled_render(operands):
        (params_, counts, tc, ta, sc, sa, tsh, ssh) = operands
        # Output rows are channel-major folded: row c*N_SUB*8 + sb*8 + s of
        # a tile holds channel c pixels [sb*SUB_PIX + s*FT, +FT).
        ft = SUB_PIX // 8
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, 4 * N_SUB * 8, ft), jnp.float32
            ),
            grid=(n_tiles,),
            in_specs=in_specs(),
            out_specs=pl.BlockSpec(
                (1, 4 * N_SUB * 8, ft), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(params_, counts, tc, ta, sc, sa, tsh, ssh)
        # untangle (tile, channel, sub-block, fold-sublane, lane) -> planes
        img = out.reshape(nty, ntx, 4, N_SUB, 8, ft // TILE_W, TILE_W)
        img = img.transpose(2, 0, 3, 4, 5, 1, 6).reshape(
            4, nty * TILE_H, ntx * TILE_W
        )
        return img[:, :height, :width]

    def tiled_render_packed(operands):
        (params_, counts, tc, ta, sc, sa, tsh, ssh) = operands
        # PACKED path: the kernel's (TILE_H, TILE_W) int32 word blocks map
        # straight into the (H, W) framebuffer via the block index map —
        # 4 B/pixel of HBM store and ZERO post-kernel data movement (the
        # old float path wrote 16 B/px then paid a full-frame untangle
        # transpose + moveaxis + trunc: ~6x the frame's HBM traffic).
        #
        # TILE WORKLIST (scalar prefetch + aliased prefill): sparse frames
        # are dominated by per-grid-step overhead on EMPTY tiles (~1.07
        # us/step measured on v5e — an almost-empty 1080p frame cost 270
        # us; re-pinning only the input blocks recovered nothing, so the
        # floor is the per-step OUTPUT block writeback + step sequencing,
        # not input DMA issue). Scheme: the output buffer is ALIASED onto
        # a prefilled empty-tile-constant frame, the grid runs a
        # prefetched worklist with the M nonempty tiles first, and every
        # step past M is a true no-op — all its blocks (in AND out) pin to
        # the last nonempty tile (resident, zero DMA) and the kernel
        # stores nothing, so empty tiles are never visited at all; their
        # pixels come from the prefill. Verified semantics: pallas writes
        # back only blocks the out index map visits, aliasing preserves
        # the rest (interpret + compiled probe, round 4).
        empty_flag = (counts[:, 0] + counts[:, 1]) == 0
        m = jnp.sum((~empty_flag).astype(jnp.int32))
        order = jnp.argsort(empty_flag, stable=True).astype(jnp.int32)
        last_ne = order[jnp.maximum(m - 1, 0)]
        inmap = jnp.where(
            jnp.arange(n_tiles, dtype=jnp.int32) < m, order, last_ne
        )
        # worklist + its length M ride in one prefetched scalar array
        inmap = jnp.concatenate([inmap, m[None]])
        prefill = jnp.full(
            (nty * TILE_H, ntx * TILE_W), _ALPHA_BITS, jnp.int32
        )

        def tile3_w(shape):
            return pl.BlockSpec(
                (1,) + shape[1:],
                lambda i, im: (im[i], 0, 0),
                memory_space=pltpu.VMEM,
            )

        def shared3_w(shape):
            return pl.BlockSpec(
                (1,) + shape[1:],
                lambda i, im: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )

        sh_spec_w = shared3_w if projective else tile3_w
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # inmap (+ M in its last slot)
            # DYNAMIC grid: launch only the nonempty-tile steps (grid dims
            # may be traced scalars on TPU — verified compiled, round 4).
            # Empty tiles are never sequenced at all; at ~1.2 us of pure
            # per-step overhead each, this is what actually removes the
            # sparse-frame floor (re-pinning blocks + skipping stores
            # recovered nothing: the cost was step sequencing itself).
            # max(m, 1): an all-empty frame still runs step 0, whose
            # kernel stores the background constant into tile 0's block.
            grid=(jnp.maximum(m, 1),),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                tile3_w(tc.shape),
                tile3_w(ta.shape),
                tile3_w(sc.shape),
                tile3_w(sa.shape),
                sh_spec_w(tsh.shape),
                sh_spec_w(ssh.shape),
                pl.BlockSpec(memory_space=pl.ANY),  # prefill, aliased
            ],
            out_specs=pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda i, im: (im[i] // ntx, im[i] % ntx),
                memory_space=pltpu.VMEM,
            ),
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (nty * TILE_H, ntx * TILE_W), jnp.int32
            ),
            grid_spec=grid_spec,
            # operand order: inmap(scalar)=0, params=1, counts=2, tables
            # 3..8, prefill=9 -> aliased to output 0
            input_output_aliases={9: 0},
            interpret=interpret,
        )(inmap, params_, counts, tc, ta, sc, sa, tsh, ssh, prefill)
        return out[:height, :width]

    def brute_render(operands):
        del operands
        rgba = _render_pallas_jit(
            packed,
            camera,
            height=height,
            width=width,
            shading=shading,
            shadows=shadows,
            normalize_dir=camera.normalize,
            as_int=False,
            interpret=interpret,
        )  # (H, W, 4) float
        # match tiled_render's planar (4, H, W) contract
        return jnp.moveaxis(rgba, -1, 0)

    def brute_render_packed(operands):
        img = brute_render(operands)  # (4, H, W) float
        ch = jnp.clip(img, 0.0, 255.0).astype(jnp.int32)
        return (
            ch[0] + ch[1] * 256 + ch[2] * 65536 + jnp.int32(_ALPHA_BITS)
        )

    operands = (
        params, bins.counts, tri_coef_t, bins.tri_attr_t, sph_coef_t,
        bins.sph_attr_t, bins.tri_sh_t, bins.sph_sh_t,
    )
    if out_packed:
        return jax.lax.cond(
            bins.overflow, brute_render_packed, tiled_render_packed, operands
        )
    img = jax.lax.cond(bins.overflow, brute_render, tiled_render, operands)

    rgba = jnp.moveaxis(img[0:4], 0, -1)  # (H, W, 4)
    if out_format == "int":
        return jnp.trunc(rgba).astype(jnp.int32)
    return rgba


def render_tiled(
    scene,
    camera: Camera,
    config: RenderConfig,
    interpret: Optional[bool] = None,
) -> jax.Array:
    return render_tiled_packed(scene.pack(), camera, config, interpret)


def render_tiled_packed(
    packed,
    camera: Camera,
    config: RenderConfig,
    interpret: Optional[bool] = None,
    bins: Optional[TileBins] = None,
) -> jax.Array:
    """Tiled+culled render.

    Supports both camera families: shared-direction (legacy ortho) and
    shared-origin pinhole (`normalize` cameras, whose origin derivatives dox
    and doy must be zero — the only normalize cameras this framework
    constructs). Pass precomputed `bins` (from bin_scene) for hot loops
    where the scene is fixed; in-graph rebinning costs ~50-100 us/frame
    at 1080p (round-5 slope measurement — cheap enough that dynamic
    scenes/cameras can simply rebin every frame). Ortho bins depend on
    the camera only through its origin offset; pinhole bins depend on
    the full pose.

    Overflow policy: when called EAGERLY (outside jit), a tile exceeding
    cull_k auto-escalates — binning retries with doubled K until every
    candidate fits (cost grows ~2x per doubling, bounded by the primitive
    count), avoiding the ~10x whole-frame brute cliff. Under jit the
    overflow flag is traced, so the lax.cond brute fallback applies instead
    (never silently wrong either way)."""
    if interpret is None:
        interpret = _use_interpret()
    if bins is None:
        k, shadow_k = config.cull_k, config.shadow_cull_k

        def make(k_, sk_):
            return bin_scene(
                packed,
                height=config.height,
                width=config.width,
                k=k_,
                shadows=config.shadows,
                shadow_k=sk_,
                camera=camera,
            )

        bins = make(k, shadow_k)
        k_max = _round_up(max(packed.n_tris, packed.n_spheres, 1), CHUNK)
        if not isinstance(bins.overflow, jax.core.Tracer):
            while bool(bins.overflow) and max(k, shadow_k) < k_max:
                k = min(2 * k, k_max)
                shadow_k = min(2 * shadow_k, k_max)
                from opencl_ray_tracer_tpu.utils.log import log_warning

                log_warning(
                    "tile candidate overflow: re-binning with cull_k=%d "
                    "shadow_cull_k=%d", k, shadow_k,
                )
                bins = make(k, shadow_k)
    return _render_tiled_jit(
        packed,
        camera,
        bins,
        height=config.height,
        width=config.width,
        shading=config.shading,
        shadows=config.shadows,
        out_format=config.framebuffer_dtype,
        interpret=interpret,
    )
