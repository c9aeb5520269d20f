"""Tiled+culled Pallas kernels for the SOFT differentiable renderer, fwd+bwd.

The brute soft kernel (kernels/soft.py) pads every primitive type to
128-wide lane chunks, so a 22-primitive scene pays 256 slots per pixel per
pass (twice with shadows) — measured 41.9 ms fwd / 199.7 ms fwd+bwd at 1080p
phong+shadows on v5e. This module is the soft analogue of the hard path's
tiled kernel (fwd_tiled.py): per-tile candidate culling plus the transposed
layout (primitives on SUBLANES in 8-granular chunks, pixels on LANES), so
small scenes pay for what they contain.

Design (shared-direction cameras — the legacy ortho family):

1. BINNING (XLA): primitive screen bboxes padded by SOFT_CULL_SIGMAS *
   tau_edge — beyond ~16 sigma the coverage sigmoids underflow to exact f32
   zero, so culling is invisible in both the image and the gradients.
   Shadow candidates use the tile->light corridor bbox (fwd_tiled._bin_prims)
   with the same pad. Any tile over K falls back to the brute soft kernel
   for the frame via lax.cond (never silently wrong).
2. TABLES (XLA, differentiable): per-tile gathered coefficient tables.
   The primary pass uses AFFINE coefficients (fwd.py _prep_affine_coefs):
   with a shared direction, Möller–Trumbore's u, v, t and the sphere's
   tca / d^2 are affine/quadratic in pixel coords — and the soft pipeline's
   sigmoids consume u, v, 1-u-v and the sphere margin DIRECTLY, so the
   whole soft intersection is FMA + sigmoid. Per-primitive sigmoid scales
   (|e1|/tau_e etc.) are baked into the tables. Triangle normals are
   pre-flipped against the shared direction at gather time. The shadow pass
   keeps geometric rows (v0/e1/e2) because shadow rays have per-pixel
   directions. Because the gather is pure jnp, its jax.vjp IS the
   scatter-add from per-tile gradient tables back to scene parameters.
3. FORWARD kernel: grid (n_tiles, N_SUB); streaming softmin over candidate
   chunks exactly as kernels/soft.py's _tile_soft_math (same formulas — the
   jnp twin in diff/soft.py remains the independent oracle), but with (8,
   SUB_PIX) full-width VPU ops and the albedo+normal aggregation as one
   (8, 8) x (8, SUB_PIX) MXU matmul per chunk.
4. BACKWARD kernel: recompute-based in-kernel jax.vjp of the SAME tile
   function (single source of truth). Static-K chunk loops keep the tile
   function reverse-differentiable (null candidate rows contribute exact
   zeros, so static masked loops == ragged skipping bit-for-bit). Gradients
   land in PER-TILE table blocks — each grid step owns its tile's block, so
   there is no cross-tile accumulation in VMEM and XLA performs the final
   scatter-add via the gather's vjp outside the kernel. Camera/light/tau
   grads are per-tile rows summed outside.

Reference anchor: the device hot loop this differentiates is the TPU
re-design of resources/shaders/rayTracer.cl:111-202 (SURVEY.md §2 #1).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_ray_tracer_tpu.camera import Camera
from opencl_ray_tracer_tpu.config import RenderConfig
from opencl_ray_tracer_tpu.diff.soft import SHADOW_OFFSET, SHADOW_T_MIN
from opencl_ray_tracer_tpu.kernels.fwd import (
    _LIGHT_STRIDE,
    _P_AMBIENT,
    _P_D0,
    _P_DDX,
    _P_DDY,
    _P_DOX,
    _P_DOY,
    _P_LIGHTS,
    _P_O0,
    _P_SHINE,
    _P_SPEC,
    _camera_params,
    _prep_affine_coefs,
    _use_interpret,
)
from opencl_ray_tracer_tpu.kernels.fwd_tiled import (
    TILE_H,
    TILE_PIX,
    TILE_W,
    _bin_prims,
    _prim_bboxes,
    _round_up,
)
from opencl_ray_tracer_tpu.kernels.soft import NEG_BIG, VMEM_LIMIT_BYTES
from opencl_ray_tracer_tpu.ops.intersect import EPSILON
from opencl_ray_tracer_tpu.ops.shading import LEGACY_FOG_MAX

import os as _os

# Primitives per sublane chunk of the soft kernels' candidate loops. The
# ragged fori_loops execute ceil(count / CH) iterations; a larger CH
# halves the dynamic-loop iteration count at (mostly) the same executed
# slot count — per-iteration scalar/control overhead vs padding waste is
# the trade. Overridable for sweeps via OCTRT_SOFT_CH.
CH = int(_os.environ.get("OCTRT_SOFT_CH", "8"))
if CH not in (8, 16, 32):
    raise ValueError(
        f"OCTRT_SOFT_CH={CH} invalid: the sublane chunk must be 8, 16 or 32"
    )
# Ragged-loop unroll factor: 2 processes chunk PAIRS per fori iteration
# (half the dynamic-loop control overhead at CH-row vreg shapes; tables
# are padded to even chunk counts and trailing null chunks contribute
# exact zeros, so raggedness stays exact). Experimental knob — measured
# v5e trade: ~15-25% extra null-slot vector work vs halved per-iteration
# overhead.
_UNROLL = int(_os.environ.get("OCTRT_SOFT_UNROLL", "1"))
if _UNROLL not in (1, 2):
    raise ValueError(
        f"OCTRT_SOFT_UNROLL={_UNROLL} invalid: must be 1 or 2"
    )
SUB_PIX_FWD = 2048     # lane width per inner iteration (fwd)
# bwd strip width: the decomposed bwd keeps no cross-chunk residuals so
# wider strips FIT. Swept on v5e via scripts/sweep_sub_pix_bwd.py (headline
# 1080p phong+shadows fwd+bwd, slope harness, round 4): 1024: 3559 us,
# 2048: 2609 us, 4096: 2700 us, 8192: 3465 us — 2048 wins; narrower
# strips starve the pipeline with per-iteration overhead, wider ones lose
# cross-grid-step overlap (full table + per-stage split in docs/PERF.md).
# Overridable for re-sweeps via OCTRT_SUB_PIX_BWD (must divide TILE_PIX).
SUB_PIX_BWD = int(_os.environ.get("OCTRT_SUB_PIX_BWD", "2048"))
if SUB_PIX_BWD <= 0 or TILE_PIX % SUB_PIX_BWD or SUB_PIX_BWD % 128:
    raise ValueError(
        f"OCTRT_SUB_PIX_BWD={SUB_PIX_BWD} invalid: the backward strip "
        f"width must be a positive multiple of 128 that divides "
        f"TILE_PIX={TILE_PIX} (e.g. 1024, 2048, 4096, 8192)."
    )
# Coverage sigmoids are exp-small this many tau_edge units outside a
# primitive; 16 sigma => sigmoid ~ 1.1e-7, below visibility in a 0..255
# image and below the 1e-4 gradient tolerance. Overridable for
# tolerance/perf sweeps via OCTRT_SOFT_CULL_SIGMAS (8 sigma => 3.4e-4
# coverage on a culled prim, ~0.09 of a 0..255 pixel worst-case).
SOFT_CULL_SIGMAS = float(_os.environ.get("OCTRT_SOFT_CULL_SIGMAS", "16"))
if not SOFT_CULL_SIGMAS > 0:
    raise ValueError(
        f"OCTRT_SOFT_CULL_SIGMAS={SOFT_CULL_SIGMAS} invalid: must be > 0"
    )


def _dot_attr(attr_chunk, e):
    """(CH, 8) attrs x (CH, TP) weights -> (8, TP) on the MXU, exact."""
    return jax.lax.dot_general(
        attr_chunk,
        e,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Binning + per-frame gathered tables
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SoftBins:
    """Candidate index lists for the tiled soft kernels. Depends on the
    scene, tau_edge (bbox pad) and the camera's ORIGIN OFFSET (row-shard
    shift); shared-dir only."""

    t_idx: jax.Array      # (n_tiles, k_tri) int32
    t_valid: jax.Array
    s_idx: jax.Array      # (n_tiles, k_sph)
    s_valid: jax.Array
    tsh_idx: jax.Array    # (L, n_tiles, k_sh_tri)
    tsh_valid: jax.Array
    ssh_idx: jax.Array    # (L, n_tiles, k_sh_sph)
    ssh_valid: jax.Array
    counts: jax.Array     # (n_tiles, 2) int32: primary tri/sph candidates
    overflow: jax.Array   # () bool
    k_tri: int = dataclasses.field(metadata=dict(static=True), default=0)
    k_sph: int = dataclasses.field(metadata=dict(static=True), default=0)
    k_sh_tri: int = dataclasses.field(metadata=dict(static=True), default=0)
    k_sh_sph: int = dataclasses.field(metadata=dict(static=True), default=0)
    nty: int = dataclasses.field(metadata=dict(static=True), default=0)
    ntx: int = dataclasses.field(metadata=dict(static=True), default=0)
    # pinhole bins: perspective bboxes, full shared shadow lists
    projective: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )


def _pinhole_bboxes_soft(packed, camera, pad):
    """Perspective screen bboxes of primitives INFLATED by `pad` world
    units (the sigmoid-tail margin) — project the 8 corners of each
    primitive's padded AABB; any corner behind the near plane degrades to a
    conservative full-screen bbox (same scheme as fwd_tiled._pinhole_bboxes).
    """
    M = jnp.stack([camera.ddx, camera.ddy, camera.d0], axis=1)
    Minv = jnp.linalg.inv(M)
    big = 1e9
    signs = np.array(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], np.float32,
    )  # (8, 3)

    def box_of_aabb(lo, hi):  # (N, 3) each
        ctr = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo) + pad
        P = ctr[:, None, :] + half[:, None, :] * signs[None]  # (N, 8, 3)
        v = jnp.einsum("ij,nkj->nki", Minv, P - camera.o0)
        w = v[..., 2]
        front = w > 1e-6
        ok = jnp.all(front, axis=1)
        sw = jnp.where(front, w, 1.0)
        sx = v[..., 0] / sw
        sy = v[..., 1] / sw
        ppad = 1.0
        return (
            jnp.where(ok, jnp.min(sx, 1) - ppad, -big),
            jnp.where(ok, jnp.max(sx, 1) + ppad, big),
            jnp.where(ok, jnp.min(sy, 1) - ppad, -big),
            jnp.where(ok, jnp.max(sy, 1) + ppad, big),
        )

    v0 = packed.tri_v0.T
    v1 = v0 + packed.tri_e1.T
    v2 = v0 + packed.tri_e2.T
    tri_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    c = packed.sph_origin.T
    r = packed.sph_radius[0][:, None]
    return box_of_aabb(tri_lo, tri_hi), box_of_aabb(c - r, c + r)


def _pad_box(box, pad):
    x0, x1, y0, y1 = box
    return (x0 - pad, x1 + pad, y0 - pad, y1 + pad)


def _bin_soft(packed, tau_e, camera, *, height, width, k, shadows,
              shadow_k):
    """Tile binning with tau-padded bboxes. Pure jnp (tau_e may be traced);
    the caller stop-gradients the result (culling is a discrete choice).
    The camera contributes its origin offset (o0.xy): tile rects shift into
    world coordinates so the shard_map camera-shift trick bins correctly
    per row shard."""
    projective = camera.normalize
    offs = None if projective else (camera.o0[0], camera.o0[1])
    nty = _round_up(height, TILE_H) // TILE_H
    ntx = _round_up(width, TILE_W) // TILE_W
    n_tiles = nty * ntx
    n_lights = packed.lights.position.shape[0]
    pad = SOFT_CULL_SIGMAS * tau_e
    if projective:
        tri_box, sph_box = _pinhole_bboxes_soft(packed, camera, pad)
    else:
        tri_box, sph_box = _prim_bboxes(packed)
        tri_box = _pad_box(tri_box, pad)
        sph_box = _pad_box(sph_box, pad)

    # k values rounded to the loop granularity (CH rows per chunk x the
    # unroll factor; _bin_prims pads columns past the primitive count)
    kg = CH * _UNROLL
    k_tri = (
        _round_up(min(k, _round_up(packed.n_tris, CH)), kg)
        if packed.n_tris else 0
    )
    k_sph = (
        _round_up(min(k, _round_up(packed.n_spheres, CH)), kg)
        if packed.n_spheres else 0
    )
    overflow = jnp.zeros((), bool)
    zero_cnt = jnp.zeros((n_tiles,), jnp.int32)
    if k_tri:
        t_idx, t_valid, cnt_tri, over = _bin_prims(
            tri_box, packed.n_tris, nty, ntx, k_tri, offs=offs
        )
        overflow |= over
    else:
        t_idx = jnp.zeros((n_tiles, CH), jnp.int32)
        t_valid = jnp.zeros((n_tiles, CH), bool)
        cnt_tri = zero_cnt
    if k_sph:
        s_idx, s_valid, cnt_sph, over = _bin_prims(
            sph_box, packed.n_spheres, nty, ntx, k_sph, offs=offs
        )
        overflow |= over
    else:
        s_idx = jnp.zeros((n_tiles, CH), jnp.int32)
        s_valid = jnp.zeros((n_tiles, CH), bool)
        cnt_sph = zero_cnt

    # Pinhole shadow rays fan out from hit points anywhere in the tile's
    # view frustum toward the light; no screen-space corridor bounds the
    # occluder set, so projective shadow candidates are the FULL primitive
    # set (one shared table, see _gather_soft_tables).
    if projective:
        k_sh_tri = (
            _round_up(packed.padded_tris, kg)
            if (shadows and packed.n_tris) else 0
        )
        k_sh_sph = (
            _round_up(packed.padded_spheres, kg)
            if (shadows and packed.n_spheres) else 0
        )
    else:
        k_sh_tri = (
            _round_up(min(shadow_k, _round_up(packed.n_tris, CH)), kg)
            if (shadows and packed.n_tris) else 0
        )
        k_sh_sph = (
            _round_up(min(shadow_k, _round_up(packed.n_spheres, CH)), kg)
            if (shadows and packed.n_spheres) else 0
        )
    lpos = packed.lights.position

    # z inputs of the segment-hull shadow culling: soft pad = the sigmoid
    # tail width (the t-gates extend the segment by ~4 tau_g, well inside
    # the SOFT_CULL_SIGMAS pad) + the shadow-ray origin offset. tile_z is
    # the PER-TILE hit-z slab over the primary candidates (round 5): the
    # softmin t is a convex combination of candidate hits (null slots
    # carry exactly zero weight), so per-tile hit z stays inside the
    # candidates' padded z hull.
    from opencl_ray_tracer_tpu.kernels.fwd_tiled import (
        _prim_z_extents,
        _tile_hit_z,
    )

    z_pad = pad + SHADOW_OFFSET
    tri_zext, sph_zext = _prim_z_extents(packed, z_pad)
    tile_z = _tile_hit_z(
        t_idx, t_valid, s_idx, s_valid, tri_zext, sph_zext, nty, ntx
    )

    def bin_sh(box, n_real, ksh, prim_z):
        idxs, valids, cnts = [], [], []
        over = jnp.zeros((), bool)
        for li in range(n_lights):
            i_, v_, c_, o_ = _bin_prims(
                box, n_real, nty, ntx, ksh,
                light_xy=(lpos[li, 0], lpos[li, 1]), offs=offs,
                light_z=lpos[li, 2], prim_z=prim_z, tile_z=tile_z,
            )
            idxs.append(i_)
            valids.append(v_)
            cnts.append(c_)
            over |= o_
        return jnp.stack(idxs), jnp.stack(valids), jnp.stack(cnts), over

    # per-(light, tile) shadow candidate counts: the kernels cond-skip
    # candidate chunks past the count (candidates are compacted to the
    # front by _bin_prims' top_k), so a tile pays for what its corridors
    # actually contain, not for the static-K worst case.
    sh_cnt_tri = jnp.zeros((n_lights, n_tiles), jnp.int32)
    sh_cnt_sph = jnp.zeros((n_lights, n_tiles), jnp.int32)
    if k_sh_tri and not projective:
        tsh_idx, tsh_valid, sh_cnt_tri, over = bin_sh(
            tri_box, packed.n_tris, k_sh_tri, tri_zext
        )
        overflow |= over
    else:
        tsh_idx = jnp.zeros((n_lights, n_tiles, CH), jnp.int32)
        tsh_valid = jnp.zeros((n_lights, n_tiles, CH), bool)
        if k_sh_tri:  # projective: full shared list, every slot live
            sh_cnt_tri = jnp.full(
                (n_lights, n_tiles), packed.n_tris, jnp.int32
            )
    if k_sh_sph and not projective:
        ssh_idx, ssh_valid, sh_cnt_sph, over = bin_sh(
            sph_box, packed.n_spheres, k_sh_sph, sph_zext
        )
        overflow |= over
    else:
        ssh_idx = jnp.zeros((n_lights, n_tiles, CH), jnp.int32)
        ssh_valid = jnp.zeros((n_lights, n_tiles, CH), bool)
        if k_sh_sph:
            sh_cnt_sph = jnp.full(
                (n_lights, n_tiles), packed.n_spheres, jnp.int32
            )

    # counts layout: [tri, sph, (sh_tri, sh_sph) per light] — the kernels'
    # SMEM ragged-skip table (same shape idea as fwd_tiled's).
    cols = [cnt_tri, cnt_sph]
    for li in range(n_lights):
        cols += [sh_cnt_tri[li], sh_cnt_sph[li]]
    return SoftBins(
        t_idx=t_idx, t_valid=t_valid, s_idx=s_idx, s_valid=s_valid,
        tsh_idx=tsh_idx, tsh_valid=tsh_valid,
        ssh_idx=ssh_idx, ssh_valid=ssh_valid,
        counts=jnp.stack(cols, axis=1),
        overflow=overflow,
        k_tri=k_tri, k_sph=k_sph, k_sh_tri=k_sh_tri, k_sh_sph=k_sh_sph,
        nty=nty, ntx=ntx, projective=projective,
    )


# Null rows force cov == 0 EXACTLY (exp underflow), so a masked slot
# contributes nothing to the image or the gradients — static-K masked loops
# therefore equal ragged skipping bit-for-bit.
_NULL_TRI16 = np.array(
    [-1e9, 0, 0, 0, 0, 0, 0, 0, 0, 1.0, 1.0, 1.0, 0, 0, 0, 0], np.float32
)  # u = -1e9 -> sigmoid(-1e9) == 0
_NULL_SPH16 = np.array(
    [-1e9, 0, 0, 1e18, 0, 0, 0, 0, 0, 0, 1.0, 0, 0, 0, 1e9, 1.0], np.float32
)  # tca < 0 and margin = (0 - 1e18) -> both sigmoids 0
_NULL_TSH16 = np.zeros((16,), np.float32)  # zero verts -> det 0 -> cov 0
# projective nulls: det == 0 fails |det| >= eps*|d|; tca = -1e9 kills the
# sphere's facing sigmoid exactly (margin may saturate to 1; the product
# still underflows to 0).
_NULL_TRI16_PROJ = np.zeros((16,), np.float32)
_NULL_SPH16_PROJ = np.array(
    [-1e9, 0, 0, 0, 0, 1.0, 0, 0, 0, 1e9, 1.0, 0, 0, 0, 0, 0], np.float32
)
_NULL_SSH16 = np.array(
    [0, 0, 1e9, 0, 1.0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], np.float32
)  # far occluder, r2 = 0


def _gather_soft_tables(packed, camera, tau_e, bins: SoftBins):
    """Per-frame per-tile candidate tables. Pure jnp and differentiable —
    its jax.vjp scatter-adds per-tile gradient tables back onto the
    PackedScene / Camera / tau_e inputs.

    Shared-direction (ortho) rows:
    tri16:       [u0,ux,uy, v0,vx,vy, t0,tx,ty, itu,itv,itw, 0 x4]
                 (affine Möller–Trumbore + sigmoid scales s/tau_e)
    tri_alb8:    [r,g,b, n(pre-flipped vs shared dir), 0,0]
    sph16:       [tca0,tcax,tcay, d20,d2x,d2y,d2xx,d2yy,d2xy, r2,
                  inv2r, rinv, cx,cy,cz, twor]

    Shared-origin (pinhole, bins.projective) rows:
    tri16:       [det0,detx,dety, un0,unx,uny, vn0,vnx,vny, tnum,
                  itu,itv,itw, n(3) UNflipped (flip is per-pixel)]
    sph16:       [tc0,tcx,tcy, l2, r2, inv2r, rinv, cx,cy,cz, twor, 0 x5]
    and the shadow tables are the FULL primitive set shared by every tile
    (leading dim 1).

    Common:
    sph_alb8:    [r,g,b, 0 x5]
    tri_sh16:    [v0(3), e1(3), e2(3), itu,itv,itw, 0 x4]  (geometric)
    sph_sh16:    [cx,cy,cz, r2, inv2r, twor, 0 x10]
    """
    from opencl_ray_tracer_tpu.kernels.soft import (
        _safe_norm_rows,
        _safe_unit_rows,
    )

    from opencl_ray_tracer_tpu.kernels.fwd_tiled import (
        _prep_projective_coefs,
    )

    projective = bins.projective
    e1t, e2t = packed.tri_e1.T, packed.tri_e2.T
    s1 = _safe_norm_rows(e1t)
    s2 = _safe_norm_rows(e2t)
    itu = jnp.maximum(s1, 1e-6) / tau_e
    itv = jnp.maximum(s2, 1e-6) / tau_e
    itw = jnp.maximum(0.5 * (s1 + s2), 1e-6) / tau_e
    tp_ = packed.padded_tris
    sp_ = packed.padded_spheres
    n = _safe_unit_rows(jnp.cross(e1t, e2t))

    r = packed.sph_radius[0]
    twor = jnp.maximum(2.0 * r, 1e-6)
    inv2r = 1.0 / twor
    rinv = jnp.where(r > 0, 1.0 / jnp.where(r > 0, r, 1.0), 0.0)

    if projective:
        tri10, sph5 = _prep_projective_coefs(packed, camera)
        tri16 = jnp.concatenate(
            [tri10, itu[None], itv[None], itw[None], n.T], axis=0
        ).T  # (Tp, 16): normals UNflipped — flip is per-pixel in-kernel
        tri_alb8 = jnp.concatenate(
            [packed.tri_colour.T[:, :3], jnp.zeros((tp_, 5))], axis=1
        )
        sph16 = jnp.concatenate(
            [
                sph5, inv2r[None], rinv[None], packed.sph_origin,
                twor[None], jnp.zeros((5, sp_)),
            ],
            axis=0,
        ).T  # (Sp, 16)
    else:
        tri9, sph10 = _prep_affine_coefs(packed, camera)
        tri16 = jnp.concatenate(
            [tri9, itu[None], itv[None], itw[None], jnp.zeros((4, tp_))],
            axis=0,
        ).T  # (Tp, 16)
        d0 = camera.d0
        fl = jnp.where(jnp.sum(n * d0, -1) > 0, -1.0, 1.0)[:, None]
        tri_alb8 = jnp.concatenate(
            [packed.tri_colour.T[:, :3], n * fl, jnp.zeros((tp_, 2))], axis=1
        )
        sph16 = jnp.concatenate(
            [
                sph10, inv2r[None], rinv[None], packed.sph_origin,
                twor[None], jnp.zeros((0, sp_)),
            ],
            axis=0,
        ).T  # (Sp, 16)
    sph_alb8 = jnp.concatenate(
        [packed.sph_colour.T[:, :3], jnp.zeros((sp_, 5))], axis=1
    )

    tri_sh16 = jnp.concatenate(
        [
            packed.tri_v0, packed.tri_e1, packed.tri_e2,
            itu[None], itv[None], itw[None], jnp.zeros((4, tp_)),
        ],
        axis=0,
    ).T
    sph_sh16 = jnp.concatenate(
        [
            packed.sph_origin, (r * r)[None], inv2r[None], twor[None],
            jnp.zeros((10, sp_)),
        ],
        axis=0,
    ).T

    def gather(rows, idx, valid, null):
        g = rows[idx]
        return jnp.where(valid[..., None], g, null)

    null_tri = _NULL_TRI16_PROJ if projective else _NULL_TRI16
    null_sph = _NULL_SPH16_PROJ if projective else _NULL_SPH16
    tri_t = gather(tri16, bins.t_idx, bins.t_valid, null_tri)
    tri_alb_t = gather(tri_alb8, bins.t_idx, bins.t_valid, 0.0)
    sph_t = gather(sph16, bins.s_idx, bins.s_valid, null_sph)
    sph_alb_t = gather(sph_alb8, bins.s_idx, bins.s_valid, 0.0)
    n_lights = packed.lights.position.shape[0]
    if projective:
        # full shared shadow lists, one table used by every tile (the
        # kernels pin the shadow block specs to block 0)
        real_t = (jnp.arange(tp_) < packed.n_tris)[:, None]
        real_s = (jnp.arange(sp_) < packed.n_spheres)[:, None]
        tsh_rows = jnp.where(real_t, tri_sh16, _NULL_TSH16)
        ssh_rows = jnp.where(real_s, sph_sh16, _NULL_SSH16)
        kt = max(bins.k_sh_tri, CH)
        ks = max(bins.k_sh_sph, CH)

        def pad_rows(rows, kk, null):
            if rows.shape[0] >= kk:
                return rows[:kk]
            extra = jnp.broadcast_to(null, (kk - rows.shape[0], 16))
            return jnp.concatenate([rows, extra], axis=0)

        tsh_rows = pad_rows(tsh_rows, kt, _NULL_TSH16)
        ssh_rows = pad_rows(ssh_rows, ks, _NULL_SSH16)
        tsh_t = jnp.broadcast_to(
            tsh_rows[None], (n_lights, kt, 16)
        ).reshape(1, n_lights * kt, 16)
        ssh_t = jnp.broadcast_to(
            ssh_rows[None], (n_lights, ks, 16)
        ).reshape(1, n_lights * ks, 16)
    else:
        tsh_t = jnp.concatenate(
            [
                gather(
                    tri_sh16, bins.tsh_idx[li], bins.tsh_valid[li],
                    _NULL_TSH16,
                )
                for li in range(n_lights)
            ],
            axis=1,
        )  # (n_tiles, L*k_sh_tri, 16)
        ssh_t = jnp.concatenate(
            [
                gather(
                    sph_sh16, bins.ssh_idx[li], bins.ssh_valid[li],
                    _NULL_SSH16,
                )
                for li in range(n_lights)
            ],
            axis=1,
        )
    return tri_t, tri_alb_t, sph_t, sph_alb_t, tsh_t, ssh_t


# ---------------------------------------------------------------------------
# The pure tile math (transposed layout) — ONE set of test/shade functions
# shared by the fwd streaming kernel, the fwd recompute inside the bwd
# kernel, and the per-chunk vjps of the decomposed backward. Every traced
# value the tests read flows through an EXPLICIT ctx pytree so jax.vjp can
# route gradients back to camera/light params and the taus (a closure
# would silently treat them as constants).
# ---------------------------------------------------------------------------


def _ctx_make(pv, tau_d, tau_e, x, y, *, projective: bool, n_lights: int):
    """Per-strip shared context: ray bundles, quadratic pixel terms, light/
    shading scalars, temperatures. A plain dict pytree — vjp-able."""
    o = tuple(
        pv[_P_O0 + q] + x * pv[_P_DOX + q] + y * pv[_P_DOY + q]
        for q in range(3)
    )
    if projective:
        du = tuple(
            pv[_P_D0 + q] + x * pv[_P_DDX + q] + y * pv[_P_DDY + q]
            for q in range(3)
        )
        len2 = jnp.maximum(
            du[0] * du[0] + du[1] * du[1] + du[2] * du[2], 1e-20
        )
        inv_len = jax.lax.rsqrt(len2)
        len_d = len2 * inv_len
        d = tuple(c_ * inv_len for c_ in du)  # unit, (1, tp)
        quad = None
    else:
        d = (pv[_P_D0], pv[_P_D0 + 1], pv[_P_D0 + 2])  # shared-dir scalars
        inv_len = None
        len_d = None
        quad = (x * x, y * y, x * y)  # quadratic sphere terms (ortho)
    lights = tuple(
        (
            (pv[b], pv[b + 1], pv[b + 2]),
            (pv[b + 3], pv[b + 4], pv[b + 5]),
            pv[b + 6],
        )
        for b in (
            _P_LIGHTS + li * _LIGHT_STRIDE for li in range(n_lights)
        )
    )
    return dict(
        o=o, d=d, inv_len=inv_len, len_d=len_d, quad=quad, x=x, y=y,
        ambient=pv[_P_AMBIENT], spec=pv[_P_SPEC], shine=pv[_P_SHINE],
        lights=lights,
        tau_e=tau_e,
        inv_td=1.0 / tau_d,
        inv_te=1.0 / tau_e,
        inv_te6=1.0 / jnp.maximum(tau_e, 1e-6),
    )


# -- candidate tests: tab is one (CH, 16) coefficient slice ------------------
# tri test returns (t, cov, n_or_None): ortho folds the pre-flipped normal
# into the albedo matmul (n is None); projective flips the stored unit
# normal per pixel and returns it for explicit aggregation.

def _tri_test(tab, ctx, projective: bool):
    x, y = ctx["x"], ctx["y"]
    c = lambda q: tab[:, q : q + 1]
    if projective:
        d, len_d = ctx["d"], ctx["len_d"]
        det = c(0) + x * c(1) + y * c(2)
        un = c(3) + x * c(4) + y * c(5)
        vn = c(6) + x * c(7) + y * c(8)
        det_ok = jnp.abs(det) >= EPSILON * len_d
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        u = un * inv_det
        v = vn * inv_det
        t = c(9) * inv_det * len_d
        cov = (
            jax.nn.sigmoid(u * c(10))
            * jax.nn.sigmoid(v * c(11))
            * jax.nn.sigmoid((1.0 - u - v) * c(12))
        )
        cov = jnp.where(det_ok, cov, 0.0)
        n0 = (c(13), c(14), c(15))
        ndotd = n0[0] * d[0] + n0[1] * d[1] + n0[2] * d[2]
        fl = jnp.where(ndotd > 0, -1.0, 1.0)
        return t, cov, (n0[0] * fl, n0[1] * fl, n0[2] * fl)
    u = c(0) + x * c(1) + y * c(2)
    v = c(3) + x * c(4) + y * c(5)
    t = c(6) + x * c(7) + y * c(8)
    cov = (
        jax.nn.sigmoid(u * c(9))
        * jax.nn.sigmoid(v * c(10))
        * jax.nn.sigmoid((1.0 - u - v) * c(11))
    )
    return t, cov, None


def _sph_test(tab, ctx, projective: bool):
    x, y = ctx["x"], ctx["y"]
    o, d = ctx["o"], ctx["d"]
    c = lambda q: tab[:, q : q + 1]
    if projective:
        tca = (c(0) + x * c(1) + y * c(2)) * ctx["inv_len"]
        d2 = c(3) - tca * tca
        r2, inv2r, rinv = c(4), c(5), c(6)
        ctr = (c(7), c(8), c(9))
        twor = c(10)
    else:
        x2, y2, xy = ctx["quad"]
        tca = c(0) + x * c(1) + y * c(2)
        d2 = c(3) + x * c(4) + y * c(5) + x2 * c(6) + y2 * c(7) + xy * c(8)
        r2, inv2r, rinv = c(9), c(10), c(11)
        ctr = (c(12), c(13), c(14))
        twor = c(15)
    margin = (r2 - d2) * inv2r
    cov = (
        jax.nn.sigmoid(margin * ctx["inv_te"])
        * jax.nn.sigmoid(tca * ctx["inv_te6"])
    )
    q_ = r2 - d2
    beta = jnp.maximum(ctx["tau_e"], 1e-3) * twor
    thc = jnp.sqrt(beta * jax.nn.softplus(q_ / beta) + 1e-12)
    t = tca - thc
    nx = (o[0] + t * d[0] - ctr[0]) * rinv
    ny = (o[1] + t * d[1] - ctr[1]) * rinv
    nz = (o[2] + t * d[2] - ctr[2]) * rinv
    return t, cov, (nx, ny, nz)


# -- shadow occluder tests (geometric: per-pixel shadow-ray dirs) ------------

def _tri_sh_test(tab, so, sd, ctx):
    c = lambda q: tab[:, q : q + 1]
    v0 = (c(0), c(1), c(2))
    e1 = (c(3), c(4), c(5))
    e2 = (c(6), c(7), c(8))
    pvx = sd[1] * e2[2] - sd[2] * e2[1]
    pvy = sd[2] * e2[0] - sd[0] * e2[2]
    pvz = sd[0] * e2[1] - sd[1] * e2[0]
    det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
    det_ok = jnp.abs(det) >= EPSILON
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tvx, tvy, tvz = so[0] - v0[0], so[1] - v0[1], so[2] - v0[2]
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1[2] - tvz * e1[1]
    qvy = tvz * e1[0] - tvx * e1[2]
    qvz = tvx * e1[1] - tvy * e1[0]
    v = (sd[0] * qvx + sd[1] * qvy + sd[2] * qvz) * inv_det
    t = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * inv_det
    cov = (
        jax.nn.sigmoid(u * c(9))
        * jax.nn.sigmoid(v * c(10))
        * jax.nn.sigmoid((1.0 - u - v) * c(11))
    )
    cov = jnp.where(det_ok, cov, 0.0)
    return t, cov


def _sph_sh_test(tab, so, sd, ctx):
    c = lambda q: tab[:, q : q + 1]
    lx, ly, lz = c(0) - so[0], c(1) - so[1], c(2) - so[2]
    tca = lx * sd[0] + ly * sd[1] + lz * sd[2]
    d2 = lx * lx + ly * ly + lz * lz - tca * tca
    r2, inv2r, twor = c(3), c(4), c(5)
    margin = (r2 - d2) * inv2r
    cov = (
        jax.nn.sigmoid(margin * ctx["inv_te"])
        * jax.nn.sigmoid(tca * ctx["inv_te6"])
    )
    q_ = r2 - d2
    beta = jnp.maximum(ctx["tau_e"], 1e-3) * twor
    thc = jnp.sqrt(beta * jax.nn.softplus(q_ / beta) + 1e-12)
    t = tca - thc
    return t, cov


def _rank(t, cov, ctx):
    return jnp.where(
        cov > 1e-12,
        -t * ctx["inv_td"] + jnp.log(jnp.clip(cov, 1e-12, 1.0)),
        NEG_BIG,
    )


def _bacc_of(cov):
    return jnp.sum(
        jnp.log1p(-jnp.clip(cov, 0.0, 1.0 - 1e-6)), axis=0, keepdims=True
    )


def _ragged_fori(n_chunks: int, cnt, body, carry):
    """Run body(ci, carry) over exactly the chunks that hold real
    candidates: ci = 0 .. ceil(cnt/CH)-1. EXACT: _bin_prims compacts
    candidates to the front and null slots contribute identically zero to
    the image and every gradient, so skipping == computing.

    Measured motivation (v5e, 100-prim fwd+bwd): the previous per-chunk
    `lax.cond` skips lowered to predicated selects under Mosaic — BOTH
    branches executed, making kernel time linear in the STATIC chunk-slot
    count (~0.9 ms/slot) regardless of per-tile occupancy. A dynamic
    trip-count fori_loop is a real loop: work scales with the tile's actual
    candidate count."""
    if n_chunks == 0:
        return carry
    if _UNROLL == 2 and n_chunks % 2 == 0:
        # chunk PAIRS per iteration: indices 2ci, 2ci+1 are always in
        # range (even static chunk count, n <= n_chunks/2) and a trailing
        # past-the-count chunk is all-null -> exact zero contribution
        n = jnp.minimum((cnt + (2 * CH - 1)) // (2 * CH), n_chunks // 2)

        def body2(ci, c):
            return body(2 * ci + 1, body(2 * ci, c))

        return jax.lax.fori_loop(0, n, body2, carry)
    n = jnp.minimum((cnt + (CH - 1)) // CH, n_chunks)
    return jax.lax.fori_loop(0, n, body, carry)


def _nonagg_shade_sums(alb, ctx, t, n, e, kind, shading, n_lights):
    """Per-chunk shaded colour sums for the per-primitive-shading modes:
    (sr_c, sg_c, sb_c) = sum_i e_i * shade_i. Shared by the streaming fwd
    (streaming e) and the per-chunk bwd vjp (fixed-m e)."""
    o, d = ctx["o"], ctx["d"]
    if shading == "legacy":
        scalar_t = 255.0 - t * (255.0 / LEGACY_FOG_MAX)
        s = _dot_attr(alb, e * scalar_t)  # (8, tp)
        return s[0:1], s[1:2], s[2:3]
    # lambert, no shadows
    px = o[0] + t * d[0]
    py = o[1] + t * d[1]
    pz = o[2] + t * d[2]
    nn = n
    if kind == "tri" and nn is None:
        # ortho: pre-flipped unit normal columns live in the albedo table
        # (projective _tri_test already returned per-pixel flipped normals)
        nn = (alb[:, 3:4], alb[:, 4:5], alb[:, 5:6])
    amb_s = _dot_attr(alb, e) * ctx["ambient"]
    acc_r, acc_g, acc_b = amb_s[0:1], amb_s[1:2], amb_s[2:3]
    for li in range(n_lights):
        lp, lc, lint = ctx["lights"][li]
        tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
        dist = jnp.sqrt(
            jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
        )
        ndotl = jnp.maximum(
            (nn[0] * tlx + nn[1] * tly + nn[2] * tlz) / dist, 0.0
        )
        s = _dot_attr(alb, e * (lint * ndotl))
        acc_r = acc_r + lc[0] * s[0:1]
        acc_g = acc_g + lc[1] * s[1:2]
        acc_b = acc_b + lc[2] * s[2:3]
    return acc_r * 255.0, acc_g * 255.0, acc_b * 255.0


def _aggregate_stream(
    load_tri, load_sph, ctx, cnts,
    *, k_tri: int, k_sph: int, tp: int, projective: bool,
):
    """Streaming softmin pass -> finals (m, z, st, s8, snx, sny, snz, bacc).
    load_tri/load_sph: chunk-index -> ((CH, 16) coef table, (CH, 8) albedo)
    — ref loads at a (possibly traced) chunk index. cnts = (cnt_tri,
    cnt_sph) enables ragged chunk execution (None = static unroll)."""
    zeros1 = jnp.zeros((1, tp), jnp.float32)

    def chunk(kind):
        def upd(ci, carry):
            m, z, st, s8, snx, sny, snz, bacc = carry
            if kind == "tri":
                tab, alb = load_tri(ci)
                t, cov, n = _tri_test(tab, ctx, projective)
            else:
                tab, alb = load_sph(ci)
                t, cov, n = _sph_test(tab, ctx, projective)
            logit = _rank(t, cov, ctx)
            cmax = jnp.max(logit, axis=0, keepdims=True)
            m_new = jnp.maximum(m, cmax)
            scale = jnp.exp(m - m_new)
            e = jnp.exp(logit - m_new)
            z = z * scale + jnp.sum(e, axis=0, keepdims=True)
            st = st * scale + jnp.sum(e * t, axis=0, keepdims=True)
            s8 = s8 * scale + _dot_attr(alb, e)
            if n is not None:
                # per-pixel normals (spheres always; projective tris too)
                snx = snx * scale + jnp.sum(e * n[0], axis=0, keepdims=True)
                sny = sny * scale + jnp.sum(e * n[1], axis=0, keepdims=True)
                snz = snz * scale + jnp.sum(e * n[2], axis=0, keepdims=True)
            else:
                snx, sny, snz = snx * scale, sny * scale, snz * scale
            return (m_new, z, st, s8, snx, sny, snz, bacc + _bacc_of(cov))

        return upd

    carry = (
        jnp.full((1, tp), NEG_BIG, jnp.float32),
        zeros1, zeros1, jnp.zeros((8, tp), jnp.float32),
        zeros1, zeros1, zeros1, zeros1,
    )
    carry = _ragged_fori(k_tri // CH, cnts[0], chunk("tri"), carry)
    carry = _ragged_fori(k_sph // CH, cnts[1], chunk("sph"), carry)
    return carry


def _accumulate_nonagg(
    load_tri, load_sph, ctx, cnts,
    *, k_tri: int, k_sph: int, tp: int, projective: bool, shading: str,
    n_lights: int,
):
    """Streaming pass for the per-primitive-shading modes -> finals
    (m, z, sr, sg, sb, bacc)."""
    zeros1 = jnp.zeros((1, tp), jnp.float32)

    def chunk(kind):
        def upd(ci, carry):
            m, z, sr, sg, sb_, bacc = carry
            if kind == "tri":
                tab, alb = load_tri(ci)
                t, cov, n = _tri_test(tab, ctx, projective)
            else:
                tab, alb = load_sph(ci)
                t, cov, n = _sph_test(tab, ctx, projective)
            logit = _rank(t, cov, ctx)
            cmax = jnp.max(logit, axis=0, keepdims=True)
            m_new = jnp.maximum(m, cmax)
            scale = jnp.exp(m - m_new)
            e = jnp.exp(logit - m_new)
            z = z * scale + jnp.sum(e, axis=0, keepdims=True)
            cr, cg, cb = _nonagg_shade_sums(
                alb, ctx, t, n, e, kind, shading, n_lights
            )
            return (
                m_new, z,
                sr * scale + cr, sg * scale + cg, sb_ * scale + cb,
                bacc + _bacc_of(cov),
            )

        return upd

    carry = (
        jnp.full((1, tp), NEG_BIG, jnp.float32),
        zeros1, zeros1, zeros1, zeros1, zeros1,
    )
    carry = _ragged_fori(k_tri // CH, cnts[0], chunk("tri"), carry)
    carry = _ragged_fori(k_sph // CH, cnts[1], chunk("sph"), carry)
    return carry


# -- per-chunk contributions AGAINST THE FINAL max m --------------------------
# Streaming-with-rescaling equals summing per-chunk contributions computed
# against the final running max (every term ends up scaled by exp(-m)), so
# the decomposed backward vjp's these per chunk with m held constant — and
# because the outputs depend on the finals only through m-invariant ratios
# (st/z, s8/z, ...; bacc has no m), the gradient path through m is
# identically zero and dropping it is EXACT (the flash-attention bwd trick).

def _chunk_contrib_agg(tab, alb, ctx, m, kind, projective: bool):
    t, cov, n = (_tri_test if kind == "tri" else _sph_test)(
        tab, ctx, projective
    )
    e = jnp.exp(_rank(t, cov, ctx) - m)
    z_c = jnp.sum(e, axis=0, keepdims=True)
    st_c = jnp.sum(e * t, axis=0, keepdims=True)
    s8_c = _dot_attr(alb, e)
    if n is not None:
        snx_c = jnp.sum(e * n[0], axis=0, keepdims=True)
        sny_c = jnp.sum(e * n[1], axis=0, keepdims=True)
        snz_c = jnp.sum(e * n[2], axis=0, keepdims=True)
    else:
        snx_c = sny_c = snz_c = jnp.zeros_like(z_c)
    return (z_c, st_c, s8_c, snx_c, sny_c, snz_c, _bacc_of(cov))


def _chunk_contrib_nonagg(
    tab, alb, ctx, m, kind, projective: bool, shading: str, n_lights: int
):
    t, cov, n = (_tri_test if kind == "tri" else _sph_test)(
        tab, ctx, projective
    )
    e = jnp.exp(_rank(t, cov, ctx) - m)
    z_c = jnp.sum(e, axis=0, keepdims=True)
    cr, cg, cb = _nonagg_shade_sums(alb, ctx, t, n, e, kind, shading, n_lights)
    return (z_c, cr, cg, cb, _bacc_of(cov))


def _occ_contrib(tab, so, sd, dist, ctx, kind):
    """One occluder chunk's log-visibility contribution (1, tp)."""
    t2, cov2 = (_tri_sh_test if kind == "tri" else _sph_sh_test)(
        tab, so, sd, ctx
    )
    tau_g = jnp.maximum(ctx["tau_e"], 1e-4)
    shift = jnp.maximum(SHADOW_T_MIN, 4.0 * tau_g)
    occ = (
        cov2
        * jax.nn.sigmoid((t2 - shift) / tau_g)
        * jax.nn.sigmoid((dist - t2) / tau_g)
    )
    return jnp.sum(
        jnp.log1p(-jnp.clip(occ, 0.0, 1.0 - 1e-6)), axis=0, keepdims=True
    )


def _occ_loop(
    load_tri_sh, load_sph_sh, so, sd, dist, ctx, sh_cnts,
    *, li: int, k_sh_tri: int, k_sh_sph: int, tp: int,
):
    """Ragged occluder accumulation for one light -> logvis (1, tp).
    load_tri_sh/load_sph_sh: (light, chunk-index) -> (CH, 16) table."""
    logvis = jnp.zeros((1, tp), jnp.float32)

    def tri_upd(ci, lv):
        return lv + _occ_contrib(load_tri_sh(li, ci), so, sd, dist, ctx, "tri")

    def sph_upd(ci, lv):
        return lv + _occ_contrib(load_sph_sh(li, ci), so, sd, dist, ctx, "sph")

    logvis = _ragged_fori(k_sh_tri // CH, sh_cnts[0], tri_upd, logvis)
    logvis = _ragged_fori(k_sh_sph // CH, sh_cnts[1], sph_upd, logvis)
    return logvis


# The candidate/occluder chunk phases put primitives on SUBLANES and
# pixels on LANES — full (CH, tp) VPU width. The per-pixel phases (geom,
# shade) have no primitive axis: computed on (1, tp) vectors they occupy
# ONE sublane of each vreg (1/8 VPU width). Refolding (1, tp) ->
# (_FOLD, tp/_FOLD) is a row-major reshape (same bytes) that fills all
# sublanes — the hard kernel's fold trick (fwd.py) applied to the soft
# shading-side phases, fwd AND (via their vjps) bwd.
_FOLD = 8


def _px_folding(tp: int):
    """(fold, unfold) pair for (1, tp) per-pixel rows; identity when tp
    doesn't split across sublanes.

    Mosaic constraints shape every piece of this:
    - the (1, tp) <-> (_FOLD, tp/_FOLD) shape cast is rejected outright
      ("infer-vector-layout: unsupported shape cast"),
    - fold = lane-slices + sublane concat compiles (the hard kernel's
      trick), but its AUTODIFF transpose emits lane-offset pads Mosaic
      can't lower ("result/input offset mismatch on non-concat dim"),
    - row extraction for unfold must use sublane-masked SUMS, not
      a[q:q+1] slices — a sliced row keeps its sublane offset q and
      cannot be lane-concatenated.
    So fold/unfold are a custom_vjp PAIR: each one's backward is the
    other's (supported) forward, and JAX never emits the unsupported
    transposes."""
    if tp % _FOLD:
        ident = lambda a: a
        return ident, ident
    tpf = tp // _FOLD

    def fold_raw(a):
        return jnp.concatenate(
            [a[:, q * tpf : (q + 1) * tpf] for q in range(_FOLD)], axis=0
        )

    def unfold_raw(a):
        sub = jax.lax.broadcasted_iota(jnp.int32, (_FOLD, tpf), 0)
        rows = [
            jnp.sum(jnp.where(sub == q, a, 0.0), axis=0, keepdims=True)
            for q in range(_FOLD)
        ]
        return jnp.concatenate(rows, axis=1)

    @jax.custom_vjp
    def fold_op(a):
        return fold_raw(a)

    fold_op.defvjp(
        lambda a: (fold_raw(a), None), lambda _, g: (unfold_raw(g),)
    )

    @jax.custom_vjp
    def unfold_op(a):
        return unfold_raw(a)

    unfold_op.defvjp(
        lambda a: (unfold_raw(a), None), lambda _, g: (fold_raw(g),)
    )

    def fold(a):
        if not (hasattr(a, "ndim") and a.ndim == 2 and a.shape == (1, tp)):
            return a
        return fold_op(a)

    def unfold(a):
        if not (
            hasattr(a, "ndim") and a.ndim == 2 and a.shape == (_FOLD, tpf)
        ):
            return a
        return unfold_op(a)

    return fold, unfold


def _geom_agg(f7, ctx, *, n_lights: int, fold_px: bool = True):
    """Aggregates -> shading geometry: normalized hit attributes, view
    vector, background weight, and per-light shadow-ray frames.
    Internally folded to full VPU width (_px_folding); inputs are (1, tp),
    outputs are FOLDED except the *_u shadow-ray frames (see return)."""
    z, st, s8, snx, sny, snz, bacc = f7
    tp_ = z.shape[1]
    fold, unfold = _px_folding(tp_ if fold_px else 1)
    z, st, snx, sny, snz, bacc = map(fold, (z, st, snx, sny, snz, bacc))
    s8rows = [fold(s8[q : q + 1]) for q in range(6)]
    ctx = dict(
        ctx,
        o=tuple(fold(c) for c in ctx["o"]),
        d=tuple(fold(c) for c in ctx["d"]),
        lights=tuple(
            (tuple(fold(c) for c in lp), lc, lint)
            for lp, lc, lint in ctx["lights"]
        ),
    )
    o, d = ctx["o"], ctx["d"]
    zinv = 1.0 / jnp.maximum(z, 1e-20)
    w_bg = jnp.exp(bacc)
    t_hat = st * zinv
    # tri normal contributions ride s8 rows 3-5 (pre-flipped, constant per
    # prim => foldable into the albedo matmul); sphere normals are
    # per-pixel and accumulate explicitly.
    nx = (s8rows[3] + snx) * zinv
    ny = (s8rows[4] + sny) * zinv
    nz = (s8rows[5] + snz) * zinv
    ninv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
    ar, ag, ab = s8rows[0] * zinv, s8rows[1] * zinv, s8rows[2] * zinv
    px = o[0] + t_hat * d[0]
    py = o[1] + t_hat * d[1]
    pz = o[2] + t_hat * d[2]
    vinv = jax.lax.rsqrt(
        jnp.maximum(d[0] * d[0] + d[1] * d[1] + d[2] * d[2], 1e-20)
    )
    sos, sds, dists = [], [], []
    for li in range(n_lights):
        lp, _, _ = ctx["lights"][li]
        tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
        dist = jnp.sqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20))
        sds.append((tlx / dist, tly / dist, tlz / dist))
        sos.append((
            px + SHADOW_OFFSET * nx,
            py + SHADOW_OFFSET * ny,
            pz + SHADOW_OFFSET * nz,
        ))
        dists.append(dist)
    # FOLDED outputs for the (folded) shade stage; the occluder chunk
    # loops need pixels-on-lanes, so the shadow-ray frames are ALSO
    # returned unfolded (keys *_u) — one unfold of 7 arrays instead of a
    # full-dict unfold + shade-side refold round trip.
    return dict(
        n=(nx, ny, nz),
        a=(ar, ag, ab),
        v=(-d[0] * vinv, -d[1] * vinv, -d[2] * vinv),
        w_bg=w_bg,
        sd=tuple(sds),
        so_u=jax.tree_util.tree_map(unfold, tuple(sos)),
        sd_u=jax.tree_util.tree_map(unfold, tuple(sds)),
        dist_u=jax.tree_util.tree_map(unfold, tuple(dists)),
    )


def _shade_agg(geom, logvis, ctx, *, shading: str, n_lights: int, tp: int,
               fold_px: bool = True):
    """Aggregate-then-shade combine: geometry + per-light log-visibility ->
    (8, tp) output rows [r, g, b, alpha, 0 x4]. geom arrives FOLDED
    (_geom_agg's contract, same fold_px); logvis folds at entry; channels
    unfold at exit."""
    fold, unfold = _px_folding(tp if fold_px else 1)
    if logvis is not None:
        logvis = tuple(fold(lv) for lv in logvis)
    nx, ny, nz = geom["n"]
    ar, ag, ab = geom["a"]
    vx, vy, vz = geom["v"]
    diff_r = diff_g = diff_b = 0.0
    spec_r = spec_g = spec_b = 0.0
    for li in range(n_lights):
        _, lc, lint = ctx["lights"][li]
        ldx, ldy, ldz = geom["sd"][li]
        ndotl = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
        vis = jnp.exp(logvis[li]) if logvis is not None else 1.0
        wd = lint * ndotl * vis
        diff_r = diff_r + wd * lc[0]
        diff_g = diff_g + wd * lc[1]
        diff_b = diff_b + wd * lc[2]
        if shading == "phong":
            two_ndl = 2.0 * (nx * ldx + ny * ldy + nz * ldz)
            rx = two_ndl * nx - ldx
            ry = two_ndl * ny - ldy
            rz = two_ndl * nz - ldz
            rdotv = jnp.maximum(rx * vx + ry * vy + rz * vz, 0.0)
            ws = (
                ctx["spec"]
                * jnp.exp(ctx["shine"] * jnp.log(jnp.maximum(rdotv, 1e-20)))
                * lint
                * vis
                * (ndotl > 0.0)
            )
            spec_r = spec_r + ws * lc[0]
            spec_g = spec_g + ws * lc[1]
            spec_b = spec_b + ws * lc[2]
    fg_r = ar * (ctx["ambient"] + diff_r) + spec_r
    fg_g = ag * (ctx["ambient"] + diff_g) + spec_g
    fg_b = ab * (ctx["ambient"] + diff_b) + spec_b
    one_m_bg = 1.0 - geom["w_bg"]
    return jnp.concatenate(
        [
            unfold(jnp.clip(one_m_bg * fg_r * 255.0, 0.0, 255.0)),
            unfold(jnp.clip(one_m_bg * fg_g * 255.0, 0.0, 255.0)),
            unfold(jnp.clip(one_m_bg * fg_b * 255.0, 0.0, 255.0)),
            jnp.full((1, tp), 255.0, jnp.float32),
            jnp.zeros((4, tp), jnp.float32),
        ],
        axis=0,
    )


def _shade_nonagg(f5, *, shading: str, tp: int, fold_px: bool = True):
    """Per-primitive-shading normalize: finals -> (8, tp) output rows.
    Folded to full VPU width internally (_px_folding)."""
    fold, unfold = _px_folding(tp if fold_px else 1)
    z, sr, sg, sb_, bacc = (fold(a) for a in f5)
    zinv = 1.0 / jnp.maximum(z, 1e-20)
    w_bg = jnp.exp(bacc)
    r_out = (1.0 - w_bg) * sr * zinv
    g_out = (1.0 - w_bg) * sg * zinv
    b_out = (1.0 - w_bg) * sb_ * zinv
    if shading != "legacy":
        r_out = jnp.clip(r_out, 0.0, 255.0)
        g_out = jnp.clip(g_out, 0.0, 255.0)
        b_out = jnp.clip(b_out, 0.0, 255.0)
    return jnp.concatenate(
        [
            unfold(r_out), unfold(g_out), unfold(b_out),
            jnp.full((1, tp), 255.0, jnp.float32),
            jnp.zeros((4, tp), jnp.float32),
        ],
        axis=0,
    )


def _finals_rows(aggregate: bool, n_shadow_lights: int) -> int:
    """Sublane-padded row count of the stored-finals residual block:
    aggregate mode stores [m, z, st, s8 x8, snx, sny, snz, bacc,
    logvis x L]; per-primitive-shading modes store
    [m, z, sr, sg, sb, bacc]."""
    if not aggregate:
        return 8
    return _round_up(15 + n_shadow_lights, 8)


# The stored-finals backward pays one (R, TILE_PIX) residual block of HBM
# traffic per tile to skip the backward's streaming+occluder recompute
# pass. Measured on v5e (1080p phong+shadows, all-grad-leaf step, same
# session A/B): at the 200-prim stress scale (static slots ~432) it wins
# 33.6 -> 28.8 ms; at the 11-prim headline (slots 64) the recompute pass
# is nearly free and the residual I/O costs more than it saves (2.74 ->
# 3.09 ms). The static worst-case slot count picks the regime.
_FINALS_MIN_SLOTS = 128


def _use_stored_finals(bins: "SoftBins", n_lights: int,
                       shadows: bool) -> bool:
    slots = bins.k_tri + bins.k_sph
    if shadows:
        slots += n_lights * (bins.k_sh_tri + bins.k_sh_sph)
    return slots >= _FINALS_MIN_SLOTS


def _tile_soft_T(
    pv, tau_d, tau_e,
    load_tri, load_sph, load_tri_sh, load_sph_sh,
    x, y,
    *,
    k_tri: int,
    k_sph: int,
    k_sh_tri: int,
    k_sh_sph: int,
    n_lights: int,
    shading: str,
    shadows: bool,
    tp: int,
    projective: bool = False,
    counts,
    want_finals: bool = False,
    fold_px: bool = True,
):
    """One SUB_PIX strip of the tiled soft renderer as a pure array function
    — the orchestrator over the shared tile math above.

    counts: (cnt_tri, cnt_sph, ((sh_tri, sh_sph) per light)) int32
    scalars — only the chunks holding real candidates execute
    (dynamic-trip fori_loops; exact, see _ragged_fori).

    want_finals: also return the streaming finals + per-light
    log-visibility as (R, tp) rows (R = _finals_rows) — the residuals the
    stored-finals backward reads instead of recomputing the whole
    streaming pass (fwd row layout documented there).

    x, y: (1, tp) pixel coords. load_*: chunk loaders over the tables of
    _gather_soft_tables (see the kernels below). Returns (8, tp) rows
    [r, g, b, alpha, 0...]. Formulas are kernels/soft.py's _tile_soft_math
    in the transposed layout (primitives on sublanes); diff/soft.py is the
    independent oracle for both.

    projective: shared-origin pinhole camera — d becomes the per-pixel UNIT
    direction (so every downstream use of `d` keeps world-distance t
    semantics), and the candidate tests consume projective coefficients.
    """
    ctx = _ctx_make(
        pv, tau_d, tau_e, x, y, projective=projective, n_lights=n_lights
    )
    cnt_tri, cnt_sph, sh_counts = counts
    cnts = (cnt_tri, cnt_sph)

    aggregate = shading == "phong" or (shadows and shading == "lambert")
    if not aggregate:
        finals = _accumulate_nonagg(
            load_tri, load_sph, ctx, cnts,
            k_tri=k_tri, k_sph=k_sph, tp=tp, projective=projective,
            shading=shading, n_lights=n_lights,
        )
        out = _shade_nonagg(
            finals[1:], shading=shading, tp=tp, fold_px=fold_px
        )
        if not want_finals:
            return out
        fin = jnp.concatenate(
            list(finals) + [jnp.zeros((2, tp), jnp.float32)], axis=0
        )  # [m, z, sr, sg, sb, bacc, 0, 0]
        return out, fin

    finals = _aggregate_stream(
        load_tri, load_sph, ctx, cnts,
        k_tri=k_tri, k_sph=k_sph, tp=tp, projective=projective,
    )
    geom = _geom_agg(finals[1:], ctx, n_lights=n_lights, fold_px=fold_px)
    logvis = None
    if shadows:
        logvis = tuple(
            _occ_loop(
                load_tri_sh, load_sph_sh,
                geom["so_u"][li], geom["sd_u"][li], geom["dist_u"][li],
                ctx, sh_counts[li],
                li=li, k_sh_tri=k_sh_tri, k_sh_sph=k_sh_sph, tp=tp,
            )
            for li in range(n_lights)
        )
    out = _shade_agg(
        geom, logvis, ctx, shading=shading, n_lights=n_lights, tp=tp,
        fold_px=fold_px,
    )
    if not want_finals:
        return out
    # [m, z, st, s8 x8, snx, sny, snz, bacc, logvis x L, pad to R]
    m, z, st, s8, snx, sny, snz, bacc = finals
    rows = [m, z, st, s8, snx, sny, snz, bacc]
    if shadows:
        rows += list(logvis)
    r = _finals_rows(True, n_lights if shadows else 0)
    have = 15 + (n_lights if shadows else 0)
    if r > have:
        rows.append(jnp.zeros((r - have, tp), jnp.float32))
    return out, jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# Kernels + wrappers
# ---------------------------------------------------------------------------

def _chunked(t):
    """(n_tiles, K, w) -> (n_tiles, K//CH, CH, w). A FREE reshape (row-major
    bytes are identical) that exposes whole candidate chunks on an untiled
    leading dim, so kernels can load chunk `ci` at a TRACED index — the
    addressing mode the ragged fori_loops need."""
    n, k, w = t.shape
    return t.reshape(n, k // CH, CH, w)


def _loaders(tt, ta, st_, sa, tsh, ssh, cfg):
    """Chunk loaders over the 4-D table refs for one tile's blocks."""
    nsh_t = cfg["k_sh_tri"] // CH
    nsh_s = cfg["k_sh_sph"] // CH
    return (
        lambda ci: (tt[0, ci], ta[0, ci]),
        lambda ci: (st_[0, ci], sa[0, ci]),
        lambda li, ci: tsh[0, li * nsh_t + ci],
        lambda li, ci: ssh[0, li * nsh_s + ci],
    )


def _tile_xy(i, sb, ntx: int, sub_pix: int):
    """(tile, sub-block) grid ids -> (1, sub_pix) pixel coords."""
    ty = i // ntx
    tx = i - ty * ntx
    x0 = (tx * TILE_W).astype(jnp.float32)
    y0 = (ty * TILE_H).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sub_pix), 1)
    lx = (lane % TILE_W).astype(jnp.float32)
    lrow = (lane // TILE_W).astype(jnp.float32)
    rows_per_sub = sub_pix // TILE_W
    x = x0 + lx
    y = y0 + (sb * rows_per_sub).astype(jnp.float32) + lrow
    return x, y


def _tile_g_layout(g, height, width, nty, ntx):
    """(H, W, 4) cotangent -> (n_tiles, 8, TILE_PIX) tile-major rows."""
    hp, wp = nty * TILE_H, ntx * TILE_W
    g8 = jnp.zeros((8, hp, wp), jnp.float32)
    g8 = g8.at[0:4, :height, :width].set(
        jnp.moveaxis(g.astype(jnp.float32), -1, 0)
    )
    return (
        g8.reshape(8, nty, TILE_H, ntx, TILE_W)
        .transpose(1, 3, 0, 2, 4)
        .reshape(nty * ntx, 8, TILE_PIX)
    )


def _untile(out, height, width, nty, ntx):
    """(n_tiles, 8, TILE_PIX) -> (H, W, 4)."""
    img = (
        out.reshape(nty, ntx, 8, TILE_H, TILE_W)
        .transpose(2, 0, 3, 1, 4)
        .reshape(8, nty * TILE_H, ntx * TILE_W)
    )
    return jnp.moveaxis(img[0:4, :height, :width], 0, -1)


def _soft_tiled_fwd_pallas(
    params, taus, tables, counts, *, width, nty, ntx, cfg, interpret,
    save_finals: bool = False,
):
    """save_finals: also emit the (n_tiles, R, TILE_PIX) streaming-finals
    residual block the stored-finals backward consumes — only the
    custom_vjp fwd asks for it; the plain inference forward stays lean."""
    tri_t, tri_alb, sph_t, sph_alb, tsh_t, ssh_t = tables
    n_params = params.shape[0]
    n_tiles = nty * ntx
    sub = SUB_PIX_FWD
    n_sub = TILE_PIX // sub
    r_fin = _finals_rows(
        cfg["shading"] == "phong"
        or (cfg["shadows"] and cfg["shading"] == "lambert"),
        cfg["n_lights"] if cfg["shadows"] else 0,
    )

    def kernel(inmap_ref, params_ref, taus_ref, counts_ref, tt, ta, st_, sa,
               tsh, ssh, _prefill_ref, *rest):
        if save_finals:
            _res_prefill_ref, out_ref, res_ref = rest
        else:
            (out_ref,) = rest
        # TILE WORKLIST (same design as the hard packed kernel,
        # fwd_tiled.py): the dynamic grid runs only the M nonempty tiles
        # through the prefetched map; empty tiles are never sequenced —
        # their output blocks keep the aliased prefill (the exact
        # background the all-null tile math would produce: rgb=0, a=255,
        # zero aux). ~0.5 us of pure per-step cost for each of the ~900
        # skipped (tile, sub) steps on the sparse 1080p headline.
        i = inmap_ref[pl.program_id(0)]
        sb = pl.program_id(1)
        # Only reachable when M == 0 (grid is clamped to >= 1 step): the
        # visited block must still be written, and the constant IS the
        # correct empty-tile output.
        empty = (counts_ref[i, 0] + counts_ref[i, 1]) == 0

        @pl.when(empty)
        def _():
            out_ref[0] = jnp.concatenate(
                [
                    jnp.zeros((3, sub), jnp.float32),
                    jnp.full((1, sub), 255.0, jnp.float32),
                    jnp.zeros((4, sub), jnp.float32),
                ],
                axis=0,
            )
            if save_finals:
                # the empty-tile finals: m = NEG_BIG, everything else 0
                # (z = 0, bacc = 0 => w_bg = 1) — the exact streaming
                # state of an all-null tile
                res_ref[0] = jnp.concatenate(
                    [
                        jnp.full((1, sub), NEG_BIG, jnp.float32),
                        jnp.zeros((r_fin - 1, sub), jnp.float32),
                    ],
                    axis=0,
                )

        @pl.when(jnp.logical_not(empty))
        def _():
            x, y = _tile_xy(i, sb, ntx, sub)
            pv = tuple(params_ref[q] for q in range(n_params))
            cts = (
                counts_ref[i, 0],
                counts_ref[i, 1],
                tuple(
                    (counts_ref[i, 2 + 2 * li], counts_ref[i, 3 + 2 * li])
                    for li in range(cfg["n_lights"])
                ),
            )
            res = _tile_soft_T(
                pv, taus_ref[0], taus_ref[1],
                *_loaders(tt, ta, st_, sa, tsh, ssh, cfg),
                x, y, counts=cts, want_finals=save_finals, **cfg,
            )
            if save_finals:
                out_ref[0], res_ref[0] = res
            else:
                out_ref[0] = res

    tile4 = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda i, sb, im: (im[i], 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # projective shadow tables are one shared block for every tile
    shared4 = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda i, sb, im: (0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    sh_spec = shared4 if cfg["projective"] else tile4
    tri_t, tri_alb, sph_t, sph_alb, tsh_t, ssh_t = map(
        _chunked, (tri_t, tri_alb, sph_t, sph_alb, tsh_t, ssh_t)
    )

    empty_flag = (counts[:, 0] + counts[:, 1]) == 0
    m = jnp.sum((~empty_flag).astype(jnp.int32))
    inmap = jnp.argsort(empty_flag, stable=True).astype(jnp.int32)
    # the background every empty tile's math would produce, as the aliased
    # prefill for the blocks the worklist never visits
    prefill = jnp.broadcast_to(
        jnp.concatenate(
            [
                jnp.zeros((3, TILE_PIX), jnp.float32),
                jnp.full((1, TILE_PIX), 255.0, jnp.float32),
                jnp.zeros((4, TILE_PIX), jnp.float32),
            ],
            axis=0,
        )[None],
        (n_tiles, 8, TILE_PIX),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        tile4(tri_t.shape),
        tile4(tri_alb.shape),
        tile4(sph_t.shape),
        tile4(sph_alb.shape),
        sh_spec(tsh_t.shape),
        sh_spec(ssh_t.shape),
        pl.BlockSpec(memory_space=pl.ANY),  # prefill, aliased
    ]
    out_spec = pl.BlockSpec(
        (1, 8, sub), lambda i, sb, im: (im[i], 0, sb),
        memory_space=pltpu.VMEM,
    )
    operands = [inmap, params, taus, counts, tri_t, tri_alb, sph_t, sph_alb,
                tsh_t, ssh_t, prefill]
    if save_finals:
        # finals residual output (+ its aliased zero/NEG_BIG prefill for
        # never-visited tiles — the empty-tile streaming state)
        res_prefill = jnp.broadcast_to(
            jnp.concatenate(
                [
                    jnp.full((1, TILE_PIX), NEG_BIG, jnp.float32),
                    jnp.zeros((r_fin - 1, TILE_PIX), jnp.float32),
                ],
                axis=0,
            )[None],
            (n_tiles, r_fin, TILE_PIX),
        )
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(res_prefill)
        out_shape = (
            jax.ShapeDtypeStruct((n_tiles, 8, TILE_PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, r_fin, TILE_PIX), jnp.float32),
        )
        out_specs = (
            out_spec,
            pl.BlockSpec(
                (1, r_fin, sub), lambda i, sb, im: (im[i], 0, sb),
                memory_space=pltpu.VMEM,
            ),
        )
        # operands: inmap(scalar)=0, params=1, taus=2, counts=3, tables
        # 4..9, prefill=10 -> output 0, res_prefill=11 -> output 1
        aliases = {10: 0, 11: 1}
    else:
        out_shape = jax.ShapeDtypeStruct((n_tiles, 8, TILE_PIX), jnp.float32)
        out_specs = out_spec
        aliases = {10: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(jnp.maximum(m, 1), n_sub),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(*operands)
    return out


def _soft_tiled_bwd_pallas(
    params, taus, tables, counts, g_tiles, res_tiles,
    *, width, nty, ntx, cfg, interpret,
):
    """Decomposed, RAGGED backward kernel (hand-structured, the
    flash-attention-bwd shape): per (tile, sub-block) grid step,

      1. rebuild ctx via jax.vjp of _ctx_make (routes grads to params/taus),
      2. obtain the streaming finals (m, z, st, s8, sn, bacc) and
         per-light log-visibility: from the residual block the forward
         kernel stored (res_tiles, the STORED-FINALS regime — skips the
         backward's whole streaming+occluder recompute pass for one
         (R, TILE_PIX) f32 block per tile of HBM traffic), or by
         recomputing the streaming pass in-kernel when res_tiles is None
         (cheaper at small candidate counts — see _use_stored_finals for
         the measured regime split). m is a CONSTANT either way — outputs
         are invariant to it, so its gradient path is identically zero,
      3. jax.vjp the shade and geom stages once (chunk-free),
      4. jax.vjp each candidate / occluder CHUNK inside a dynamic-trip
         fori_loop over exactly the chunks the tile's counts cover (real
         skipping — see _ragged_fori; gradient chunks are accumulated
         straight into the table-grad refs at the traced chunk index, and
         never-visited chunks keep their zero-init, which IS their exact
         gradient),
      5. assemble params/taus rows.

    No cross-chunk residuals exist, so live VMEM stays flat in K and the
    per-chunk work scales with the tile's actual candidate counts.
    Gradient tables land in PER-TILE output blocks accumulated across the
    tile's sub-blocks (init at sb == 0; TPU grids iterate the minor
    dimension innermost and sequentially)."""
    tri_t, tri_alb, sph_t, sph_alb, tsh_t, ssh_t = tables
    n_params = params.shape[0]
    n_tiles = nty * ntx
    sub = SUB_PIX_BWD
    n_sub = TILE_PIX // sub
    cfg = dict(cfg, tp=sub)

    projective = cfg["projective"]
    shading = cfg["shading"]
    shadows = cfg["shadows"]
    n_lights = cfg["n_lights"]
    k_tri, k_sph = cfg["k_tri"], cfg["k_sph"]
    k_sh_tri, k_sh_sph = cfg["k_sh_tri"], cfg["k_sh_sph"]
    fold_px = cfg["fold_px"]
    aggregate = shading == "phong" or (shadows and shading == "lambert")
    use_finals = res_tiles is not None
    r_fin = _finals_rows(aggregate, n_lights if shadows else 0)

    def kernel(inmap_ref, params_ref, taus_ref, counts_ref, tt, ta, st_, sa,
               tsh, ssh, g_ref, *rest):
        if use_finals:
            res_ref, *rest = rest
        else:
            res_ref = None
        # rest = 8 untouched ANY-space zero prefills (aliased to the
        # outputs), then the 8 gradient out refs
        (d_tt, d_ta, d_st, d_sa, d_tsh, d_ssh, d_par, d_tau) = rest[8:]
        # TILE WORKLIST (same design as the fwd kernels): the dynamic grid
        # sequences only the M nonempty tiles; unvisited tiles' gradient
        # blocks keep the aliased ZERO prefill — which IS their exact
        # gradient (the true vjp of the all-null tile math is identically
        # zero: every path goes through sigmoid'(+-1e9) == 0, null
        # albedos, or the (1 - w_bg) == 0 foreground factor).
        i = inmap_ref[pl.program_id(0)]
        sb = pl.program_id(1)
        # Only reachable when M == 0 (clamped 1-step grid): the visited
        # tile's blocks still zero-init below, which is correct.
        empty = (counts_ref[i, 0] + counts_ref[i, 1]) == 0

        @pl.when(sb == 0)
        def _():
            d_tt[0] = jnp.zeros(d_tt.shape[1:], jnp.float32)
            d_ta[0] = jnp.zeros(d_ta.shape[1:], jnp.float32)
            d_st[0] = jnp.zeros(d_st.shape[1:], jnp.float32)
            d_sa[0] = jnp.zeros(d_sa.shape[1:], jnp.float32)
            d_par[0] = jnp.zeros(d_par.shape[1:], jnp.float32)
            d_tau[0] = jnp.zeros(d_tau.shape[1:], jnp.float32)

        # projective shadow-grad blocks are SHARED by all tiles (block 0):
        # init once at the very first VISITED grid step, accumulate across
        # all (keyed on the step index, not the tile id — with the
        # worklist the first visited tile need not be tile 0).
        sh_init = (
            ((pl.program_id(0) == 0) & (sb == 0)) if projective
            else (sb == 0)
        )

        @pl.when(sh_init)
        def _():
            d_tsh[0] = jnp.zeros(d_tsh.shape[1:], jnp.float32)
            d_ssh[0] = jnp.zeros(d_ssh.shape[1:], jnp.float32)

        @pl.when(jnp.logical_not(empty))
        def _():
            x, y = _tile_xy(i, sb, ntx, sub)
            pv = tuple(params_ref[q] for q in range(n_params))
            td, te = taus_ref[0], taus_ref[1]
            cnt_tri = counts_ref[i, 0]
            cnt_sph = counts_ref[i, 1]
            sh_counts = tuple(
                (counts_ref[i, 2 + 2 * li], counts_ref[i, 3 + 2 * li])
                for li in range(n_lights)
            )
            g = g_ref[0]
            load_tri, load_sph, load_tri_sh, load_sph_sh = _loaders(
                tt, ta, st_, sa, tsh, ssh, cfg
            )
            nsh_t, nsh_s = k_sh_tri // CH, k_sh_sph // CH

            tree_add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)

            ctx, builder_vjp = jax.vjp(
                lambda pv_, td_, te_: _ctx_make(
                    pv_, td_, te_, x, y,
                    projective=projective, n_lights=n_lights,
                ),
                pv, td, te,
            )
            gctx_zero = jax.tree_util.tree_map(jnp.zeros_like, ctx)

            # Pixel-coordinate-derived ctx entries (x, y, quad) are
            # CONSTANTS in-kernel (pure functions of the grid indices, no
            # parameter dependence). The per-chunk vjps close over them
            # instead of differentiating them, so every chunk loop skips
            # computing AND loop-carrying their cotangents (the affine
            # tests would otherwise emit per-chunk gx/gy reduction sums
            # whose results builder_vjp discards anyway).
            _const_keys = ("x", "y", "quad")
            ctx_const = {q: ctx[q] for q in _const_keys}
            ctx_diff = {q: v for q, v in ctx.items() if q not in _const_keys}

            def with_const(cd):
                return {**cd, **ctx_const}

            def split_ctx(c):
                return (
                    {q: v for q, v in c.items() if q not in _const_keys},
                    {q: c[q] for q in _const_keys},
                )

            # finals: stored (exact values the fwd kernel computed — no
            # streaming/occluder recompute pass) or recomputed in-kernel
            fin = res_ref[0] if use_finals else None
            if aggregate:
                if use_finals:
                    m = fin[0:1]
                    f7 = (
                        fin[1:2], fin[2:3], fin[3:11],
                        fin[11:12], fin[12:13], fin[13:14], fin[14:15],
                    )  # (z, st, s8, snx, sny, snz, bacc)
                else:
                    finals = _aggregate_stream(
                        load_tri, load_sph, ctx, (cnt_tri, cnt_sph),
                        k_tri=k_tri, k_sph=k_sph, tp=sub,
                        projective=projective,
                    )
                    m = jax.lax.stop_gradient(finals[0])
                    f7 = jax.lax.stop_gradient(finals[1:])
                geom, geom_vjp = jax.vjp(
                    lambda f, c: _geom_agg(
                        f, c, n_lights=n_lights, fold_px=fold_px
                    ),
                    f7, ctx,
                )
                logvis = None
                if shadows:
                    if use_finals:
                        logvis = tuple(
                            fin[15 + li : 16 + li] for li in range(n_lights)
                        )
                    else:
                        logvis = tuple(
                            _occ_loop(
                                load_tri_sh, load_sph_sh,
                                geom["so_u"][li], geom["sd_u"][li],
                                geom["dist_u"][li], ctx, sh_counts[li],
                                li=li, k_sh_tri=k_sh_tri, k_sh_sph=k_sh_sph,
                                tp=sub,
                            )
                            for li in range(n_lights)
                        )
                _, shade_vjp = jax.vjp(
                    lambda gm, lv, c: _shade_agg(
                        gm, lv, c, shading=shading, n_lights=n_lights,
                        tp=sub, fold_px=fold_px,
                    ),
                    geom, logvis, ctx,
                )
                g_geom, g_logvis, gctx_full = shade_vjp(g)
                gctx, gctx_const = split_ctx(gctx_full)

                # ---- occluder chunks (ragged vjps, grads -> refs) -------
                if shadows:
                    zero3 = lambda: tuple(
                        jnp.zeros((1, sub), jnp.float32) for _ in range(3)
                    )
                    g_so, g_sd, g_dist = [], [], []
                    for li in range(n_lights):
                        glv = g_logvis[li]
                        so = geom["so_u"][li]
                        sd = geom["sd_u"][li]
                        dist = geom["dist_u"][li]

                        def occ_body(kind, li=li, glv=glv, so=so, sd=sd,
                                     dist=dist):
                            load = (load_tri_sh if kind == "tri"
                                    else load_sph_sh)
                            dref = d_tsh if kind == "tri" else d_ssh
                            nsh = nsh_t if kind == "tri" else nsh_s

                            def body(ci, acc):
                                gctx_a, gso_a, gsd_a, gdist_a = acc
                                tab = load(li, ci)
                                _, vjp = jax.vjp(
                                    lambda t5, s5, d5, q5, c5: _occ_contrib(
                                        t5, s5, d5, q5, with_const(c5), kind
                                    ),
                                    tab, so, sd, dist, ctx_diff,
                                )
                                gtb, gso_c, gsd_c, gdist_c, gctx_c = vjp(glv)
                                dref[0, li * nsh + ci] += gtb
                                return (
                                    tree_add(gctx_a, gctx_c),
                                    tuple(a + b for a, b in zip(gso_a, gso_c)),
                                    tuple(a + b for a, b in zip(gsd_a, gsd_c)),
                                    gdist_a + gdist_c,
                                )

                            return body

                        acc = (gctx, zero3(), zero3(),
                               jnp.zeros((1, sub), jnp.float32))
                        acc = _ragged_fori(
                            nsh_t, sh_counts[li][0], occ_body("tri"), acc
                        )
                        acc = _ragged_fori(
                            nsh_s, sh_counts[li][1], occ_body("sph"), acc
                        )
                        gctx, gso_li, gsd_li, gdist_li = acc
                        g_so.append(gso_li)
                        g_sd.append(gsd_li)
                        g_dist.append(gdist_li)

                    # fold occluder so/sd/dist cotangents into g_geom's
                    # unfolded *_u slots (shade's own cotangents ride the
                    # folded keys; _geom_agg's vjp merges both paths)
                    g_geom = dict(
                        g_geom,
                        so_u=tuple(
                            tuple(a + b for a, b in zip(g_geom["so_u"][li],
                                                        g_so[li]))
                            for li in range(n_lights)
                        ),
                        sd_u=tuple(
                            tuple(a + b for a, b in zip(g_geom["sd_u"][li],
                                                        g_sd[li]))
                            for li in range(n_lights)
                        ),
                        dist_u=tuple(
                            g_geom["dist_u"][li] + g_dist[li]
                            for li in range(n_lights)
                        ),
                    )

                g_f7, gctx_c = geom_vjp(g_geom)
                gd_c, gconst_c = split_ctx(gctx_c)
                gctx = tree_add(gctx, gd_c)
                gctx_const = tree_add(gctx_const, gconst_c)
                cot = g_f7  # cotangents for (z, st, s8, snx, sny, snz, bacc)

                def contrib(kind):
                    return lambda tb, al, cd: _chunk_contrib_agg(
                        tb, al, with_const(cd), m, kind, projective
                    )
            else:
                if use_finals:
                    m = fin[0:1]
                    f5 = (
                        fin[1:2], fin[2:3], fin[3:4], fin[4:5], fin[5:6]
                    )  # (z, sr, sg, sb, bacc)
                else:
                    finals = _accumulate_nonagg(
                        load_tri, load_sph, ctx, (cnt_tri, cnt_sph),
                        k_tri=k_tri, k_sph=k_sph, tp=sub,
                        projective=projective, shading=shading,
                        n_lights=n_lights,
                    )
                    m = jax.lax.stop_gradient(finals[0])
                    f5 = jax.lax.stop_gradient(finals[1:])
                _, shade_vjp = jax.vjp(
                    lambda f: _shade_nonagg(
                        f, shading=shading, tp=sub, fold_px=fold_px
                    ),
                    f5,
                )
                (cot,) = shade_vjp(g)
                gctx, gctx_const = split_ctx(gctx_zero)

                def contrib(kind):
                    return lambda tb, al, cd: _chunk_contrib_nonagg(
                        tb, al, with_const(cd), m, kind, projective, shading,
                        n_lights,
                    )

            # ---- candidate chunks (ragged vjps, grads -> refs) ----------
            def cand_body(kind):
                load = load_tri if kind == "tri" else load_sph
                dref_t = d_tt if kind == "tri" else d_st
                dref_a = d_ta if kind == "tri" else d_sa

                def body(ci, gctx_a):
                    tab, alb = load(ci)
                    _, vjp = jax.vjp(contrib(kind), tab, alb, ctx_diff)
                    gtb, gal, gctx_c = vjp(cot)
                    dref_t[0, ci] += gtb
                    dref_a[0, ci] += gal
                    return tree_add(gctx_a, gctx_c)

                return body

            gctx = _ragged_fori(k_tri // CH, cnt_tri, cand_body("tri"), gctx)
            gctx = _ragged_fori(k_sph // CH, cnt_sph, cand_body("sph"), gctx)

            # ---- assemble ------------------------------------------------
            gpv, gtd, gte = builder_vjp({**gctx, **gctx_const})
            d_par[0] += jnp.concatenate(
                [gq.reshape(1, 1) for gq in gpv], axis=1
            )
            d_tau[0] += jnp.concatenate(
                [gtd.reshape(1, 1), gte.reshape(1, 1)], axis=1
            )

    tile4 = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda i, sb, im: (im[i], 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    shared4 = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda i, sb, im: (0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tile3 = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda i, sb, im: (im[i], 0, 0),
        memory_space=pltpu.VMEM,
    )
    sh_spec = shared4 if projective else tile4
    f32 = jnp.float32
    shapes3 = [tri_t.shape, tri_alb.shape, sph_t.shape, sph_alb.shape,
               tsh_t.shape, ssh_t.shape]
    tri_t, tri_alb, sph_t, sph_alb, tsh_t, ssh_t = map(
        _chunked, (tri_t, tri_alb, sph_t, sph_alb, tsh_t, ssh_t)
    )
    shapes = [tri_t.shape, tri_alb.shape, sph_t.shape, sph_alb.shape,
              tsh_t.shape, ssh_t.shape, (n_tiles, 1, n_params),
              (n_tiles, 1, 2)]
    out_specs = (
        tile4(shapes[0]), tile4(shapes[1]), tile4(shapes[2]),
        tile4(shapes[3]), sh_spec(shapes[4]), sh_spec(shapes[5]),
        tile3(shapes[6]), tile3(shapes[7]),
    )
    empty_flag = (counts[:, 0] + counts[:, 1]) == 0
    m = jnp.sum((~empty_flag).astype(jnp.int32))
    inmap = jnp.argsort(empty_flag, stable=True).astype(jnp.int32)
    prefills = tuple(jnp.zeros(s, f32) for s in shapes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(jnp.maximum(m, 1), n_sub),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile4(tri_t.shape),
            tile4(tri_alb.shape),
            tile4(sph_t.shape),
            tile4(sph_alb.shape),
            sh_spec(tsh_t.shape),
            sh_spec(ssh_t.shape),
            pl.BlockSpec(
                (1, 8, sub), lambda i, sb, im: (im[i], 0, sb),
                memory_space=pltpu.VMEM,
            ),
        ] + (
            [pl.BlockSpec(
                (1, r_fin, sub), lambda i, sb, im: (im[i], 0, sb),
                memory_space=pltpu.VMEM,
            )] if use_finals else []
        ) + [pl.BlockSpec(memory_space=pl.ANY) for _ in shapes],
        out_specs=out_specs,
    )
    res_ops = (res_tiles,) if use_finals else ()
    n_pre = 11 + len(res_ops)
    grads = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct(s, f32) for s in shapes),
        grid_spec=grid_spec,
        # operands: inmap=0, params=1, taus=2, counts=3, tables 4..9,
        # g_tiles=10, [res_tiles=11,] zero prefills -> aliased to
        # outputs 0..7
        input_output_aliases={n_pre + q: q for q in range(len(shapes))},
        compiler_params=pltpu.CompilerParams(
            # sub-block accumulation into revisited per-tile blocks needs
            # in-order execution of the minor dimension.
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(inmap, params, taus, counts, tri_t, tri_alb, sph_t, sph_alb, tsh_t,
      ssh_t, g_tiles, *res_ops, *prefills)
    # un-chunk the table grads back to the gather tables' 3-D layout
    return tuple(g.reshape(s) for g, s in zip(grads[:6], shapes3)) + grads[6:]


def _soft_cfg(bins: SoftBins, packed, shading, shadows, tp):
    n_lights = packed.lights.position.shape[0]
    return dict(
        k_tri=bins.k_tri,
        k_sph=bins.k_sph,
        k_sh_tri=bins.k_sh_tri,
        k_sh_sph=bins.k_sh_sph,
        n_lights=n_lights,
        shading=shading,
        shadows=shadows,
        tp=tp,
        projective=bins.projective,
        # Sublane-fold the per-pixel shading phases only in the big-scene
        # regime (same static threshold as the stored-finals backward):
        # measured on v5e, folding wins ~5% at the 200-prim stress scale
        # but costs the 11-prim headline ~20% (the fold/unfold boundary
        # work outweighs the phase it widens on sparse frames).
        fold_px=_use_stored_finals(bins, n_lights, shadows),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "shading", "shadows", "interpret", "save_finals",
    ),
)
def _soft_tiled_fwd_impl(
    packed, camera, tau_d, tau_e, bins,
    *, height, width, shading, shadows, interpret, save_finals=False,
):
    tables = _gather_soft_tables(packed, camera, tau_e, bins)
    params = _camera_params(camera, packed.lights)
    taus = jnp.stack([tau_d, tau_e]).astype(jnp.float32)
    cfg = _soft_cfg(bins, packed, shading, shadows, SUB_PIX_FWD)
    out = _soft_tiled_fwd_pallas(
        params, taus, tables, bins.counts,
        width=width, nty=bins.nty, ntx=bins.ntx, cfg=cfg, interpret=interpret,
        save_finals=save_finals,
    )
    if save_finals:
        out, fin = out
        return _untile(out, height, width, bins.nty, bins.ntx), fin
    return _untile(out, height, width, bins.nty, bins.ntx)


# --- custom VJP --------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _soft_tiled_core(
    packed, camera, tau_d, tau_e,
    height, width, shading, shadows, interpret, k, shadow_k,
):
    out, _ = _soft_tiled_fwd_core(
        packed, camera, tau_d, tau_e,
        height, width, shading, shadows, interpret, k, shadow_k,
    )
    return out


def _make_bins(packed, camera, tau_e, height, width, shading, shadows, k,
               shadow_k):
    bins = _bin_soft(
        jax.lax.stop_gradient(packed), jax.lax.stop_gradient(tau_e),
        jax.lax.stop_gradient(camera),
        height=height, width=width, k=k, shadows=shadows, shadow_k=shadow_k,
    )
    return bins


def _soft_tiled_fwd_core(
    packed, camera, tau_d, tau_e,
    height, width, shading, shadows, interpret, k, shadow_k,
    save_finals=False,
):
    from opencl_ray_tracer_tpu.kernels.soft import _soft_pallas_fwd

    bins = _make_bins(
        packed, camera, tau_e, height, width, shading, shadows, k, shadow_k
    )
    aggregate = shading == "phong" or (shadows and shading == "lambert")
    n_lights = packed.lights.position.shape[0]
    # save_finals=True means "if the scale warrants it" — the static slot
    # count picks the stored-finals vs recompute backward regime.
    if save_finals:
        save_finals = _use_stored_finals(bins, n_lights, shadows)
    r_fin = _finals_rows(aggregate, n_lights if shadows else 0)
    n_tiles = bins.nty * bins.ntx

    def tiled(args):
        p, c, td, te = args
        return _soft_tiled_fwd_impl(
            p, c, td, te, bins,
            height=height, width=width, shading=shading, shadows=shadows,
            interpret=interpret, save_finals=save_finals,
        )

    def brute(args):
        p, c, td, te = args
        out = _soft_pallas_fwd(
            p, c, td, te,
            height=height, width=width, shading=shading, shadows=shadows,
            normalize_dir=camera.normalize, interpret=interpret,
        )
        if save_finals:
            # shape-matched dummy: the overflow bwd re-runs the brute
            # path's own vjp and never reads these
            return out, jnp.zeros((n_tiles, r_fin, TILE_PIX), jnp.float32)
        return out

    out = jax.lax.cond(
        bins.overflow, brute, tiled, (packed, camera, tau_d, tau_e)
    )
    return out, bins


def _soft_tiled_vjp_fwd(
    packed, camera, tau_d, tau_e,
    height, width, shading, shadows, interpret, k, shadow_k,
):
    out, bins = _soft_tiled_fwd_core(
        packed, camera, tau_d, tau_e,
        height, width, shading, shadows, interpret, k, shadow_k,
        save_finals=True,  # honored only when the scale warrants it
    )
    if isinstance(out, tuple):
        out, fin = out
    else:
        fin = None
    return out, (packed, camera, tau_d, tau_e, bins, fin)


def _soft_tiled_vjp_bwd(
    height, width, shading, shadows, interpret, k, shadow_k, res, g,
):
    from opencl_ray_tracer_tpu.kernels.soft import (
        _soft_bwd as _brute_soft_bwd,
    )

    packed, camera, tau_d, tau_e, bins, fin = res

    def tiled_bwd(args):
        packed_, camera_, td, te, g_, fin_ = args

        def prep(p_, c_, te_):
            tabs = _gather_soft_tables(p_, c_, te_, bins)
            return tabs + (_camera_params(c_, p_.lights),)

        outs, prep_vjp = jax.vjp(prep, packed_, camera_, te)
        tables, params = outs[:6], outs[6]
        taus = jnp.stack([td, te]).astype(jnp.float32)
        g_tiles = _tile_g_layout(g_, height, width, bins.nty, bins.ntx)
        cfg = _soft_cfg(bins, packed_, shading, shadows, SUB_PIX_BWD)
        grads = _soft_tiled_bwd_pallas(
            params, taus, tables, bins.counts, g_tiles, fin_,
            width=width, nty=bins.nty, ntx=bins.ntx, cfg=cfg,
            interpret=interpret,
        )
        d_tabs = grads[:6]
        d_par = jnp.sum(grads[6], axis=0).reshape(params.shape)
        d_tau = jnp.sum(grads[7], axis=0).reshape(2)
        d_packed, d_camera, d_te_prep = prep_vjp(tuple(d_tabs) + (d_par,))
        return d_packed, d_camera, d_tau[0], d_tau[1] + d_te_prep

    def brute_bwd(args):
        packed_, camera_, td, te, g_, _fin = args
        return _brute_soft_bwd(
            height, width, shading, shadows, camera.normalize, interpret,
            (packed_, camera_, td, te), g_,
        )

    return jax.lax.cond(
        bins.overflow, brute_bwd, tiled_bwd,
        (packed, camera, tau_d, tau_e, g, fin),
    )


_soft_tiled_core.defvjp(_soft_tiled_vjp_fwd, _soft_tiled_vjp_bwd)


def render_soft_tiled(
    scene,
    camera: Camera,
    config: RenderConfig,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Tiled+culled soft differentiable render, fused Pallas fwd AND bwd.

    Covers both camera families: shared-direction (affine soft
    coefficients) and shared-origin pinhole (projective coefficients; full
    shared shadow-occluder tables, since no screen-space corridor bounds
    pinhole shadow rays). Any tile exceeding config.cull_k / shadow_cull_k
    candidates falls back to the brute soft kernel for the frame (lax.cond
    — never silently wrong). Output float32 (H, W, 4), 0..255 domain."""
    if interpret is None:
        interpret = _use_interpret()
    packed = scene.pack() if hasattr(scene, "pack") else scene
    return _soft_tiled_core(
        packed,
        camera,
        jnp.float32(config.tau_depth),
        jnp.float32(config.tau_edge),
        config.height,
        config.width,
        config.shading,
        config.shadows,
        interpret,
        config.cull_k,
        config.shadow_cull_k,
    )
