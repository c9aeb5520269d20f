"""Fused Pallas kernels for the SOFT differentiable renderer — fwd AND bwd.

Forward: diff/soft.py's math as one streaming kernel over pixel tiles — the
structure is flash-attention's: the softmax over primitives (softmin on
depth, weighted by coverage) is computed with a running max / running
normalizer, one 128-primitive chunk at a time, so nothing (pixels x prims)-
sized ever exists:

  per chunk:  t, cov -> logit = -t/tau_d + log(cov)
              m' = max(m, max_chunk(logit)); rescale Z, S by exp(m - m')
              Z += sum exp(logit - m')
              S += (exp(logit - m') * shade) @ albedo          (MXU)
              B += sum log1p(-cov)                             (background)
  final:      rgb = (1 - exp(B)) * S / Z

Backward: a hand-structured fused Pallas kernel (this file, _build_bwd_kernel)
— the gradient analogue of the reference's device hot loop
(resources/shaders/rayTracer.cl:111-202). It is RECOMPUTE-based: each grid
step re-derives its tile's per-chunk intersections/coverages (recompute >
store — no (pixels x prims) residuals ever reach HBM), applies the tile's
incoming pixel cotangents, and ACCUMULATES scene-parameter gradients across
grid steps into revisited VMEM output blocks (constant index_map; TPU grids
are sequential so the read-modify-write is race-free). The in-kernel
tile VJP is derived by jax.vjp over the SAME `_tile_soft_math` the forward
kernel runs, so fwd and bwd can never diverge; the jnp twin in diff/soft.py
is the independent test oracle (tests/test_pallas_soft.py), not the engine.

Shading modes (all differentiable):
  legacy / lambert        — per-primitive shade, softmin aggregate;
  phong (+ soft shadows)  — aggregate hit attributes first, then one shading
                            evaluation per pixel with sigmoid-gated occluder
                            visibility (see diff/soft.py _shade_aggregate).
  lambert + shadows       — same aggregate structure, diffuse only.

Shared-dir or per-pixel-dir cameras. Rays rebuilt in-register from the
affine camera bundle; the scene broadcasts into VMEM per grid step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_ray_tracer_tpu.camera import Camera
from opencl_ray_tracer_tpu.config import RenderConfig
from opencl_ray_tracer_tpu.diff.soft import SHADOW_OFFSET, SHADOW_T_MIN
from opencl_ray_tracer_tpu.kernels.fwd import (
    _LIGHT_STRIDE,
    _P_AMBIENT,
    _P_LIGHTS,
    _P_SPEC,
    _P_SHINE,
    _P_D0,
    _P_DDX,
    _P_DDY,
    _P_DOX,
    _P_DOY,
    _P_O0,
    _camera_params,
    _use_interpret,
)
from opencl_ray_tracer_tpu.ops.intersect import EPSILON
from opencl_ray_tracer_tpu.ops.shading import LEGACY_FOG_MAX

TILE_PIXELS = 512
BWD_TILE_PIXELS = 256  # smaller tiles bound the bwd kernel's live VMEM set
CK = 128
NEG_BIG = -1e30
# The vjp-derived bwd keeps per-chunk linearization residuals live; the 16MB
# default scoped-vmem budget is too tight for it (measured: 16.42M at
# tile=256 on a 3-chunk scene). v5e VMEM is 128MB — let the kernels use it.
# 124MB (not 100): the brute bwd branch of the tiled path's overflow cond
# must COMPILE even when never executed, and at reference-stress scale
# (100 sph + 100 cubes = 1280 padded prims) its scoped high-water is
# 118.25M measured.
VMEM_LIMIT_BYTES = 124 * 1024 * 1024


def _dot_hi(a, b):
    return jnp.dot(
        a, b, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
    )


def _pixel_coords(pid, tp: int, width: int):
    """Flat pixel index -> float (x, y) image coords, (TP, 1) columns."""
    wf = float(width)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0).astype(jnp.float32)
        + pid.astype(jnp.float32) * tp
    )
    y = jnp.floor(flat * (1.0 / wf))
    y = jnp.where(flat - y * wf < 0, y - 1, y)  # guard FP division edge
    x = flat - y * wf
    return x, y


def _ray_bundle(pv, x, y, normalize_dir: bool):
    """Affine camera bundle -> per-pixel ray origin/direction components."""
    o = tuple(
        pv[_P_O0 + q] + x * pv[_P_DOX + q] + y * pv[_P_DOY + q] for q in range(3)
    )
    d = tuple(
        pv[_P_D0 + q] + x * pv[_P_DDX + q] + y * pv[_P_DDY + q] for q in range(3)
    )
    if normalize_dir:
        inv = jax.lax.rsqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
        d = tuple(c * inv for c in d)
    return o, d


def _tri_chunk_soft(tri_geo, c, o, d, tau_e):
    """Soft Möller–Trumbore for one 128-triangle chunk.

    Same formulas as diff/soft.py _tri_soft_planar. Returns (t, cov, n)
    with n the UNflipped unit normal rows of tri_geo (1, CK) components.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    s = slice(c * CK, (c + 1) * CK)
    v0x, v0y, v0z = tri_geo[0, s][None, :], tri_geo[1, s][None, :], tri_geo[2, s][None, :]
    e1x, e1y, e1z = tri_geo[3, s][None, :], tri_geo[4, s][None, :], tri_geo[5, s][None, :]
    e2x, e2y, e2z = tri_geo[6, s][None, :], tri_geo[7, s][None, :], tri_geo[8, s][None, :]
    s1 = tri_geo[9, s][None, :]    # |e1|
    s2 = tri_geo[10, s][None, :]   # |e2|
    nux = tri_geo[11, s][None, :]  # unit normal
    nuy = tri_geo[12, s][None, :]
    nuz = tri_geo[13, s][None, :]

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    det_ok = jnp.abs(det) >= EPSILON
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

    tau_u = tau_e / jnp.maximum(s1, 1e-6)
    tau_v = tau_e / jnp.maximum(s2, 1e-6)
    tau_w = tau_e / jnp.maximum(0.5 * (s1 + s2), 1e-6)
    cov = (
        jax.nn.sigmoid(u / tau_u)
        * jax.nn.sigmoid(v / tau_v)
        * jax.nn.sigmoid((1.0 - u - v) / tau_w)
    )
    cov = jnp.where(det_ok, cov, 0.0)
    return t, cov, (nux, nuy, nuz)


def _sph_chunk_soft(sph_geo, c, o, d, tau_e):
    """Soft sphere test for one 128-sphere chunk (diff/soft.py formulas).

    Returns (t, cov, n) with n (TP, CK) outward normal components at the
    softplus-floored near intersection.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    s = slice(c * CK, (c + 1) * CK)
    cx, cy, cz = sph_geo[0, s][None, :], sph_geo[1, s][None, :], sph_geo[2, s][None, :]
    r = sph_geo[3, s][None, :]
    lx, ly, lz = cx - ox, cy - oy, cz - oz
    tca = lx * dx + ly * dy + lz * dz
    d2 = lx * lx + ly * ly + lz * lz - tca * tca
    r2 = r * r
    margin = (r2 - d2) / jnp.maximum(2.0 * r, 1e-6)
    cov = jax.nn.sigmoid(margin / tau_e) * jax.nn.sigmoid(
        tca / jnp.maximum(tau_e, 1e-6)
    )
    q = r2 - d2
    beta = jnp.maximum(tau_e, 1e-3) * jnp.maximum(2.0 * r, 1e-6)
    thc = jnp.sqrt(beta * jax.nn.softplus(q / beta) + 1e-12)
    t = tca - thc
    # guarded reciprocal: 1/max(r, eps) has an f32-inf derivative at the
    # zero-radius padded slots, which poisons sph_radius grads with NaN.
    rpos = r > 0
    rinv = jnp.where(rpos, 1.0 / jnp.where(rpos, r, 1.0), 0.0)
    nx = (ox + t * dx - cx) * rinv
    ny = (oy + t * dy - cy) * rinv
    nz = (oz + t * dz - cz) * rinv
    return t, cov, (nx, ny, nz)


def _tile_soft_math(
    pv,
    tau_d,
    tau_e,
    tri_geo,
    tri_alb,
    sph_geo,
    sph_alb,
    x,
    y,
    *,
    n_tri_chunks: int,
    n_sph_chunks: int,
    n_lights: int,
    shading: str,
    shadows: bool,
    normalize_dir: bool,
    tp: int,
):
    """One pixel tile of the soft renderer as a pure array function.

    pv: flat tuple of camera/material/light scalars (_camera_params order).
    Returns (TP, 8) planes [r, g, b, alpha, z, w_bg, m, 0]. Used verbatim by
    the forward kernel and differentiated by jax.vjp inside the backward
    kernel — single source of truth for the soft pipeline's device math.
    """
    o, d = _ray_bundle(pv, x, y, normalize_dir)
    ambient = pv[_P_AMBIENT]
    chunks = [("tri", c) for c in range(n_tri_chunks)] + [
        ("sph", c) for c in range(n_sph_chunks)
    ]

    def isect(kind, c, oo, dd):
        if kind == "tri":
            return _tri_chunk_soft(tri_geo, c, oo, dd, tau_e)
        return _sph_chunk_soft(sph_geo, c, oo, dd, tau_e)

    def alb_chunk(kind, c):
        a = tri_alb if kind == "tri" else sph_alb
        return a[c * CK : (c + 1) * CK, 0:8]

    def light_scalars(li):
        base = _P_LIGHTS + li * _LIGHT_STRIDE
        lp = (pv[base], pv[base + 1], pv[base + 2])
        lc = (pv[base + 3], pv[base + 4], pv[base + 5])
        return lp, lc, pv[base + 6]

    def ranking(t, cov):
        """Validity-cut depth logit — identical to diff/soft.py
        _soft_aggregate_planar (negative-t-wins quirk preserved)."""
        return jnp.where(
            cov > 1e-12,
            -t * (1.0 / tau_d) + jnp.log(jnp.clip(cov, 1e-12, 1.0)),
            NEG_BIG,
        )

    aggregate = shading == "phong" or (shadows and shading == "lambert")
    zeros1 = jnp.zeros((tp, 1), jnp.float32)

    if not aggregate:
        # ---- per-primitive shading, streaming softmin (legacy / lambert) --
        def shade_factors(px, py, pz, nx, ny, nz):
            outs = []
            for li in range(n_lights):
                lp, lc, lint = light_scalars(li)
                tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
                dist = jnp.sqrt(
                    jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
                )
                ndotl = jnp.maximum((nx * tlx + ny * tly + nz * tlz) / dist, 0.0)
                outs.append((lint * ndotl, lc))
            return outs

        m = jnp.full((tp, 1), NEG_BIG, jnp.float32)
        z, sr, sg, sb_, bacc = zeros1, zeros1, zeros1, zeros1, zeros1
        for kind, c in chunks:
            t, cov, n = isect(kind, c, o, d)
            logit = ranking(t, cov)
            cmax = jnp.max(logit, axis=1, keepdims=True)
            m_new = jnp.maximum(m, cmax)
            scale = jnp.exp(m - m_new)
            e = jnp.exp(logit - m_new)                        # (TP, CK)
            alb = alb_chunk(kind, c)
            z = z * scale + jnp.sum(e, axis=1, keepdims=True)

            if shading == "legacy":
                scalar_t = 255.0 - t * (255.0 / LEGACY_FOG_MAX)
                s = _dot_hi(e * scalar_t, alb)                 # (TP, 8)
                sr = sr * scale + s[:, 0:1]
                sg = sg * scale + s[:, 1:2]
                sb_ = sb_ * scale + s[:, 2:3]
            else:  # lambert: alb * (ambient + sum_l lc * w_l), * 255
                px = o[0] + t * d[0]
                py = o[1] + t * d[1]
                pz = o[2] + t * d[2]
                if kind == "tri":
                    ndotd = n[0] * d[0] + n[1] * d[1] + n[2] * d[2]
                    fl = jnp.where(ndotd > 0, -1.0, 1.0)
                    n = (n[0] * fl, n[1] * fl, n[2] * fl)
                sw = shade_factors(px, py, pz, *n)
                amb_s = _dot_hi(e, alb) * ambient              # (TP, 8)
                acc_r = amb_s[:, 0:1]
                acc_g = amb_s[:, 1:2]
                acc_b = amb_s[:, 2:3]
                for w_l, lc in sw:
                    s = _dot_hi(e * w_l, alb)
                    acc_r += lc[0] * s[:, 0:1]
                    acc_g += lc[1] * s[:, 1:2]
                    acc_b += lc[2] * s[:, 2:3]
                sr = sr * scale + acc_r * 255.0
                sg = sg * scale + acc_g * 255.0
                sb_ = sb_ * scale + acc_b * 255.0

            bacc = bacc + jnp.sum(
                jnp.log1p(-jnp.clip(cov, 0.0, 1.0 - 1e-6)), axis=1, keepdims=True
            )
            m = m_new

        zinv = 1.0 / jnp.maximum(z, 1e-20)
        w_bg = jnp.exp(bacc)
        r_out = (1.0 - w_bg) * sr * zinv
        g_out = (1.0 - w_bg) * sg * zinv
        b_out = (1.0 - w_bg) * sb_ * zinv
        if shading != "legacy":
            r_out = jnp.clip(r_out, 0.0, 255.0)
            g_out = jnp.clip(g_out, 0.0, 255.0)
            b_out = jnp.clip(b_out, 0.0, 255.0)
    else:
        # ---- aggregate-then-shade (phong / lambert + soft shadows) --------
        m = jnp.full((tp, 1), NEG_BIG, jnp.float32)
        z, st, bacc = zeros1, zeros1, zeros1
        snx, sny, snz = zeros1, zeros1, zeros1
        s8 = jnp.zeros((tp, 8), jnp.float32)
        for kind, c in chunks:
            t, cov, n = isect(kind, c, o, d)
            if kind == "tri":
                ndotd = n[0] * d[0] + n[1] * d[1] + n[2] * d[2]
                fl = jnp.where(ndotd > 0, -1.0, 1.0)
                n = (n[0] * fl, n[1] * fl, n[2] * fl)
            logit = ranking(t, cov)
            cmax = jnp.max(logit, axis=1, keepdims=True)
            m_new = jnp.maximum(m, cmax)
            scale = jnp.exp(m - m_new)
            e = jnp.exp(logit - m_new)
            z = z * scale + jnp.sum(e, axis=1, keepdims=True)
            st = st * scale + jnp.sum(e * t, axis=1, keepdims=True)
            snx = snx * scale + jnp.sum(e * n[0], axis=1, keepdims=True)
            sny = sny * scale + jnp.sum(e * n[1], axis=1, keepdims=True)
            snz = snz * scale + jnp.sum(e * n[2], axis=1, keepdims=True)
            s8 = s8 * scale + _dot_hi(e, alb_chunk(kind, c))
            bacc = bacc + jnp.sum(
                jnp.log1p(-jnp.clip(cov, 0.0, 1.0 - 1e-6)), axis=1, keepdims=True
            )
            m = m_new

        zinv = 1.0 / jnp.maximum(z, 1e-20)
        w_bg = jnp.exp(bacc)
        t_hat = st * zinv
        nx, ny, nz = snx * zinv, sny * zinv, snz * zinv
        ninv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
        nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
        ar, ag, ab = s8[:, 0:1] * zinv, s8[:, 1:2] * zinv, s8[:, 2:3] * zinv
        px = o[0] + t_hat * d[0]
        py = o[1] + t_hat * d[1]
        pz = o[2] + t_hat * d[2]
        vinv = jax.lax.rsqrt(
            jnp.maximum(d[0] * d[0] + d[1] * d[1] + d[2] * d[2], 1e-20)
        )
        vx, vy, vz = -d[0] * vinv, -d[1] * vinv, -d[2] * vinv

        diff_r, diff_g, diff_b = zeros1, zeros1, zeros1
        spec_r, spec_g, spec_b = zeros1, zeros1, zeros1
        for li in range(n_lights):
            lp, lc, lint = light_scalars(li)
            tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
            dist = jnp.sqrt(
                jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
            )
            ldx, ldy, ldz = tlx / dist, tly / dist, tlz / dist
            ndotl = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
            if shadows:
                so = (
                    px + SHADOW_OFFSET * nx,
                    py + SHADOW_OFFSET * ny,
                    pz + SHADOW_OFFSET * nz,
                )
                tau_g = jnp.maximum(tau_e, 1e-4)
                shift = jnp.maximum(SHADOW_T_MIN, 4.0 * tau_g)
                logvis = zeros1
                for kind, c in chunks:
                    t2, cov2, _n2 = isect(kind, c, so, (ldx, ldy, ldz))
                    occ = (
                        cov2
                        * jax.nn.sigmoid((t2 - shift) / tau_g)
                        * jax.nn.sigmoid((dist - t2) / tau_g)
                    )
                    logvis = logvis + jnp.sum(
                        jnp.log1p(-jnp.clip(occ, 0.0, 1.0 - 1e-6)),
                        axis=1,
                        keepdims=True,
                    )
                vis = jnp.exp(logvis)
            else:
                vis = 1.0
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
                    pv[_P_SPEC]
                    * jnp.exp(
                        pv[_P_SHINE] * jnp.log(jnp.maximum(rdotv, 1e-20))
                    )
                    * lint
                    * vis
                    * (ndotl > 0.0)
                )
                spec_r = spec_r + ws * lc[0]
                spec_g = spec_g + ws * lc[1]
                spec_b = spec_b + ws * lc[2]

        fg_r = ar * (ambient + diff_r) + spec_r
        fg_g = ag * (ambient + diff_g) + spec_g
        fg_b = ab * (ambient + diff_b) + spec_b
        r_out = jnp.clip((1.0 - w_bg) * fg_r * 255.0, 0.0, 255.0)
        g_out = jnp.clip((1.0 - w_bg) * fg_g * 255.0, 0.0, 255.0)
        b_out = jnp.clip((1.0 - w_bg) * fg_b * 255.0, 0.0, 255.0)

    alpha = jnp.full((tp, 1), 255.0, jnp.float32)
    return jnp.concatenate(
        [r_out, g_out, b_out, alpha, z, w_bg, m, jnp.zeros((tp, 1))], axis=1
    )


def _safe_norm_rows(v):
    """Row norms with ZERO gradient at exactly-zero rows (padded prims).
    jnp.linalg.norm / sqrt(max(x, eps)) both have inf/NaN derivatives at 0,
    which poison the padded lanes of scene-parameter gradients."""
    s2 = jnp.sum(v * v, axis=-1)
    pos = s2 > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, s2, 1.0)), 0.0)


def _safe_unit_rows(v):
    mag = _safe_norm_rows(v)[..., None]
    pos = mag > 0
    return jnp.where(pos, v / jnp.where(pos, mag, 1.0), 0.0)


def _prep_soft_arrays(packed):
    """tri geometry (14, Tp): v0, e1, e2, |e1|, |e2|, unit normal;
    tri albedo (Tp, 8); spheres (4, Sp) + albedo (Sp, 8)."""
    e1t, e2t = packed.tri_e1.T, packed.tri_e2.T
    s1 = _safe_norm_rows(e1t)
    s2 = _safe_norm_rows(e2t)
    n = _safe_unit_rows(jnp.cross(e1t, e2t))
    tri_geo = jnp.concatenate(
        [
            packed.tri_v0, packed.tri_e1, packed.tri_e2,
            s1[None, :], s2[None, :], n.T,
        ],
        axis=0,
    )  # (14, Tp)
    tp = packed.padded_tris
    sp = packed.padded_spheres
    tri_alb = jnp.concatenate(
        [packed.tri_colour.T[:, :3], jnp.zeros((tp, 5), jnp.float32)], axis=1
    )
    sph_geo = jnp.concatenate([packed.sph_origin, packed.sph_radius], axis=0)
    sph_alb = jnp.concatenate(
        [packed.sph_colour.T[:, :3], jnp.zeros((sp, 5), jnp.float32)], axis=1
    )
    return tri_geo, tri_alb, sph_geo, sph_alb


def _static_cfg(packed, shading, shadows, normalize_dir, tp):
    return dict(
        n_tri_chunks=packed.padded_tris // CK if packed.n_tris else 0,
        n_sph_chunks=packed.padded_spheres // CK if packed.n_spheres else 0,
        n_lights=packed.lights.position.shape[0],
        shading=shading,
        shadows=shadows,
        normalize_dir=normalize_dir,
        tp=tp,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "shading", "shadows", "normalize_dir", "interpret"
    ),
)
def _soft_pallas_fwd(
    packed, camera, tau_d, tau_e, *, height, width, shading, shadows,
    normalize_dir, interpret,
):
    tri_geo, tri_alb, sph_geo, sph_alb = _prep_soft_arrays(packed)
    params = _camera_params(camera, packed.lights)
    taus = jnp.stack([tau_d, tau_e]).astype(jnp.float32)
    n_params = params.shape[0]

    n_pix = height * width
    p_pad = ((n_pix + TILE_PIXELS - 1) // TILE_PIXELS) * TILE_PIXELS
    cfg = _static_cfg(packed, shading, shadows, normalize_dir, TILE_PIXELS)

    def kernel(params_ref, taus_ref, tri_ref, tri_alb_ref, sph_ref,
               sph_alb_ref, out_ref):
        x, y = _pixel_coords(pl.program_id(0), TILE_PIXELS, width)
        pv = tuple(params_ref[i] for i in range(n_params))
        res = _tile_soft_math(
            pv, taus_ref[0], taus_ref[1],
            tri_ref[:, :], tri_alb_ref[:, :], sph_ref[:, :], sph_alb_ref[:, :],
            x, y, **cfg,
        )
        out_ref[:, :] = res.T

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, p_pad), jnp.float32),
        grid=(p_pad // TILE_PIXELS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full(tri_geo.shape),
            full(tri_alb.shape),
            full(sph_geo.shape),
            full(sph_alb.shape),
        ],
        out_specs=pl.BlockSpec(
            (8, TILE_PIXELS), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(params, taus, tri_geo, tri_alb, sph_geo, sph_alb)
    return out[0:4, :n_pix].T.reshape(height, width, 4)


def _soft_pallas_bwd_arrays(
    params, taus, tri_geo, tri_alb, sph_geo, sph_alb, g8, *, width, cfg,
    interpret,
):
    """The fused backward kernel: grid over pixel tiles, recompute + in-tile
    VJP, scene/camera/tau grads accumulated across grid steps into constant
    VMEM output blocks (initialized at step 0; TPU grid order is sequential).
    """
    n_params = params.shape[0]
    tp = cfg["tp"]
    p_pad = g8.shape[1]

    def kernel(params_ref, taus_ref, tri_ref, tri_alb_ref, sph_ref,
               sph_alb_ref, g_ref,
               d_tri_ref, d_tri_alb_ref, d_sph_ref, d_sph_alb_ref,
               d_par_ref, d_tau_ref):
        pid = pl.program_id(0)
        x, y = _pixel_coords(pid, tp, width)
        pv = tuple(params_ref[i] for i in range(n_params))

        def f(pv_, td, te, tg, ta, sg, sa):
            return _tile_soft_math(pv_, td, te, tg, ta, sg, sa, x, y, **cfg).T

        _, vjp = jax.vjp(
            f, pv, taus_ref[0], taus_ref[1],
            tri_ref[:, :], tri_alb_ref[:, :], sph_ref[:, :], sph_alb_ref[:, :],
        )
        gpv, gtd, gte, gtg, gta, gsg, gsa = vjp(g_ref[:, :])

        @pl.when(pid == 0)
        def _():
            d_tri_ref[:, :] = jnp.zeros(d_tri_ref.shape, jnp.float32)
            d_tri_alb_ref[:, :] = jnp.zeros(d_tri_alb_ref.shape, jnp.float32)
            d_sph_ref[:, :] = jnp.zeros(d_sph_ref.shape, jnp.float32)
            d_sph_alb_ref[:, :] = jnp.zeros(d_sph_alb_ref.shape, jnp.float32)
            d_par_ref[:, :] = jnp.zeros(d_par_ref.shape, jnp.float32)
            d_tau_ref[:, :] = jnp.zeros(d_tau_ref.shape, jnp.float32)

        d_tri_ref[:, :] += gtg
        d_tri_alb_ref[:, :] += gta
        d_sph_ref[:, :] += gsg
        d_sph_alb_ref[:, :] += gsa
        d_par_ref[:, :] += jnp.concatenate(
            [g.reshape(1, 1) for g in gpv], axis=1
        )
        d_tau_ref[:, :] += jnp.concatenate(
            [gtd.reshape(1, 1), gte.reshape(1, 1)], axis=1
        )

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(tri_geo.shape, f32),
            jax.ShapeDtypeStruct(tri_alb.shape, f32),
            jax.ShapeDtypeStruct(sph_geo.shape, f32),
            jax.ShapeDtypeStruct(sph_alb.shape, f32),
            jax.ShapeDtypeStruct((1, n_params), f32),
            jax.ShapeDtypeStruct((1, 2), f32),
        ),
        grid=(p_pad // tp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full(tri_geo.shape),
            full(tri_alb.shape),
            full(sph_geo.shape),
            full(sph_alb.shape),
            pl.BlockSpec((8, tp), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            full(tri_geo.shape),
            full(tri_alb.shape),
            full(sph_geo.shape),
            full(sph_alb.shape),
            full((1, n_params)),
            full((1, 2)),
        ),
        compiler_params=pltpu.CompilerParams(
            # The cross-step accumulation into constant-index output blocks
            # REQUIRES sequential grid execution.
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(params, taus, tri_geo, tri_alb, sph_geo, sph_alb, g8)


# --- custom VJP: Pallas forward, fused Pallas backward ----------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _soft_render_core(
    packed, camera, tau_d, tau_e, height, width, shading, shadows,
    normalize_dir, interpret,
):
    return _soft_pallas_fwd(
        packed, camera, tau_d, tau_e,
        height=height, width=width, shading=shading, shadows=shadows,
        normalize_dir=normalize_dir, interpret=interpret,
    )


def _soft_fwd(packed, camera, tau_d, tau_e, height, width, shading, shadows,
              normalize_dir, interpret):
    out = _soft_pallas_fwd(
        packed, camera, tau_d, tau_e,
        height=height, width=width, shading=shading, shadows=shadows,
        normalize_dir=normalize_dir, interpret=interpret,
    )
    return out, (packed, camera, tau_d, tau_e)


def _soft_bwd(height, width, shading, shadows, normalize_dir, interpret,
              res, g):
    """Recompute-based backward: the Pallas bwd kernel produces gradients in
    the device array layout; the cheap prep functions (_prep_soft_arrays,
    _camera_params) are then VJP'd outside the kernel to map them back onto
    the PackedScene / Camera pytrees."""
    packed, camera, tau_d, tau_e = res
    arrays, prep_vjp = jax.vjp(_prep_soft_arrays, packed)
    tri_geo, tri_alb, sph_geo, sph_alb = arrays
    params, cam_vjp = jax.vjp(_camera_params, camera, packed.lights)
    taus = jnp.stack([tau_d, tau_e]).astype(jnp.float32)

    n_pix = height * width
    tp = BWD_TILE_PIXELS
    p_pad = ((n_pix + tp - 1) // tp) * tp
    g8 = (
        jnp.zeros((8, p_pad), jnp.float32)
        .at[0:4, :n_pix]
        .set(g.reshape(n_pix, 4).T.astype(jnp.float32))
    )

    cfg = _static_cfg(packed, shading, shadows, normalize_dir, tp)
    d_tri_geo, d_tri_alb, d_sph_geo, d_sph_alb, d_par, d_taus = (
        _soft_pallas_bwd_arrays(
            params, taus, tri_geo, tri_alb, sph_geo, sph_alb, g8,
            width=width, cfg=cfg, interpret=interpret,
        )
    )

    (d_packed,) = prep_vjp((d_tri_geo, d_tri_alb, d_sph_geo, d_sph_alb))
    d_cam, d_lights = cam_vjp(d_par.reshape(params.shape))
    d_packed = dataclasses.replace(
        d_packed,
        lights=jax.tree_util.tree_map(
            jnp.add, d_packed.lights, d_lights
        ),
    )
    return d_packed, d_cam, d_taus[0, 0], d_taus[0, 1]


_soft_render_core.defvjp(_soft_fwd, _soft_bwd)


def render_soft_pallas(
    scene,
    camera: Camera,
    config: RenderConfig,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Soft differentiable render, fused Pallas forward AND backward.

    All shading modes run natively (legacy / lambert / phong, soft shadows
    when config.shadows — no silent downgrades). Output float32 (H, W, 4),
    0..255 domain.

    Both camera families route to the tiled+culled soft kernels
    (kernels/soft_tiled.py — affine coefficients for shared-direction,
    projective for pinhole); the brute streaming kernels in this module
    remain the overflow fallback and the oracle for cross-checks."""
    if interpret is None:
        interpret = _use_interpret()
    from opencl_ray_tracer_tpu.kernels.soft_tiled import render_soft_tiled

    return render_soft_tiled(scene, camera, config, interpret=interpret)
