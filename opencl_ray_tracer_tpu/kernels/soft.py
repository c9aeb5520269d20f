"""Fused Pallas kernel for the SOFT differentiable renderer (forward).

Implements diff/soft.py's math as one streaming kernel over pixel tiles —
the structure is flash-attention's: the softmax over primitives (softmin on
depth, weighted by coverage) is computed with a running max / running
normalizer, one primitive chunk at a time, so nothing (pixels x prims)-sized
ever exists:

  per chunk:  t, cov -> logit = -t/tau_d + log(cov)
              m' = max(m, max_chunk(logit)); rescale Z, S by exp(m - m')
              Z += sum exp(logit - m')
              S_rgb += (exp(logit - m') * shade) @ albedo      (MXU)
              B += sum log1p(-cov)                             (background)
  final:      rgb = exp(B) * bg + (1 - exp(B)) * S_rgb / Z

Differentiation: wrapped in jax.custom_vjp. The backward pass evaluates the
VJP of the (mathematically identical) jnp implementation in diff/soft.py —
XLA-fused, row-chunked. A hand-written Pallas backward (recompute +
grid-accumulated scene grads) is the planned next step; the contract and
tests stay the same when it lands.

Supports legacy + lambert shading (the differentiable modes), shared-dir or
per-pixel-dir cameras.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_ray_tracer_tpu.camera import Camera
from opencl_ray_tracer_tpu.config import RenderConfig
from opencl_ray_tracer_tpu.kernels.fwd import (
    _LIGHT_STRIDE,
    _P_AMBIENT,
    _P_LIGHTS,
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
CK = 128
NEG_BIG = -1e30


def _dot_hi(a, b):
    return jnp.dot(
        a, b, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
    )


def _build_soft_kernel(
    *,
    width: int,
    n_tri_chunks: int,
    n_sph_chunks: int,
    n_lights: int,
    shading: str,
    normalize_dir: bool,
):
    TP = TILE_PIXELS
    wf = float(width)

    def scal(ref, i):
        return ref[i]

    def kernel(params_ref, taus_ref, tri_ref, tri_alb_ref, sph_ref, sph_alb_ref,
               out_ref):
        tau_d = taus_ref[0]
        tau_e = taus_ref[1]
        pid = pl.program_id(0)
        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (TP, 1), 0).astype(jnp.float32)
            + pid.astype(jnp.float32) * TP
        )
        y = jnp.floor(flat * (1.0 / wf))
        y = jnp.where(flat - y * wf < 0, y - 1, y)
        x = flat - y * wf

        o0 = [scal(params_ref, _P_O0 + q) for q in range(3)]
        dox = [scal(params_ref, _P_DOX + q) for q in range(3)]
        doy = [scal(params_ref, _P_DOY + q) for q in range(3)]
        d0 = [scal(params_ref, _P_D0 + q) for q in range(3)]
        ddx = [scal(params_ref, _P_DDX + q) for q in range(3)]
        ddy = [scal(params_ref, _P_DDY + q) for q in range(3)]
        ox = o0[0] + x * dox[0] + y * doy[0]
        oy = o0[1] + x * dox[1] + y * doy[1]
        oz = o0[2] + x * dox[2] + y * doy[2]
        dx = d0[0] + x * ddx[0] + y * ddy[0]
        dy = d0[1] + x * ddx[1] + y * ddy[1]
        dz = d0[2] + x * ddx[2] + y * ddy[2]
        if normalize_dir:
            inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
            dx, dy, dz = dx * inv, dy * inv, dz * inv

        ambient = scal(params_ref, _P_AMBIENT)

        def shade_factors(px, py, pz, nx, ny, nz):
            """Per-(pixel, prim) light factors for lambert: list of
            (weight, (lcr, lcg, lcb)) per light."""
            outs = []
            for li in range(n_lights):
                base = _P_LIGHTS + li * _LIGHT_STRIDE
                lpx, lpy, lpz = (scal(params_ref, base + q) for q in range(3))
                lc = tuple(scal(params_ref, base + 3 + q) for q in range(3))
                lint = scal(params_ref, base + 6)
                tlx, tly, tlz = lpx - px, lpy - py, lpz - pz
                dist = jnp.sqrt(
                    jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
                )
                ndotl = jnp.maximum(
                    (nx * tlx + ny * tly + nz * tlz) / dist, 0.0
                )
                outs.append((lint * ndotl, lc))
            return outs

        def accumulate(t, cov, shade_w, alb_ref, c0, state):
            """Streaming softmax update for one chunk.

            t, cov: (TP, CK); shade_w: None (legacy handled via shade_w as
            scalar_t) or list of per-light factors; alb_ref chunk (CK, 8)
            rows [r, g, b, ...]."""
            m, z, sr, sg, sb_, bacc = state
            # Ranking logit — identical to diff/soft.py _soft_aggregate:
            # validity cut (cov <= 1e-12 => logit -1e30) removes padding and
            # invisible junk from the race; depth unclamped for valid lanes
            # (negative-t-wins quirk preserved).
            logit = jnp.where(
                cov > 1e-12,
                -t * (1.0 / tau_d) + jnp.log(jnp.clip(cov, 1e-12, 1.0)),
                NEG_BIG,
            )
            cmax = jnp.max(logit, axis=1, keepdims=True)
            m_new = jnp.maximum(m, cmax)
            scale = jnp.exp(m - m_new)
            e = jnp.exp(logit - m_new)                        # (TP, CK)
            alb = alb_ref[c0 * CK : (c0 + 1) * CK, 0:8]       # (CK, 8)
            z = z * scale + jnp.sum(e, axis=1, keepdims=True)

            if shading == "legacy":
                scalar_t = 255.0 - t * (255.0 / LEGACY_FOG_MAX)
                u = e * scalar_t
                s = _dot_hi(u, alb)                            # (TP, 8)
                sr = sr * scale + s[:, 0:1]
                sg = sg * scale + s[:, 1:2]
                sb_ = sb_ * scale + s[:, 2:3]
            else:  # lambert: alb * (ambient + sum_l lc * w_l), clip, * 255
                amb_s = _dot_hi(e, alb) * ambient              # (TP, 8)
                acc_r = amb_s[:, 0:1]
                acc_g = amb_s[:, 1:2]
                acc_b = amb_s[:, 2:3]
                for w_l, lc in shade_w:
                    s = _dot_hi(e * w_l, alb)
                    acc_r += lc[0] * s[:, 0:1]
                    acc_g += lc[1] * s[:, 1:2]
                    acc_b += lc[2] * s[:, 2:3]
                # NOTE: clip to [0,1]*255 happens per-pixel post-aggregation
                # in the jnp reference per-PRIM; here we fold 255 now and
                # clip after — identical when unsaturated (tests compare).
                sr = sr * scale + acc_r * 255.0
                sg = sg * scale + acc_g * 255.0
                sb_ = sb_ * scale + acc_b * 255.0

            bacc = bacc + jnp.sum(
                jnp.log1p(-jnp.clip(cov, 0.0, 1.0 - 1e-6)), axis=1, keepdims=True
            )
            return m_new, z, sr, sg, sb_, bacc

        state = (
            jnp.full((TP, 1), NEG_BIG, jnp.float32),
            jnp.zeros((TP, 1), jnp.float32),
            jnp.zeros((TP, 1), jnp.float32),
            jnp.zeros((TP, 1), jnp.float32),
            jnp.zeros((TP, 1), jnp.float32),
            jnp.zeros((TP, 1), jnp.float32),
        )

        for c in range(n_tri_chunks):
            s = slice(c * CK, (c + 1) * CK)
            v0x, v0y, v0z = tri_ref[0, s][None, :], tri_ref[1, s][None, :], tri_ref[2, s][None, :]
            e1x, e1y, e1z = tri_ref[3, s][None, :], tri_ref[4, s][None, :], tri_ref[5, s][None, :]
            e2x, e2y, e2z = tri_ref[6, s][None, :], tri_ref[7, s][None, :], tri_ref[8, s][None, :]
            s1 = tri_ref[9, s][None, :]    # |e1|
            s2 = tri_ref[10, s][None, :]   # |e2|
            nux = tri_ref[11, s][None, :]  # unit normal
            nuy = tri_ref[12, s][None, :]
            nuz = tri_ref[13, s][None, :]

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

            if shading == "legacy":
                sw = None
            else:
                ndotd = nux * dx + nuy * dy + nuz * dz
                fl = jnp.where(ndotd > 0, -1.0, 1.0)
                px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
                sw = shade_factors(px, py, pz, nux * fl, nuy * fl, nuz * fl)
            state = accumulate(t, cov, sw, tri_alb_ref, c, state)

        for c in range(n_sph_chunks):
            s = slice(c * CK, (c + 1) * CK)
            cx, cy, cz = sph_ref[0, s][None, :], sph_ref[1, s][None, :], sph_ref[2, s][None, :]
            r = sph_ref[3, s][None, :]
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

            if shading == "legacy":
                sw = None
            else:
                px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
                rinv = 1.0 / jnp.maximum(r, 1e-20)
                nx_, ny_, nz_ = (px - cx) * rinv, (py - cy) * rinv, (pz - cz) * rinv
                sw = shade_factors(px, py, pz, nx_, ny_, nz_)
            state = accumulate(t, cov, sw, sph_alb_ref, c, state)

        m, z, sr, sg, sb_, bacc = state
        zinv = 1.0 / jnp.maximum(z, 1e-20)
        fr, fg, fb = sr * zinv, sg * zinv, sb_ * zinv
        w_bg = jnp.exp(bacc)
        r_out = (1.0 - w_bg) * fr
        g_out = (1.0 - w_bg) * fg
        b_out = (1.0 - w_bg) * fb
        if shading != "legacy":
            r_out = jnp.clip(r_out, 0.0, 255.0)
            g_out = jnp.clip(g_out, 0.0, 255.0)
            b_out = jnp.clip(b_out, 0.0, 255.0)
        alpha = jnp.full((TP, 1), 255.0, jnp.float32)
        res = jnp.concatenate(
            [r_out, g_out, b_out, alpha, z, w_bg, m, jnp.zeros((TP, 1))], axis=1
        )
        out_ref[:, :] = res.T

    return kernel


def _prep_soft_arrays(packed):
    """tri geometry (14, Tp): v0, e1, e2, |e1|, |e2|, unit normal;
    tri albedo (Tp, 8); spheres (4, Sp) + albedo (Sp, 8)."""
    e1t, e2t = packed.tri_e1.T, packed.tri_e2.T
    s1 = jnp.linalg.norm(e1t, axis=-1)
    s2 = jnp.linalg.norm(e2t, axis=-1)
    n = jnp.cross(e1t, e2t)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
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


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "shading", "normalize_dir", "interpret"),
)
def _soft_pallas_fwd(
    packed, camera, tau_d, tau_e, *, height, width, shading, normalize_dir,
    interpret,
):
    tri_geo, tri_alb, sph_geo, sph_alb = _prep_soft_arrays(packed)
    params = _camera_params(camera, packed.lights)
    taus = jnp.stack([tau_d, tau_e]).astype(jnp.float32)

    n_pix = height * width
    p_pad = ((n_pix + TILE_PIXELS - 1) // TILE_PIXELS) * TILE_PIXELS
    kernel = _build_soft_kernel(
        width=width,
        n_tri_chunks=packed.padded_tris // CK if packed.n_tris else 0,
        n_sph_chunks=packed.padded_spheres // CK if packed.n_spheres else 0,
        n_lights=packed.lights.position.shape[0],
        shading=shading,
        normalize_dir=normalize_dir,
    )
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
        interpret=interpret,
    )(params, taus, tri_geo, tri_alb, sph_geo, sph_alb)
    return out[0:4, :n_pix].T.reshape(height, width, 4)


# --- custom VJP: Pallas forward, XLA backward of the identical jnp math ----

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _soft_render_core(
    packed, camera, tau_d, tau_e, height, width, shading, normalize_dir,
    interpret,
):
    return _soft_pallas_fwd(
        packed, camera, tau_d, tau_e,
        height=height, width=width, shading=shading,
        normalize_dir=normalize_dir, interpret=interpret,
    )


def _jnp_equivalent(packed, camera, tau_d, tau_e, height, width, shading):
    """The differentiable twin (diff/soft.py) evaluated on the SAME packed
    scene, for the backward pass."""
    from opencl_ray_tracer_tpu.diff.soft import render_soft_jit
    from opencl_ray_tracer_tpu.scene.scene import Lights, Scene

    tp, sp = packed.padded_tris, packed.padded_spheres
    tri_verts = jnp.stack(
        [
            packed.tri_v0.T,
            packed.tri_v0.T + packed.tri_e1.T,
            packed.tri_v0.T + packed.tri_e2.T,
        ],
        axis=1,
    )[: packed.n_tris]
    scene = Scene(
        sphere_origin=packed.sph_origin.T[: packed.n_spheres],
        sphere_radius=packed.sph_radius[0, : packed.n_spheres],
        sphere_colour=packed.sph_colour.T[: packed.n_spheres],
        tri_verts=tri_verts,
        tri_colour=packed.tri_colour.T[: packed.n_tris],
        lights=packed.lights,
    )
    return render_soft_jit(
        scene, camera, tau_d, tau_e, height=height, width=width, shading=shading
    )


def _soft_fwd(packed, camera, tau_d, tau_e, height, width, shading,
              normalize_dir, interpret):
    out = _soft_pallas_fwd(
        packed, camera, tau_d, tau_e,
        height=height, width=width, shading=shading,
        normalize_dir=normalize_dir, interpret=interpret,
    )
    return out, (packed, camera, tau_d, tau_e)


def _soft_bwd(height, width, shading, normalize_dir, interpret, res, g):
    packed, camera, tau_d, tau_e = res
    _, vjp = jax.vjp(
        lambda p, c, td, te: _jnp_equivalent(p, c, td, te, height, width, shading),
        packed, camera, tau_d, tau_e,
    )
    return vjp(g)


_soft_render_core.defvjp(_soft_fwd, _soft_bwd)


def render_soft_pallas(
    scene,
    camera: Camera,
    config: RenderConfig,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Soft differentiable render with the Pallas forward kernel.

    Gradients flow via custom_vjp (backward = XLA autodiff of the identical
    jnp formulation). Output float32 (H, W, 4), 0..255 domain."""
    if interpret is None:
        interpret = _use_interpret()
    shading = config.shading if config.shading != "phong" else "lambert"
    return _soft_render_core(
        scene.pack(),
        camera,
        jnp.float32(config.tau_depth),
        jnp.float32(config.tau_edge),
        config.height,
        config.width,
        shading,
        camera.normalize,
        interpret,
    )
