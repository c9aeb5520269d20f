"""Soft differentiable renderer (SoftRas-style aggregation).

Hard ray tracing has zero/undefined gradients at silhouette edges and through
the argmin visibility decision (SURVEY.md §7 hard parts). This module makes
the BASELINE.json differentiable contract real:

- every primitive gets a smooth COVERAGE in [0, 1] instead of a binary hit:
  * sphere: sigmoid of the signed silhouette margin (r^2 - d^2)/tau_e,
    gated by a smooth in-front indicator sigmoid(tca/tau_e);
  * triangle: product of sigmoids of the barycentric margins u, v, 1-u-v
    (in units of tau_e scaled to barycentric space);
- visibility is a softmin over depth: primitive weights
    w_i ∝ cov_i * exp(-t_i / tau_d)
  normalized together with a background term, computed with a stabilized
  logsumexp, so w -> one-hot nearest-hit as tau -> 0;
- the pixel colour is the weight-averaged per-primitive shaded colour, so
  d(pixel)/d(center, radius, vertices, colour, light) all exist and are
  smooth.

Pure jnp; differentiable end-to-end with jax.grad. Row-chunked with lax.map
to bound the (pixels x prims) intermediates. The Pallas fwd+bwd fusion of
this math lands in kernels/ (same algorithm, streaming softmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from opencl_ray_tracer_tpu.camera import Camera
from opencl_ray_tracer_tpu.config import RenderConfig
from opencl_ray_tracer_tpu.ops.intersect import EPSILON
from opencl_ray_tracer_tpu.ops.shading import LEGACY_FOG_MAX

BG_DEPTH = 1000.0  # background pseudo-depth for the softmin aggregation


def _sphere_soft(o, d, centers, radii, tau_e):
    """Per-(pixel, sphere) soft coverage + depth.

    Returns (t, cov): (..., S) each. t is the hard geometric entry distance
    (clamped forms where undefined), cov in [0, 1].
    """
    o_ = o[..., None, :]
    d_ = jnp.broadcast_to(d, o.shape[:-1] + (3,))[..., None, :]
    L = centers - o_
    tca = jnp.sum(L * d_, axis=-1)
    d2 = jnp.sum(L * L, axis=-1) - tca * tca
    r2 = radii * radii
    # silhouette margin, normalized by radius so tau_e is in world units
    margin = (r2 - d2) / jnp.maximum(2.0 * radii, 1e-6)
    cov = jax.nn.sigmoid(margin / tau_e) * jax.nn.sigmoid(tca / jnp.maximum(tau_e, 1e-6))
    # Depth: t = tca - sqrt(r^2 - d^2). The sqrt has an unbounded derivative
    # at the silhouette (and a hard clamp would zero it — autodiff and finite
    # differences then disagree wildly at edge pixels). Replace the clamp
    # with a tau-scaled softplus floor: exact in the interior
    # (q >> beta => softplus ~ identity), smooth and bounded at the edge.
    q = r2 - d2
    beta = jnp.maximum(tau_e, 1e-3) * jnp.maximum(2.0 * radii, 1e-6)
    thc = jnp.sqrt(beta * jax.nn.softplus(q / beta) + 1e-12)
    t = tca - thc
    return t, cov


def _tri_soft(o, d, v0, e1, e2, tau_e):
    """Per-(pixel, triangle) soft coverage + depth via smooth barycentrics."""
    o_ = o[..., None, :]
    d_ = jnp.broadcast_to(d, o.shape[:-1] + (3,))[..., None, :]
    pvec = jnp.cross(d_, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    det_ok = jnp.abs(det) >= EPSILON
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tvec = o_ - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d_ * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    # Edge lengths give the world-per-barycentric scale so tau_e stays in
    # world units across differently sized triangles.
    s1 = jnp.linalg.norm(e1, axis=-1)
    s2 = jnp.linalg.norm(e2, axis=-1)
    tau_u = tau_e / jnp.maximum(s1, 1e-6)
    tau_v = tau_e / jnp.maximum(s2, 1e-6)
    tau_w = tau_e / jnp.maximum(0.5 * (s1 + s2), 1e-6)
    cov = (
        jax.nn.sigmoid(u / tau_u)
        * jax.nn.sigmoid(v / tau_v)
        * jax.nn.sigmoid((1.0 - u - v) / tau_w)
    )
    cov = jnp.where(det_ok, cov, 0.0)
    return t, cov


def _soft_aggregate(ts, covs, colours, tau_d, bg_colour):
    """Softmin-over-depth aggregation with a coverage-composited background.

    ts, covs: (..., N); colours: (..., N, C) or (N, C); returns (..., C).

    Two decoupled soft decisions (this matters: folding coverage into the
    depth logits as log(cov) lets a zero-coverage primitive outscore the
    background as tau_d -> 0, tinting every miss pixel):
      1. WHICH primitive is visible: softmax over -t/tau_d among primitives,
         weighted by coverage (log-space);
      2. WHETHER any primitive covers the pixel: w_bg = prod_i (1 - cov_i),
         the smooth probability that no primitive covers it.
    """
    # Ranking logit with a hard VALIDITY cut: primitives with effectively
    # zero coverage (cov <= 1e-12 — invisible at this pixel, incl. any
    # padding lanes in the Pallas twin) get logit -1e30 and exactly zero
    # weight, so they can never outrank a real candidate via the depth term.
    # Depth is deliberately UNclamped for valid candidates: a primitive that
    # genuinely covers the pixel with negative t wins the softmin, exactly
    # like the reference's negative-t-wins quirk in hard mode
    # (rayTracer.cl:74-77, 162). If every lane is invalid, the softmax goes
    # uniform over junk — harmless, because (1 - w_bg) ~ sum(cov) ~ 0
    # suppresses the whole foreground term.
    valid = covs > 1e-12
    logit = jnp.where(
        valid, -ts / tau_d + jnp.log(jnp.clip(covs, 1e-12, 1.0)), -1e30
    )
    w_prim = jax.nn.softmax(logit, axis=-1)                    # (..., N)
    w_bg = jnp.exp(
        jnp.sum(jnp.log1p(-jnp.clip(covs, 0.0, 1.0 - 1e-6)), axis=-1, keepdims=True)
    )                                                          # (..., 1)
    colours = jnp.broadcast_to(colours, ts.shape + (colours.shape[-1],))
    fg = jnp.sum(w_prim[..., None] * colours, axis=-2)
    return w_bg * bg_colour + (1.0 - w_bg) * fg


def trace_soft(scene, o, d, *, shading: str, tau_d: float, tau_e: float):
    """Soft-trace arbitrary ray bundles -> float RGBA (0..255 domain)."""
    parts_t, parts_cov, parts_col = [], [], []
    lead = o.shape[:-1]
    d_b = jnp.broadcast_to(d, lead + (3,))

    if scene.num_triangles:
        v0 = scene.tri_verts[:, 0, :]
        e1 = scene.tri_verts[:, 1, :] - v0
        e2 = scene.tri_verts[:, 2, :] - v0
        t, cov = _tri_soft(o, d, v0, e1, e2, tau_e)
        parts_t.append(t)
        parts_cov.append(cov)
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        # flip against ray per pixel
        ndotd = jnp.einsum("...k,nk->...n", d_b, n)
        n_pix = jnp.where(ndotd[..., None] > 0, -n, n)       # (..., T, 3)
        parts_col.append(
            _shade_prim(scene, o, d_b, t, n_pix, scene.tri_colour, shading)
        )

    if scene.num_spheres:
        t, cov = _sphere_soft(
            o, d, scene.sphere_origin, scene.sphere_radius, tau_e
        )
        parts_t.append(t)
        parts_cov.append(cov)
        p = o[..., None, :] + t[..., None] * d_b[..., None, :]
        n_pix = (p - scene.sphere_origin) / jnp.maximum(
            scene.sphere_radius[..., None], 1e-20
        )
        parts_col.append(
            _shade_prim(scene, o, d_b, t, n_pix, scene.sphere_colour, shading)
        )

    ts = jnp.concatenate(parts_t, axis=-1)
    covs = jnp.concatenate(parts_cov, axis=-1)
    cols = jnp.concatenate(parts_col, axis=-2)

    bg = jnp.zeros(3, jnp.float32)
    rgb = _soft_aggregate(ts, covs, cols, tau_d, bg)
    if shading != "legacy":
        rgb = jnp.clip(rgb, 0.0, 255.0)
    alpha = jnp.full(lead + (1,), 255.0, jnp.float32)
    return jnp.concatenate([rgb, alpha], axis=-1)


def _shade_prim(scene, o, d_b, t, normals, base_colour, shading):
    """Per-(pixel, prim) shaded RGB in the 0..255 domain.

    t: (..., N); normals: (..., N, 3) or (N, 3); base_colour: (N, 4).
    """
    albedo = base_colour[..., :3]                    # (N, 3)
    if shading == "legacy":
        scalar = 255.0 - (t / LEGACY_FOG_MAX) * 255.0
        return scalar[..., None] * albedo
    if shading == "lambert":
        lights = scene.lights
        p = o[..., None, :] + t[..., None] * d_b[..., None, :]   # (..., N, 3)
        diffuse = jnp.zeros(p.shape[:-1] + (3,), jnp.float32)
        n = jnp.broadcast_to(normals, p.shape)
        for li in range(lights.position.shape[0]):
            tl = lights.position[li] - p                          # (..., N, 3)
            dist = jnp.linalg.norm(tl, axis=-1, keepdims=True)
            ldir = tl / jnp.maximum(dist, 1e-20)
            ndotl = jnp.maximum(jnp.sum(n * ldir, axis=-1), 0.0)
            diffuse = diffuse + (
                lights.intensity[li] * ndotl[..., None] * lights.colour[li]
            )
        rgb = albedo * (lights.ambient + diffuse)
        # NOTE: clipping happens post-aggregation in trace_soft (linear
        # blending of unclipped radiance), matching the Pallas soft kernel's
        # factored (weights @ albedo) accumulation.
        return rgb * 255.0
    raise ValueError(f"soft shading mode {shading!r} not supported (legacy/lambert)")


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "shading", "row_chunk"),
)
def render_soft_jit(
    scene,
    camera: Camera,
    tau_d,
    tau_e,
    height: int,
    width: int,
    shading: str = "lambert",
    row_chunk: int = 16,
):
    o, d = camera.rays(height, width)

    def do_chunk(args):
        oc, dc = args
        return trace_soft(
            scene, oc, dc, shading=shading, tau_d=tau_d, tau_e=tau_e
        )

    if height > row_chunk and height % row_chunk == 0:
        o = o.reshape(height // row_chunk, row_chunk, width, 3)
        d = d.reshape(height // row_chunk, row_chunk, width, 3)
        rgba = jax.lax.map(do_chunk, (o, d))
        return rgba.reshape(height, width, 4)
    return do_chunk((o, d))


def render_soft(scene, camera: Camera, config: RenderConfig) -> jax.Array:
    """Soft differentiable render -> float32 (H, W, 4), 0..255 domain."""
    return render_soft_jit(
        scene,
        camera,
        jnp.float32(config.tau_depth),
        jnp.float32(config.tau_edge),
        height=config.height,
        width=config.width,
        shading=config.shading if config.shading != "phong" else "lambert",
    )
