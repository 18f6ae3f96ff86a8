"""Monte-Carlo environment lighting (the live PBR path).

The reference's OptiX env shading (/root/reference/render/optixutils/c_src/
envsampling/kernel.cu: lat-long CDF importance sampling :180-194, GGX
eval/sample :215-300, shadow rays :100-119) is dead at runtime because
render.py:120 forces kd shading — but it is part of the API surface. This is
the TPU-native re-design:

  * light importance sampling from the probe's row/col CDFs
    (render/light.py:update_pdf) via vectorized inverse-CDF searchsorted;
  * lambert diffuse + GGX specular single-scatter BRDF, MIS-free (light
    sampling only, like the reference's n_samples_x light taps);
  * occlusion not by BVH shadow rays but by SPHERE-TRACING THE SDF FIELD
    itself (optional `sdf_fn`): the scene representation doubles as its own
    acceleration structure — no BVH rebuild per iteration (the reference
    rebuilds OptiX BVHs every getMesh, ref hmsdf.py:464).

All sampling is batched over pixels x samples => MXU/VPU-friendly.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from d3human_tpu.render import light as light_mod


def _dir_from_latlong(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(u,v) in [0,1]^2 -> direction (y-up lat-long, matches sample_latlong)."""
    phi = (u - 0.5) * (2.0 * jnp.pi)
    theta = v * jnp.pi
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.sin(phi), ct, -st * jnp.cos(phi)], axis=-1)


def sample_light_dirs(key, light_params, pdf_tables, n: int):
    """Importance-sample n directions from the probe CDFs.

    Returns (dirs [n,3], radiance [n,3], pdf [n])."""
    rows = pdf_tables["rows"]     # [H, W] row-cumulative
    cols = pdf_tables["cols"]     # [H, W] per-row cumulative
    pdf = pdf_tables["pdf"]
    H, W = pdf.shape
    k1, k2 = jax.random.split(key)
    uy = jax.random.uniform(k1, (n,))
    ux = jax.random.uniform(k2, (n,))
    # row CDF is constant across columns; use column 0
    ri = jnp.clip(jnp.searchsorted(rows[:, 0], uy), 0, H - 1)
    ci = jnp.clip(jax.vmap(lambda r, u: jnp.searchsorted(cols[r], u))(ri, ux),
                  0, W - 1)
    u = (ci.astype(jnp.float32) + 0.5) / W
    v = (ri.astype(jnp.float32) + 0.5) / H
    dirs = _dir_from_latlong(u, v)
    radiance = light_mod.sample_latlong(light_params, dirs)
    # pdf over solid angle: p(texel) * (H*W) / (2 pi^2 sin(theta))
    sin_t = jnp.maximum(jnp.sin(v * jnp.pi), 1e-4)
    p = pdf[ri, ci] * (H * W) / (2.0 * jnp.pi * jnp.pi * sin_t)
    return dirs, radiance, jnp.maximum(p, 1e-8)


def ggx_specular(n, v, l, rough, f0=0.04):
    """Single-scatter GGX with Schlick fresnel + Smith G (height-correlated
    approx) — the reference kernel's BRDF family (bsdf.h)."""
    h = n * 0.0 + (v + l)
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    nl = jnp.clip(jnp.sum(n * l, -1, keepdims=True), 0.0, 1.0)
    nv = jnp.clip(jnp.sum(n * v, -1, keepdims=True), 1e-4, 1.0)
    nh = jnp.clip(jnp.sum(n * h, -1, keepdims=True), 0.0, 1.0)
    vh = jnp.clip(jnp.sum(v * h, -1, keepdims=True), 0.0, 1.0)
    a = jnp.maximum(rough, 0.03) ** 2
    a2 = a * a
    d = a2 / jnp.maximum(jnp.pi * ((nh * nh * (a2 - 1) + 1) ** 2), 1e-8)
    k = a / 2.0
    g = (nl / jnp.maximum(nl * (1 - k) + k, 1e-8)) * \
        (nv / jnp.maximum(nv * (1 - k) + k, 1e-8))
    f = f0 + (1 - f0) * (1 - vh) ** 5
    return d * g * f / jnp.maximum(4.0 * nv, 1e-8)


def sphere_trace_shadow(sdf_fn: Callable, origin: jnp.ndarray,
                        direction: jnp.ndarray, n_steps: int = 16,
                        t0: float = 0.02, softness: float = 16.0) -> jnp.ndarray:
    """Soft shadow by sphere-tracing the SDF (sdf > 0 inside convention):
    returns visibility in [0,1]. The field IS the occluder — no BVH."""

    def body(carry, _):
        t, vis = carry
        p = origin + direction * t[..., None]
        d = -sdf_fn(p)                        # distance-ish outside the body
        vis = jnp.minimum(vis, jnp.clip(softness * d / jnp.maximum(t, 1e-3),
                                        0.0, 1.0))
        t = t + jnp.clip(d, 0.01, 0.15)
        return (t, vis), None

    t = jnp.full(origin.shape[:-1], t0)
    vis = jnp.ones(origin.shape[:-1])
    (t, vis), _ = jax.lax.scan(body, (t, vis), None, length=n_steps)
    return vis


def env_shade(
    key,
    gb_pos: jnp.ndarray,       # [..., 3]
    gb_normal: jnp.ndarray,    # [..., 3]
    view_pos: jnp.ndarray,     # [3]
    kd: jnp.ndarray,           # [..., 3]
    ks: jnp.ndarray,           # [..., 3] (o, roughness, metalness)
    light_params,
    n_samples: int = 8,
    sdf_fn: Optional[Callable] = None,
    shadow_scale: float = 1.0,
):
    """Returns (diffuse_accum, specular_accum) like ou.optix_env_shade
    (demodulated: multiply diffuse by albedo outside, ref render.py:139-151)."""
    pdf_tables = light_mod.update_pdf(light_params)
    dirs, radiance, p = sample_light_dirs(key, light_params, pdf_tables,
                                          n_samples)
    v = view_pos - gb_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    diffuse = jnp.zeros_like(kd)
    specular = jnp.zeros_like(kd)
    rough = ks[..., 1:2]
    for s in range(n_samples):
        l = dirs[s]
        li = radiance[s] / p[s]
        nl = jnp.clip(jnp.sum(gb_normal * l, axis=-1, keepdims=True), 0, 1)
        vis = 1.0
        if sdf_fn is not None:
            vis_s = sphere_trace_shadow(sdf_fn, gb_pos + gb_normal * 1e-3,
                                        jnp.broadcast_to(l, gb_pos.shape))
            vis = 1.0 - shadow_scale * (1.0 - vis_s[..., None])
        diffuse = diffuse + li * nl * vis / jnp.pi
        spec = ggx_specular(gb_normal, v, jnp.broadcast_to(l, gb_pos.shape),
                            rough)
        specular = specular + li * spec * nl * vis
    return diffuse / n_samples, specular / n_samples
