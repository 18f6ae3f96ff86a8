"""Cubemap utilities + diffuse/GGX specular prefiltering.

The reference's renderutils plugin hand-writes CUDA kernels for cosine and
GGX-NDF cubemap prefiltering (split-sum environment shading,
/root/reference/render/renderutils/c_src/cubemap.cu — diffuse_cubemap /
specular_cubemap / specular_bounds) plus latlong<->cubemap conversion
(/root/reference/render/util.py:158-190). That whole path is DEAD at the
reference's runtime (render.py:120 forces bsdf='kd'); the live env-shading
capability here is render/envshade.py (MC importance sampling). These
prefilters complete the offline/IBL surface: batched quadrature over all
source texels — O(N^2) in texel count, fully vectorized (one [Nd, Ns]
weight matmul per channel on the MXU), intended for probe resolutions
(<=64 per face) like the reference's.

Conventions: faces ordered +x,-x,+y,-y,+z,-z (the reference's
cube_to_dir, cubemap.cu:33-41); latlong rows are polar angle top->bottom.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cube_dirs(res: int) -> jnp.ndarray:
    """[6, res, res, 3] unit direction of each texel center
    (ref cubemap.cu:33-41 cube_to_dir)."""
    u = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    v, uu = np.meshgrid(u, u, indexing="ij")   # v: row (y), uu: col (x)
    one = np.ones_like(uu)
    faces = [
        np.stack([one, -v, -uu], -1),     # +x
        np.stack([-one, -v, uu], -1),     # -x
        np.stack([uu, one, v], -1),       # +y
        np.stack([uu, -one, -v], -1),     # -y
        np.stack([uu, -v, one], -1),      # +z
        np.stack([-uu, -v, -one], -1),    # -z
    ]
    d = np.stack(faces, 0)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d, jnp.float32)


def texel_solid_angles(res: int) -> jnp.ndarray:
    """[6, res, res] solid angle of each texel (exact integral)."""
    g = (np.arange(res + 1) / res) * 2.0 - 1.0

    def area(x, y):
        return np.arctan2(x * y, np.sqrt(x * x + y * y + 1.0))

    x0, x1 = np.meshgrid(g[:-1], g[1:], indexing="ij")
    # per-texel: area(x1,y1)-area(x0,y1)-area(x1,y0)+area(x0,y0)
    xa, ya = np.meshgrid(g, g, indexing="ij")
    A = area(xa, ya)
    sa = A[1:, 1:] - A[:-1, 1:] - A[1:, :-1] + A[:-1, :-1]
    return jnp.asarray(np.broadcast_to(sa[None], (6, res, res)),
                       jnp.float32)


def latlong_to_cubemap(latlong: jnp.ndarray, res: int) -> jnp.ndarray:
    """[H, W, C] lat-long probe -> [6, res, res, C] (bilinear;
    ref util.py:latlong_to_cubemap)."""
    H, W = latlong.shape[:2]
    d = cube_dirs(res)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1, 1))          # [0, pi]
    phi = jnp.arctan2(d[..., 0], -d[..., 2])                # [-pi, pi]
    y = theta / jnp.pi * H - 0.5
    x = (phi / (2 * jnp.pi) + 0.5) * W - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    xi0 = jnp.mod(x0.astype(jnp.int32), W)
    xi1 = jnp.mod(xi0 + 1, W)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    yi1 = jnp.clip(yi0 + 1, 0, H - 1)
    out = (latlong[yi0, xi0] * ((1 - fx) * (1 - fy))[..., None]
           + latlong[yi0, xi1] * (fx * (1 - fy))[..., None]
           + latlong[yi1, xi0] * ((1 - fx) * fy)[..., None]
           + latlong[yi1, xi1] * (fx * fy)[..., None])
    return out


def cubemap_to_latlong(cube: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """[6, res, res, C] -> [H, W, C] (nearest-face sample;
    ref util.py:cubemap_to_latlong)."""
    H, W = shape
    yy = (jnp.arange(H) + 0.5) / H * jnp.pi
    xx = ((jnp.arange(W) + 0.5) / W - 0.5) * 2 * jnp.pi
    th, ph = jnp.meshgrid(yy, xx, indexing="ij")
    d = jnp.stack([jnp.sin(th) * jnp.sin(ph), jnp.cos(th),
                   -jnp.sin(th) * jnp.cos(ph)], -1)
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    res = cube.shape[1]

    # face selection + in-face coords (inverse of cube_dirs)
    face = jnp.where(
        (ax >= ay) & (ax >= az),
        jnp.where(d[..., 0] > 0, 0, 1),
        jnp.where(ay >= az, jnp.where(d[..., 1] > 0, 2, 3),
                  jnp.where(d[..., 2] > 0, 4, 5)))
    major = jnp.where((ax >= ay) & (ax >= az), ax,
                      jnp.where(ay >= az, ay, az))
    dn = d / major[..., None]

    uv_table = [
        (-dn[..., 2], -dn[..., 1]),   # +x: (u=-z, v=-y)
        (dn[..., 2], -dn[..., 1]),    # -x
        (dn[..., 0], dn[..., 2]),     # +y
        (dn[..., 0], -dn[..., 2]),    # -y
        (dn[..., 0], -dn[..., 1]),    # +z
        (-dn[..., 0], -dn[..., 1]),   # -z
    ]
    uu = jnp.zeros_like(major)
    vv = jnp.zeros_like(major)
    for i, (ui, vi) in enumerate(uv_table):
        uu = jnp.where(face == i, ui, uu)
        vv = jnp.where(face == i, vi, vv)
    col = jnp.clip(((uu + 1) * 0.5 * res).astype(jnp.int32), 0, res - 1)
    row = jnp.clip(((vv + 1) * 0.5 * res).astype(jnp.int32), 0, res - 1)
    return cube[face, row, col]


def diffuse_prefilter(cube: jnp.ndarray) -> jnp.ndarray:
    """Cosine-convolved irradiance cubemap (ref diffuse_cubemap kernel):
    out(n) = sum_l max(n.l, 0) * L(l) * dOmega / pi."""
    res = cube.shape[1]
    d = cube_dirs(res).reshape(-1, 3)
    sa = texel_solid_angles(res).reshape(-1)
    src = cube.reshape(-1, cube.shape[-1])
    w = jnp.maximum(d @ d.T, 0.0) * sa[None, :]      # [Nd, Ns]
    out = (w @ src) / jnp.pi
    return out.reshape(cube.shape)


def _ggx_ndf(cos_h: jnp.ndarray, alpha: float) -> jnp.ndarray:
    a2 = alpha * alpha
    den = cos_h * cos_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * den * den, 1e-9)


def specular_prefilter(cube: jnp.ndarray, roughness: float) -> jnp.ndarray:
    """GGX-NDF-weighted prefilter at one roughness (ref specular_cubemap
    kernel with the n=v=r split-sum approximation): out(r) =
    sum_l D_ggx(r.l) (r.l) L(l) dOmega / sum weights."""
    res = cube.shape[1]
    d = cube_dirs(res).reshape(-1, 3)
    sa = texel_solid_angles(res).reshape(-1)
    src = cube.reshape(-1, cube.shape[-1])
    cos_rl = jnp.maximum(d @ d.T, 0.0)
    # n=v=r: the half vector's cosine obeys cos_h = sqrt((1+cos_rl)/2)
    cos_h = jnp.sqrt(jnp.clip((1.0 + cos_rl) * 0.5, 0.0, 1.0))
    w = _ggx_ndf(cos_h, max(roughness, 0.02) ** 2) * cos_rl * sa[None, :]
    norm = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)
    return ((w @ src) / norm).reshape(cube.shape)


def specular_mip_chain(cube: jnp.ndarray, n_mips: int = 5):
    """[roughness-increasing] prefiltered mip chain, each at half the
    previous resolution (ref build of specular mip stack)."""
    mips = []
    cur = cube
    for i in range(n_mips):
        rough = i / max(n_mips - 1, 1)
        mips.append(specular_prefilter(cur, rough))
        if cur.shape[1] > 2 and i != n_mips - 1:
            res = cur.shape[1] // 2
            cur = cur.reshape(6, res, 2, res, 2, -1).mean(axis=(2, 4))
    return mips
