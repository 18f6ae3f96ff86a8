"""Mipmapped 2D texture parameter + UV-space baking.

Capability parity with /root/reference/render/texture.py:20-181 (Texture2D
with custom mip autograd) and render/render.py:456-473 (render_uv), which
back the reference's xatlas texture-export path (train.py:197-246; dead in
the main flow but part of the API surface). The mip pyramid is rebuilt
functionally from the base level every sample — XLA folds the 2x2 averages;
no custom autograd needed since everything is differentiable end-to-end.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def build_mips(base: jnp.ndarray, max_mip: int = 12) -> List[jnp.ndarray]:
    mips = [base]
    while min(mips[-1].shape[:2]) > 1 and len(mips) < max_mip:
        m = mips[-1]
        H, W = m.shape[:2]
        m = m[: H - H % 2, : W - W % 2]
        m = m.reshape(H // 2, 2, W // 2, 2, -1).mean(axis=(1, 3))
        mips.append(m)
    return mips


def _bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape[:2]
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    return (img[y0, x0] * ((1 - fx) * (1 - fy))[..., None]
            + img[y0, x1] * (fx * (1 - fy))[..., None]
            + img[y1, x0] * ((1 - fx) * fy)[..., None]
            + img[y1, x1] * (fx * fy)[..., None])


class Texture2D:
    """Trainable 2D texture with trilinear mip sampling and clamped range."""

    def __init__(self, min_max: Tuple[Sequence[float], Sequence[float]] | None = None):
        self.min_max = min_max

    def init(self, key, res: Tuple[int, int], channels: int = 3) -> dict:
        return {"data": jax.random.uniform(key, (*res, channels))}

    def sample(self, params: dict, uv: jnp.ndarray,
               lod: jnp.ndarray | float = 0.0) -> jnp.ndarray:
        mips = build_mips(params["data"])
        lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0, len(mips) - 1)
        lo = jnp.floor(lod).astype(jnp.int32)
        frac = lod - lo
        samples = jnp.stack([_bilinear(m, uv) for m in mips], axis=0)
        a = jnp.take(samples, lo, axis=0)
        b = jnp.take(samples, jnp.minimum(lo + 1, len(mips) - 1), axis=0)
        out = a + (b - a) * frac
        if self.min_max is not None:
            out = jnp.clip(out, jnp.asarray(self.min_max[0]),
                           jnp.asarray(self.min_max[1]))
        return out

    def clamp(self, params: dict) -> dict:
        if self.min_max is None:
            return params
        return {"data": jnp.clip(params["data"],
                                 jnp.asarray(self.min_max[0]),
                                 jnp.asarray(self.min_max[1]))}


def render_uv(verts_pos: jnp.ndarray, v_tex: jnp.ndarray,
              t_tex_idx: jnp.ndarray, t_pos_idx: jnp.ndarray,
              resolution: Tuple[int, int], tex_module, tex_params):
    """Bake the 3D texture into UV space (ref render.py:456-473): rasterize
    the UV unwrap as clip-space geometry, interpolate world positions,
    sample the volume texture."""
    from d3human_tpu.ops.rasterizer import (
        barycentrics, interpolate, rasterize_bruteforce,
    )

    uv_clip = jnp.concatenate([
        v_tex * 2.0 - 1.0,
        jnp.zeros_like(v_tex[..., :1]),
        jnp.ones_like(v_tex[..., :1]),
    ], axis=-1)
    fv = jnp.ones((t_tex_idx.shape[0],), bool)
    rast = rasterize_bruteforce(uv_clip, t_tex_idx, fv, resolution)
    bary, cover = barycentrics(uv_clip, t_tex_idx, rast, resolution)
    gb_pos = interpolate(verts_pos, bary, t_pos_idx, rast)
    tex = tex_module.sample(tex_params, gb_pos)
    mask = cover[..., None].astype(jnp.float32)
    return mask, tex[..., 0:3], tex[..., 3:6]
