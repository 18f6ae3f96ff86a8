"""Trainable lat-long HDR environment light.

Functional redesign of /root/reference/render/light.py:21-105: the probe is a
[H, W, 3] parameter; the importance-sampling PDF/CDF tables (rows/cols
cumulative sums scaled by sin(theta)) are recomputed as pure functions. In
the reference pipeline the env light is optimized and checkpointed every
stage even though the OptiX shading branch that consumes it is dead at
runtime (render/render.py:120 forces kd) — we keep the same surface for
parity and for the future PBR path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = dict

LIGHT_MIN_RES = 16
MIN_ROUGHNESS = 0.08
MAX_ROUGHNESS = 0.5


def create_trainable_env(key, base_res: int = 256, scale: float = 0.0,
                         bias: float = 0.5) -> Params:
    """ref light.py:102-105 (scale=0, bias=0.5 at train.py:1739)."""
    base = jax.random.uniform(key, (base_res, base_res, 3)) * scale + bias
    return {"base": base}


def update_pdf(params: Params) -> Dict[str, jnp.ndarray]:
    """Luminance PDF + row/col CDFs for importance sampling
    (ref light.py:46-59). Pure: returns {pdf, rows, cols}."""
    base = jax.lax.stop_gradient(params["base"])
    H, W = base.shape[:2]
    y = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    pdf = jnp.max(base, axis=-1) * jnp.sin(y * jnp.pi)[:, None]
    pdf = pdf / jnp.maximum(jnp.sum(pdf), 1e-12)
    cols = jnp.cumsum(pdf, axis=1)
    rows = jnp.cumsum(jnp.repeat(cols[:, -1:], W, axis=1), axis=0)
    cols = cols / jnp.where(cols[:, -1:] > 0, cols[:, -1:], 1.0)
    rows = rows / jnp.where(rows[-1:, :] > 0, rows[-1:, :], 1.0)
    return {"pdf": pdf, "rows": rows, "cols": cols}


def sample_latlong(params: Params, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear probe lookup for world directions [..., 3] (y-up lat-long)."""
    base = params["base"]
    H, W = base.shape[:2]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    u = (jnp.arctan2(d[..., 0], -d[..., 2]) / (2 * jnp.pi) + 0.5) * W - 0.5
    v = (jnp.arccos(jnp.clip(d[..., 1], -1, 1)) / jnp.pi) * H - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu, fv = u - u0, v - v0
    u0 = jnp.mod(u0.astype(jnp.int32), W)
    u1 = jnp.mod(u0 + 1, W)
    v0 = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    v1 = jnp.clip(v0 + 1, 0, H - 1)
    c = (base[v0, u0] * ((1 - fu) * (1 - fv))[..., None]
         + base[v0, u1] * (fu * (1 - fv))[..., None]
         + base[v1, u0] * ((1 - fu) * fv)[..., None]
         + base[v1, u1] * (fu * fv)[..., None])
    return c


def clamp_(params: Params, min_val: float = 1e-4) -> Params:
    """Post-step clamp (ref train.py:786: light of 0 kills gradients)."""
    return {"base": jnp.maximum(params["base"], min_val)}


def generate_image(params: Params, res: Tuple[int, int]) -> jnp.ndarray:
    """Resampled probe image for checkpoints/visualization
    (ref light.py:62-64)."""
    base = params["base"]
    H, W = base.shape[:2]
    h, w = res
    yy = (jnp.arange(h) + 0.5) / h * H - 0.5
    xx = (jnp.arange(w) + 0.5) / w * W - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    fy = (yy - y0)[:, None, None]
    fx = (xx - x0)[None, :, None]
    return (base[y0][:, x0] * (1 - fy) * (1 - fx)
            + base[y0][:, x1] * (1 - fy) * fx
            + base[y1][:, x0] * fy * (1 - fx)
            + base[y1][:, x1] * fy * fx)
