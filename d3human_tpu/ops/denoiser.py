"""Bilateral (SVGF-style) denoiser.

JAX replacement for the reference's CUDA bilateral filter
(/root/reference/render/optixutils/c_src/denoising.cu driven by
denoiser/denoiser.py:21-35): a cross-bilateral blur of the shaded buffer
guided by normal and depth similarity, with an iteration-ramped sigma
(``set_influence``, ref geometry/hmsdf.py:817-818). At runtime the reference
never reaches it (the env-shading branch is dead, SURVEY §2 quirks) but it
is part of the component inventory and becomes live with the PBR path.

Implementation: fixed window gather formulated as a stack of shifted images
(XLA fuses the weighted sum); differentiable like the CUDA fwd/bwd pair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilateral_denoise(
    color: jnp.ndarray,     # [H, W, 3]
    normal: jnp.ndarray,    # [H, W, 3]
    depth: jnp.ndarray,     # [H, W, 1] (z and optionally z-gradient)
    sigma: float = 2.0,
    window: int = 7,
    sigma_n: float = 0.25,
    sigma_z: float = 0.1,
) -> jnp.ndarray:
    half = window // 2
    H, W = color.shape[:2]
    pad = ((half, half), (half, half), (0, 0))
    cp = jnp.pad(color, pad, mode="edge")
    np_ = jnp.pad(normal, pad, mode="edge")
    zp = jnp.pad(depth[..., :1], pad, mode="edge")

    acc = jnp.zeros_like(color)
    wacc = jnp.zeros((H, W, 1))
    for dy in range(window):
        for dx in range(window):
            w_s = jnp.exp(-((dy - half) ** 2 + (dx - half) ** 2)
                          / (2.0 * sigma ** 2))
            c = cp[dy:dy + H, dx:dx + W]
            n = np_[dy:dy + H, dx:dx + W]
            z = zp[dy:dy + H, dx:dx + W]
            w_n = jnp.exp(-jnp.sum((n - normal) ** 2, -1, keepdims=True)
                          / (2.0 * sigma_n ** 2))
            w_z = jnp.exp(-((z - depth[..., :1]) ** 2)
                          / (2.0 * sigma_z ** 2))
            w = w_s * w_n * w_z
            acc = acc + c * w
            wacc = wacc + w
    return acc / jnp.maximum(wacc, 1e-8)


class BilateralDenoiser:
    """Stateful wrapper with the reference's influence ramp
    (sigma ramps with training progress, ref denoiser.py:26-35)."""

    def __init__(self, influence: float = 1.0, sigma_max: float = 2.0):
        self.sigma_max = sigma_max
        self.influence = influence

    def set_influence(self, factor: float) -> None:
        self.influence = factor

    def __call__(self, color, normal, depth):
        sigma = max(self.sigma_max * self.influence, 1e-3)
        return bilateral_denoise(color, normal, depth, sigma=sigma)
