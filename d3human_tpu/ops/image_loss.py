"""HDR image losses with tonemapping, and sRGB conversions.

XLA-native replacement for the fused CUDA image-loss kernels
(/root/reference/render/renderutils/c_src/loss.cu and their python oracle
/root/reference/render/renderutils/loss.py:16-42): losses
{l1, mse, smape, relmse} x tonemappers {none, log_srgb}. XLA fuses the whole
tonemap+reduce chain into a couple of kernels, which is exactly what the
hand-written CUDA achieved.
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_rgb(f: jnp.ndarray) -> jnp.ndarray:
    """sRGB -> linear (ref render/util.py:94-110)."""
    return jnp.where(
        f <= 0.04045,
        f / 12.92,
        jnp.power((jnp.clip(f, 0.04045, None) + 0.055) / 1.055, 2.4),
    )


def rgb_to_srgb(f: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        f > 0.0031308,
        jnp.power(jnp.clip(f, 0.0031308, None), 1.0 / 2.4) * 1.055 - 0.055,
        12.92 * f,
    )


def _tonemap_log_srgb(f: jnp.ndarray) -> jnp.ndarray:
    """log then sRGB curve (ref renderutils/loss.py:16-18,31-33)."""
    f = jnp.log(jnp.clip(f, 0.0, 65535.0) + 1.0)
    return rgb_to_srgb(f)


def image_loss(img: jnp.ndarray, ref: jnp.ndarray,
               loss: str = "l1", tonemapper: str = "none") -> jnp.ndarray:
    if tonemapper == "log_srgb":
        img = _tonemap_log_srgb(img)
        ref = _tonemap_log_srgb(ref)
    if loss == "mse":
        return jnp.mean((img - ref) ** 2)
    if loss == "smape":
        return jnp.mean(jnp.abs(img - ref)
                        / (jnp.abs(img) + jnp.abs(ref) + 0.01))
    if loss == "relmse":
        return jnp.mean((img - ref) ** 2 / (img * img + ref * ref + 0.1))
    return jnp.mean(jnp.abs(img - ref))


def make_loss_fn(name: str):
    """ref train.py:75-87 createLoss."""
    table = {
        "smape": ("smape", "none"),
        "mse": ("mse", "none"),
        "logl1": ("l1", "log_srgb"),
        "logl2": ("mse", "log_srgb"),
        "relmse": ("relmse", "none"),
    }
    loss, tm = table[name]
    return lambda img, ref: image_loss(img, ref, loss=loss, tonemapper=tm)


def mse_to_psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def ssim(img0: jnp.ndarray, img1: jnp.ndarray, window: int = 11,
         sigma: float = 1.5, c1: float = 0.01 ** 2,
         c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Gaussian-window SSIM over NHWC images (capability parity with the
    reference's shipped ssim_loss.py:33-63; XLA lowers the separable blur to
    two small convs)."""
    import jax

    half = window // 2
    x = jnp.arange(window, dtype=jnp.float32) - half
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()

    def blur(im):
        # separable: along H then W, per channel
        im = jnp.moveaxis(im, -1, 0)  # C,H,W (after vmap over batch below)
        imh = jax.vmap(lambda c: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, g, mode="same"), 0, c))(im)
        imw = jax.vmap(lambda c: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, g, mode="same"), 1, c))(imh)
        return jnp.moveaxis(imw, 0, -1)

    if img0.ndim == 4:
        b = jax.vmap(blur)
    else:
        b = blur
    mu0, mu1 = b(img0), b(img1)
    s00 = b(img0 * img0) - mu0 * mu0
    s11 = b(img1 * img1) - mu1 * mu1
    s01 = b(img0 * img1) - mu0 * mu1
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)
