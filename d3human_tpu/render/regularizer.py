"""Image/material-space regularizers.

Functional JAX equivalents of /root/reference/render/regularizer.py:
chroma_loss:22, shading_loss:29, material_smoothness_grad:47,
laplace_regularizer_const:78, normal_consistency:102. The smoothness
"grad" inputs (kd_grad/ks_grad/normal_grad) are produced by the shader's
jittered texture taps (see render/pipeline.py), mirroring the reference's
dr.texture jitter sampling (ref render/render.py:68-109).
"""

from __future__ import annotations

import jax.numpy as jnp

from d3human_tpu.ops.image_loss import rgb_to_srgb


def _luma(x):
    return (x[..., 0:1] + x[..., 1:2] + x[..., 2:3]) / 3


def _value(x):
    return jnp.max(x[..., 0:3], axis=-1, keepdims=True)


def chroma_loss(kd: jnp.ndarray, color_ref: jnp.ndarray,
                lambda_chroma: float) -> jnp.ndarray:
    eps = 0.001
    ref_chroma = color_ref[..., 0:3] / jnp.clip(_value(color_ref), eps)
    opt_chroma = kd[..., 0:3] / jnp.clip(_value(kd), eps)
    return jnp.mean(
        jnp.abs((opt_chroma - ref_chroma) * color_ref[..., 3:])) * lambda_chroma


def shading_loss(diffuse_light, specular_light, color_ref,
                 lambda_diffuse: float, lambda_specular: float) -> jnp.ndarray:
    eps = 0.001
    dl = _luma(diffuse_light)
    sl = _luma(specular_light)
    ref = _value(color_ref)
    img = rgb_to_srgb(jnp.log(jnp.clip((dl + sl) * color_ref[..., 3:],
                                       0.0, 65535.0) + 1))
    tgt = rgb_to_srgb(jnp.log(jnp.clip(ref * color_ref[..., 3:],
                                       0.0, 65535.0) + 1))
    loss = jnp.mean(jnp.abs(img - tgt)) * lambda_diffuse
    loss += (jnp.mean(sl) / jnp.clip(jnp.mean(dl), eps)) * lambda_specular
    return loss


def material_smoothness_grad(kd_grad, ks_grad, nrm_grad,
                             lambda_kd=0.25, lambda_ks=0.1,
                             lambda_nrm=0.0) -> jnp.ndarray:
    kd_luma = (kd_grad[..., 0] + kd_grad[..., 1] + kd_grad[..., 2]) / 3
    loss = jnp.mean(kd_luma * kd_grad[..., -1]) * lambda_kd
    loss += jnp.mean(ks_grad[..., :-1] * ks_grad[..., -1:]) * lambda_ks
    loss += jnp.mean(nrm_grad[..., :-1] * nrm_grad[..., -1:]) * lambda_nrm
    return loss


def material_smoothness_compact(stats: dict, lambda_kd=0.25, lambda_ks=0.1,
                                lambda_nrm=0.0) -> jnp.ndarray:
    """``material_smoothness_grad`` evaluated on the compacted-pixel stats
    from render_mesh_compact: the full-image means reduce to
    sum-over-covered / npix (uncovered pixels contribute zero there), with
    the 1/jitter_subsample subsample rescaled to the same expectation."""
    npix = stats["npix"]
    ss = stats["jitter_subsample"]
    kd_luma = jnp.sum(stats["kd_grad"], axis=-1) / 3.0
    loss = jnp.sum(kd_luma) * ss / npix * lambda_kd
    loss += jnp.sum(stats["ks_grad"]) * ss / (npix * 3) * lambda_ks
    loss += jnp.sum(stats["nrm_grad"]) * ss / (npix * 3) * lambda_nrm
    return loss
