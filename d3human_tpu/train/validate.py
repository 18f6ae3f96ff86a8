"""Validation / visualization: side-by-side image strips.

Equivalent of the reference's validate_itr / validate_itr_all /
validate_all_mesh (/root/reference/train.py:358-537): renders the current
geometry against the target and tiles [opt RGB | ref RGB | masks | normals |
msdf] into one strip saved each save_interval. Mask-overlap composites use
the reference's red/green/yellow coding (ref combine_mask, train.py:337-356).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.config import Config
from d3human_tpu.models.geometry import GeometryModel, SeqTemplate
from d3human_tpu.ops.image_loss import rgb_to_srgb
from d3human_tpu.render.pipeline import MeshBuffers
from d3human_tpu.train.losses import render_stage_mesh


def combine_mask(ref: jnp.ndarray, opt: jnp.ndarray) -> jnp.ndarray:
    """red = ref only, green = opt only, yellow = both (ref train.py:337)."""
    a = ref[..., 0] > 0
    b = opt[..., 0] > 0
    img = jnp.zeros(ref.shape[:2] + (3,))
    img = img.at[..., 0].set(jnp.where(a, 1.0, 0.0))
    img = img.at[..., 1].set(jnp.where(b, 1.0, 0.0))
    return img


def _gray3(x):
    return jnp.repeat(x[..., :1], 3, axis=-1)


def _norm_display(n):
    n = n[..., :3] * jnp.asarray([1.0, -1.0, -1.0])
    return (n + 1.0) / 2.0


def validation_strip(buffers: MeshBuffers, target: Dict) -> np.ndarray:
    """One row of panels (ref validate_itr layout, train.py:424-438)."""
    panels = [
        rgb_to_srgb(jnp.clip(buffers.shaded[..., :3], 0, 1)),
        rgb_to_srgb(jnp.clip(target["all_img"][..., :3], 0, 1)),
        _gray3(buffers.shaded[..., 3:]),
        _gray3(target["all_img"][..., 3:]),
        _norm_display(buffers.geometric_normal),
        (target["all_normal"][..., :3] + 1.0) / 2.0,
        jnp.clip(_gray3(buffers.msdf_image), 0, 1),
        combine_mask(target["all_img"][..., 3:], buffers.shaded[..., 3:]),
    ]
    return np.asarray(jnp.concatenate(panels, axis=1))


def validate_stage(key, model: GeometryModel, params: Dict, tex_module,
                   target: Dict, cfg: Config, msdf_sign: float = 1.0,
                   raster_opts=None, return_buffers: bool = False):
    # consts MUST enter the jit as arguments — closing over the model bakes
    # the tet-grid arrays into the HLO as constants, and the axon remote
    # compile grinds/413s on the upload (hung the first full-scale parity
    # run for 45 minutes at the first validation)
    consts = model.consts()
    _, buffers = jax.jit(
        lambda c, g, p, m, t, k: render_stage_mesh(
            k, model.bind(c), g, p, tex_module, m, t, cfg,
            msdf_sign=msdf_sign, raster_opts=raster_opts, compact=False)
    )(consts, params["geometry"], params["pose"], params["material"],
      target, key)
    strip = validation_strip(buffers, target)
    if return_buffers:
        return strip, buffers
    return strip


def depth_display(buffers: MeshBuffers) -> np.ndarray:
    """Normalized depth panel (ref train.py:378-383)."""
    d = buffers.depth[..., :1]
    lo, hi = jnp.min(d), jnp.max(d)
    nd = (d - lo) / jnp.maximum(hi - lo, 1e-8)
    return np.asarray(jnp.nan_to_num(_gray3(nd)))
