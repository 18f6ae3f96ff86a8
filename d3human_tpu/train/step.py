"""Jitted training steps.

Each stage's full iteration — field eval, G-Shell extraction, LBS, raster,
shade, losses, backward, three-group Adam update, post-step clamps — is ONE
compiled XLA program (the reference spreads this over dozens of CUDA/GL/
OptiX launches per iteration, /root/reference/train.py:679-790).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from d3human_tpu.config import Config
from d3human_tpu.models.geometry import GeometryModel, SeqTemplate
from d3human_tpu.models.perceptual import ConvPerceptual
from d3human_tpu.render import light as light_mod
from d3human_tpu.train import losses as L
from d3human_tpu.train.optim import make_optimizer, resolve_lrs


class TrainState(NamedTuple):
    params: dict          # {geometry, pose, material, light}
    opt_state: object
    step: jnp.ndarray


def init_state(stage: str, params: dict, cfg: Config):
    lr_pos, lr_mat, lr_lgt = resolve_lrs(cfg.optim.learning_rate)
    if stage == "init":
        lr_pos *= cfg.optim.init_lr_scale
    tx = make_optimizer(stage, lr_pos, lr_mat, lr_lgt,
                        cfg.optim.warmup_iter,
                        cfg.optim.hashgrid_grad_scale,
                        cfg.optim.light_grad_scale,
                        geo_clip_norm=cfg.optim.clip_max_norm,
                        sdf_lr_mult=cfg.optim.sdf_lr_mult)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def _post_step(params: dict, model: GeometryModel) -> dict:
    """Post-step clamps (ref train.py:773-788 + hmsdf clamp_deform)."""
    out = dict(params)
    out["geometry"] = model.clamp_params(params["geometry"])
    if "light" in params and params["light"] is not None:
        out["light"] = light_mod.clamp_(params["light"])
    return out


def make_stage_loss_fn(stage: str, tex_module, perceptual: ConvPerceptual,
                       perc_params, cfg: Config,
                       raster_opts: Optional[dict] = None):
    """The per-example loss for a stage:
    loss_fn(bound_model, template, params, target, it, key) -> (total, aux).
    Shared by the single-example step and the DP (batched) step."""

    def loss_fn(bound_model, tmpl, params, target, it, key):
        g = params["geometry"]
        pose = params["pose"]
        mat = params["material"]
        if stage == "init":
            out = L.tick_init(key, bound_model, g, pose, tex_module, mat,
                              perceptual, perc_params, target, it, cfg,
                              raster_opts)
        elif stage == "split":
            out = L.tick_split(key, bound_model, g, pose, tex_module, mat,
                               perceptual, perc_params, target, it, cfg,
                               raster_opts)
        elif stage == "seq":
            out = L.tick_seq(key, bound_model, g, pose, tex_module, mat,
                             perceptual, perc_params, tmpl, target, it,
                             cfg, raster_opts)
        else:
            raise ValueError(stage)
        return out["total"], out

    return loss_fn


def make_train_step(stage: str, model: GeometryModel, tex_module,
                    perceptual: ConvPerceptual, perc_params, cfg: Config,
                    template: Optional[SeqTemplate] = None,
                    raster_opts: Optional[dict] = None,
                    donate: bool = True):
    """Returns (state, tx, step_fn). step_fn(state, target, key) ->
    (state, metrics)."""
    lr_pos, lr_mat, lr_lgt = resolve_lrs(cfg.optim.learning_rate)
    if stage == "init":
        lr_pos *= cfg.optim.init_lr_scale
    tx = make_optimizer(stage, lr_pos, lr_mat, lr_lgt,
                        cfg.optim.warmup_iter,
                        cfg.optim.hashgrid_grad_scale,
                        cfg.optim.light_grad_scale,
                        geo_clip_norm=cfg.optim.clip_max_norm,
                        sdf_lr_mult=cfg.optim.sdf_lr_mult)
    loss_fn = make_stage_loss_fn(stage, tex_module, perceptual, perc_params,
                                 cfg, raster_opts)

    # Large static data (grid topology, SMPL-X tables, canonical state,
    # seq template) enters the jit as ARGUMENTS — never as HLO constants.
    consts = {"model": model.consts(), "template": template}

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def _step(state: TrainState, target, key, consts):
        bound = model.bind(consts["model"])
        (total, aux), grads = jax.value_and_grad(
            loss_fn, argnums=2, has_aux=True)(
                bound, consts["template"], state.params, target, state.step,
                key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _post_step(params, model)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        if stage == "split":
            # per-iter mSDF gradient telemetry (r4 verdict diagnostic): the
            # garment/body boundary only moves if gradient actually reaches
            # the mSDF field (through the rendered-msdf hinges, the mesh
            # open/close regs, and AA silhouette gradients via boundary
            # vertex positions). A ~0 norm here while cloth IoU stalls
            # localizes the failure to the gradient path, not the optimizer.
            gm = grads["geometry"]["msdf"]
            aux = dict(aux)
            aux["msdf_grad_norm"] = jnp.sqrt(jnp.sum(gm * gm))
            aux["msdf_grad_absmax"] = jnp.max(jnp.abs(gm))
        return new_state, aux

    def step_fn(state, target, key):
        return _step(state, target, key, consts)

    # expose the raw jit + consts so callers can AOT-lower with abstract
    # shapes (train_d3h.py precompile_async): the SAME jit object (same
    # donation) guarantees the persistent-cache key matches the real call
    step_fn.jitted = _step
    step_fn.consts = consts
    return tx, step_fn
