"""Frame-parallel seq-stage optimization (the rebuild's headline TPU win).

The reference optimizes video frames strictly serially
(/root/reference/train.py:1921-1926: <=20 frames x 300-1000 inner iters on
one GPU). After the shared template is built, per-frame refinement is
embarrassingly parallel EXCEPT that the reference shares the ``nonrigid``
MLP weights across frames, warm-starting each frame from the previous one
(SURVEY §5 flags this as the parallelization design decision).

Design chosen here: **per-frame parameter replicas**. Every frame gets its
own copy of the trainable seq-stage params (nonrigid / fix_code / cond /
material / light), initialized from the shared post-split state, and all
frames optimize simultaneously — a batched optimization vmapped over the
frame axis and sharded over the device mesh. XLA turns the sharded vmap
into per-device independent programs with zero collectives in the hot loop
(nothing to communicate — ideal ICI behavior). Wall-clock becomes
max(iters) instead of sum(iters): ~Nx on N chips.

The serial warm-start behavior remains available through
train/stages.py:run_seq_stage for exact-parity runs.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from d3human_tpu.config import Config
from d3human_tpu.models.geometry import GeometryModel, SeqTemplate
from d3human_tpu.parallel.mesh import (
    make_frame_mesh, put_sharded, replicated, shard_leading,
)
from d3human_tpu.train import losses as L
from d3human_tpu.train.optim import make_optimizer, resolve_lrs
from d3human_tpu.train.step import _post_step


def replicate_for_frames(tree, n_frames: int):
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_frames,) + x.shape), tree)


def make_parallel_seq_runner(
    model: GeometryModel,
    tex_module,
    perceptual,
    perc_params,
    template: SeqTemplate,
    cfg: Config,
    n_frames: int,
    n_iters: int,
    mesh=None,
    raster_opts: Optional[dict] = None,
):
    """Returns run(params, stacked_targets, key) -> (per-frame params,
    stacked metrics). ``stacked_targets`` has a leading [n_frames] axis and
    is sharded over the mesh's 'frames' axis; params are replicated
    per-frame and sharded the same way."""
    mesh = mesh or make_frame_mesh()
    lr_pos, lr_mat, lr_lgt = resolve_lrs(cfg.optim.learning_rate)
    tx = make_optimizer("seq", lr_pos, lr_mat, lr_lgt, cfg.optim.warmup_iter,
                        cfg.optim.hashgrid_grad_scale,
                        cfg.optim.light_grad_scale)

    def optimize_one_frame(consts, params, target, key):
        """Full n_iters optimization of ONE frame as a lax.scan."""
        bound = model.bind(consts["model"])
        tmpl = consts["template"]
        opt_state = tx.init(params)

        def step(carry, it):
            params, opt_state = carry

            def loss_fn(p):
                out = L.tick_seq(
                    jax.random.fold_in(key, it), bound, p["geometry"],
                    p["pose"], tex_module, p["material"], perceptual,
                    perc_params, tmpl, target, it, cfg, raster_opts)
                return out["total"], out

            (total, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = _post_step(params, model)
            return (params, opt_state), total

        (params, _), totals = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_iters))
        return params, totals

    frames_sharding = shard_leading(mesh, mesh.axis_names[0])
    repl = replicated(mesh)
    consts = {"model": model.consts(), "template": template}

    @functools.partial(
        jax.jit,
        in_shardings=(frames_sharding, frames_sharding, None, repl),
        out_shardings=(frames_sharding, frames_sharding))
    def run(per_frame_params, stacked_targets, key, consts):
        keys = jax.random.split(key, n_frames)
        return jax.vmap(optimize_one_frame,
                        in_axes=(None, 0, 0, 0))(
            consts, per_frame_params, stacked_targets, keys)

    def launch(shared_params, stacked_targets, key):
        per_frame = replicate_for_frames(shared_params, n_frames)
        per_frame = put_sharded(per_frame, frames_sharding)
        stacked_targets = put_sharded(stacked_targets, frames_sharding)
        consts_dev = put_sharded(consts, repl)
        return run(per_frame, stacked_targets, key, consts_dev)

    return launch, mesh


def make_dp_step(step_single: Callable, mesh=None, axis: str = "data"):
    """Replicated-grad data parallelism for the init/split stages: batch the
    target over `axis`, mean the per-example losses — XLA inserts the psum.
    (The reference's NCCL path never did this; SURVEY §2.4.)"""
    mesh = mesh or make_frame_mesh(axis=axis)
    batch_sharding = shard_leading(mesh, axis)
    repl = replicated(mesh)

    @functools.partial(jax.jit,
                       in_shardings=(repl, batch_sharding, None),
                       out_shardings=(repl, repl))
    def dp_step(state, stacked_targets, key):
        # loss averaged over the sharded batch => gradients all-reduce
        return step_single(state, stacked_targets, key)

    return dp_step, mesh, batch_sharding
