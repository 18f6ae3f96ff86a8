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
                        cfg.optim.light_grad_scale,
                        geo_clip_norm=cfg.optim.clip_max_norm)

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

    def prepare(shared_params, stacked_targets, key):
        per_frame = replicate_for_frames(shared_params, n_frames)
        per_frame = put_sharded(per_frame, frames_sharding)
        stacked_targets = put_sharded(stacked_targets, frames_sharding)
        consts_dev = put_sharded(consts, repl)
        return (per_frame, stacked_targets, key, consts_dev)

    def launch(shared_params, stacked_targets, key):
        return run(*prepare(shared_params, stacked_targets, key))

    # AOT surface (scripts/multichip_scale.py): lower/compile the sharded
    # program without executing, for per-device memory_analysis at scale
    launch.jit_run = run
    launch.prepare = prepare
    return launch, mesh


def make_dp_train_step(
    stage: str,
    model: GeometryModel,
    tex_module,
    perceptual,
    perc_params,
    cfg: Config,
    template: Optional[SeqTemplate] = None,
    raster_opts: Optional[dict] = None,
    mesh=None,
    axis: str = "data",
):
    """Replicated-grad data parallelism for the init/split stages — the
    functional replacement for the reference's vestigial NCCL path
    (/root/reference/train.py:1646-1655, which inits a process group and
    never wraps the model; SURVEY §2.4).

    Params/optimizer state are replicated over the mesh; the target batch is
    sharded over `axis`. The per-example stage loss is vmapped over the batch
    and MEANED, so jax.grad of the meaned loss produces replica-mean
    gradients — XLA inserts the all-reduce (psum over ICI) automatically from
    the sharding annotations. One optimizer step with those mean grads is
    bit-identical to serial gradient averaging.

    Returns (dp_step, mesh, batch_sharding):
      dp_step(state, stacked_targets, keys) -> (state, batched aux)
    where stacked_targets / keys have a leading [B] axis (B divisible by the
    mesh size).
    """
    from d3human_tpu.train.optim import make_optimizer, resolve_lrs
    from d3human_tpu.train.step import make_stage_loss_fn

    mesh = mesh or make_frame_mesh(axis=axis)
    batch_sharding = shard_leading(mesh, axis)
    repl = replicated(mesh)

    lr_pos, lr_mat, lr_lgt = resolve_lrs(cfg.optim.learning_rate)
    tx = make_optimizer(stage, lr_pos, lr_mat, lr_lgt, cfg.optim.warmup_iter,
                        cfg.optim.hashgrid_grad_scale,
                        cfg.optim.light_grad_scale)
    loss_fn = make_stage_loss_fn(stage, tex_module, perceptual, perc_params,
                                 cfg, raster_opts)
    consts = {"model": model.consts(), "template": template}

    @functools.partial(
        jax.jit,
        in_shardings=(repl, batch_sharding, batch_sharding, repl),
        out_shardings=(repl, batch_sharding))
    def _dp_step(state, stacked_targets, keys, consts):
        bound = model.bind(consts["model"])
        tmpl = consts["template"]

        def mean_loss(params):
            def one(target, key):
                return loss_fn(bound, tmpl, params, target, state.step, key)

            totals, aux = jax.vmap(one)(stacked_targets, keys)
            return jnp.mean(totals), aux

        (_, aux), grads = jax.value_and_grad(
            mean_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _post_step(params, model)
        from d3human_tpu.train.step import TrainState
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, aux

    def dp_step(state, stacked_targets, keys):
        return _dp_step(state, stacked_targets, keys, consts)

    return dp_step, tx, mesh, batch_sharding
