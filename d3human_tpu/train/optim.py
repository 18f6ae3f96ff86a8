"""Optimizers: per-group learning rates, schedules, gradient rescaling.

Replicates the reference's three-Adam setup and its load-bearing gradient
hacks with optax transforms:
  * geometry optimizer param groups & relative LRs per stage
    (init: /root/reference/train.py:599-614, split: :895-901,
    seq: :1296-1304) via optax.multi_transform over path labels;
  * material Adam (ref :619) and light Adam at 6x LR (ref :571,:588);
  * LambdaLR schedule: linear warmup then 10^(-(it-warmup)*2e-4)
    (ref :573-576);
  * light gradient x64 (ref :744-745) and hash-table gradient /8
    (ref :747-750) as gradient-scaling transforms keyed by path.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def lr_schedule(base_lr: float, warmup_iter: int) -> Callable:
    """ref train.py:573-576."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_iter, 1)
        decay = jnp.power(10.0, -(step - warmup_iter) * 0.0002)
        mult = jnp.where(step < warmup_iter, warm, jnp.maximum(decay, 0.0))
        return base_lr * mult

    return fn


def scale_selected_grads(path_pred: Callable[[tuple], bool], factor: float):
    """Gradient pre-scaling for params whose tree path matches path_pred."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        flat = jax.tree_util.tree_flatten_with_path(updates)
        paths_scaled = {
            jax.tree_util.keystr(p) for p, _ in flat[0]
            if path_pred(jax.tree_util.keystr(p))
        }

        def scale(path, u):
            return u * factor if jax.tree_util.keystr(path) in paths_scaled else u

        updates = jax.tree_util.tree_map_with_path(scale, updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Geometry param-group labeling per stage
# ---------------------------------------------------------------------------

def _geometry_label(stage: str, path_str: str) -> str:
    """Map a geometry-param tree path to its LR group.

    Groups follow the reference's name-substring matching:
      init  (ref :599-614): deform x1, sdf* x1e-2, others x1e-3;
             msdf & nonrigid excluded (frozen).
      split (ref :895-901): deform x1, msdf x1, nonrigid x1e-3, other x1e-2;
             sdf_net excluded (frozen).
      seq   (ref :1296-1304): nonrigid x1e-2, cond-ish x1e-2; rest frozen.
    """
    p = path_str
    if stage == "init":
        if "deform" in p and "nonrigid" not in p:
            return "x1"
        if "sdf_net" in p:
            return "xsdf"
        if "msdf" in p or "nonrigid" in p:
            return "frozen"
        return "x1e-3"
    if stage == "split":
        if "deform" in p and "nonrigid" not in p:
            return "x1"
        if "msdf" in p:
            return "x1"
        if "nonrigid" in p:
            return "x1e-3"
        if "sdf_net" in p:
            return "frozen"
        return "x1e-2"
    if stage == "seq":
        # ref train.py:1296-1304: ONLY 'nonrigid' and 'cond' name-matched
        # geometry params get an Adam in seq. Note 'fix_code' does NOT match
        # the reference's `'cond' in name` filter (code != cond) — it is
        # frozen in seq even though it conditions the nonrigid MLP.
        if "nonrigid" in p:
            return "x1e-2"
        if "cond" in p and "fix_code" not in p:
            return "x1e-2"
        return "frozen"
    raise ValueError(stage)


def make_optimizer(stage: str, lr_pos: float, lr_mat: float, lr_lgt: float,
                   warmup_iter: int, hashgrid_grad_scale: float = 0.125,
                   light_grad_scale: float = 64.0,
                   geo_clip_norm: float = 1.0,
                   sdf_lr_mult: float = 1e-2):
    """One optax optimizer over the full params tree
    {geometry, pose, material, light}. Top-level key + geometry path decide
    the group."""

    def label_tree(params):
        def label(path, _):
            ks = jax.tree_util.keystr(path)
            if ks.startswith("['pose']"):
                # SMPL-X pose tensors get an Adam in init/split
                # (ref train.py:601-609, :905-913) but NOT in seq
                # (ref train.py:1296-1304 optimizes only nonrigid+cond).
                return "geo_frozen" if stage == "seq" else "pose"
            if ks.startswith("['material']"):
                return "material"
            if ks.startswith("['light']"):
                return "light"
            return "geo_" + _geometry_label(stage, ks)

        return jax.tree_util.tree_map_with_path(label, params)

    def adam(lr_base, mult=1.0):
        return optax.adam(lr_schedule(lr_base * mult, warmup_iter), eps=1e-8)

    def geo_adam(lr_base, mult):
        # DOCUMENTED STABILIZATION DEVIATION: per-group global-norm gradient
        # clipping on the geometry groups. At full f3c scale the silhouette
        # AA gradients through the SDF MLP thrash n_cross (the live surface)
        # and can empty the field entirely — a dead equilibrium with no
        # recovery gradient (observed at iter ~350 of the first full-scale
        # init runs; the reference's torch run presumably sits in a gentler
        # basin). Clipping bounds the per-step field distortion without
        # changing any converged solution.
        if geo_clip_norm and geo_clip_norm > 0:
            return optax.chain(optax.clip_by_global_norm(geo_clip_norm),
                               adam(lr_base, mult))
        return adam(lr_base, mult)

    tx = optax.multi_transform(
        {
            "pose": adam(lr_pos, 1e-3),      # ref :601-609 SMPL-X params
            "material": optax.chain(
                scale_selected_grads(lambda p: "table" in p,
                                     hashgrid_grad_scale),   # ref :747-750
                adam(lr_mat),
            ),
            "light": optax.chain(
                scale_selected_grads(lambda p: True, light_grad_scale),
                adam(lr_lgt),                 # ref :744-745 + :588
            ),
            "geo_x1": geo_adam(lr_pos, 1.0),
            "geo_xsdf": geo_adam(lr_pos, sdf_lr_mult),  # init sdf_net group
            "geo_x1e-2": geo_adam(lr_pos, 1e-2),
            "geo_x1e-3": geo_adam(lr_pos, 1e-3),
            "geo_frozen": optax.set_to_zero(),
        },
        label_tree,
    )
    return tx


def resolve_lrs(learning_rate, pass_idx: int = 0):
    """ref train.py:568-571: optionally index by pass, then decompose into
    (pos, mat, lgt)."""
    lr = learning_rate
    if isinstance(lr, (list, tuple)):
        lr = lr[pass_idx] if pass_idx < len(lr) else lr[-1]
    if isinstance(lr, (list, tuple)):
        lr_pos = lr[0]
        lr_mat = lr[1] if len(lr) > 1 else lr[0]
        lr_lgt = lr[2] if len(lr) > 2 else lr[0] * 6.0
    else:
        lr_pos = lr_mat = lr
        lr_lgt = lr * 6.0
    return float(lr_pos), float(lr_mat), float(lr_lgt)
