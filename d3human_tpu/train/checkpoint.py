"""Checkpoint / resume.

The reference saves per-stage torch state dicts + HDR probe + SMPL-X pose
npz every `save_checkpoint_interval` iters and restores them size-filtered
(/root/reference/train.py:812-832 save, :284-331 load). Here the whole
TrainState params pytree serializes to a single npz per checkpoint (flat
path-keyed arrays) — shape-filtered on load exactly like
``load_filtered_state_dict`` so stage-to-stage surface changes don't break
resume. Orbax is available for async multi-host checkpointing; the npz
format stays the canonical stage-artifact interchange (file-mediated DAG,
SURVEY §5).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat}


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(params))


def load_params(path: str, params_template):
    """Restore into the template's structure; entries missing from the file
    or with mismatched shapes keep the template's value (size-filtered load,
    ref train.py:284-289)."""
    with np.load(path) as z:
        stored = dict(z)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    new_leaves = []
    for pathkey, value in leaves:
        key = jax.tree_util.keystr(pathkey)
        if key in stored and stored[key].shape == value.shape:
            new_leaves.append(jax.numpy.asarray(stored[key], value.dtype))
        else:
            new_leaves.append(value)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template), new_leaves)


def pretrain_cache_paths(cfg, cache_dir: str = os.path.join("out", "cache"),
                         crop_box=None):
    """Canonical cache filenames for the two one-off pretrains, keyed by
    everything that determines their result (grid incl. the
    subject-dependent crop box, step counts, seed). ``crop_box`` is the
    ((lo3),(hi3)) world-coord crop actually applied to the lattice — its
    content hash enters the key so two subjects (different template bboxes)
    sharing a cache_dir can never hit each other's pretrain."""
    g = cfg.geometry
    crop = ""
    if g.grid_crop > 0 or crop_box is not None:
        crop = f"_crop{g.grid_crop:g}"
        if crop_box is not None:
            import hashlib

            h = hashlib.sha1(np.asarray(crop_box, np.float64).tobytes()
                             ).hexdigest()[:8]
            crop += f"_b{h}"
    key = f"{g.grid_res}x{g.grid_scale}"
    if g.grid_y_offset:
        key += f"y{g.grid_y_offset:g}"
    pcache = os.path.join(
        cache_dir, f"sdf_pretrain_g{key}{crop}"
        f"_s{cfg.stages.sdf_mlp_pretrain_steps}_seed{cfg.seed}.npz")
    ncache = os.path.join(
        cache_dir, f"nonrigid_zero_s{cfg.stages.sdf_deform_pretrain_steps}"
        f"_seed{cfg.seed}.npz")
    return pcache, ncache


def cached_sdf_pretrain(model, gparams, steps: int, cache_path: str,
                        gt_sdf=None):
    """Disk-cached SDF-MLP pretraining (ref hmsdf.py:251-253 caches the
    pretrained net and skips the 3000-step fit when present). Stores ONLY
    the sdf_net subtree so the caller's fresh msdf/deform/cond inits are
    preserved (the init stage re-pretrains after reinit_fields, ref
    train.py:1802-1803). Returns (gparams, loss_or_None)."""
    if cache_path and os.path.exists(cache_path):
        print(f"[pretrain] cached sdf_net <- {cache_path}", flush=True)
        out = dict(gparams)
        out["sdf_net"] = load_params(cache_path, gparams["sdf_net"])
        return out, None
    if gt_sdf is None:
        gt_sdf = model.smpl_template_sdf()
    gparams, ploss = model.pretrain_sdf(gparams, gt_sdf, steps=steps)
    if cache_path:
        save_params(cache_path, gparams["sdf_net"])
    return gparams, ploss


def save_state(path: str, state) -> None:
    """Serialize a full TrainState (params + optimizer moments + step) so a
    resumed run is bit-identical to the uninterrupted one (stronger than the
    reference's params-only checkpoints, ref train.py:812-832)."""
    save_params(path, {"params": state.params,
                       "opt_state": state.opt_state,
                       "step": state.step})


def load_state(path: str, state_template):
    """Restore a TrainState saved by ``save_state``. The template (a fresh
    TrainState from tx.init) supplies the pytree structure; stored arrays are
    shape-filtered in exactly like ``load_params``."""
    tree = load_params(path, {"params": state_template.params,
                              "opt_state": state_template.opt_state,
                              "step": state_template.step})
    return state_template._replace(params=tree["params"],
                                   opt_state=tree["opt_state"],
                                   step=tree["step"])


def latest_checkpoint(ckpt_dir: str, prefix: str = "state_") -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir)
             if f.startswith(prefix) and f.endswith(".npz")]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len(prefix):-4]))
    return os.path.join(ckpt_dir, cands[-1])
