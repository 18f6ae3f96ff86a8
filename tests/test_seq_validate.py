"""Seq-stage per-frame validation strips: run_seq_stage with tex_module
writes a 3-row per-part opt-vs-ref matrix per completed frame plus
union/part metrics (ref validate_itr_all, /root/reference/train.py:441-537;
mask decomposition via mesh_id, ref hmsdf.py:788-798)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.train.stages import run_seq_stage
from d3human_tpu.train.step import TrainState, make_train_step
from d3human_tpu.train.validate import validate_seq_stage
from tests.test_seq_resume import _seq_setup


def test_seq_stage_validation_strip(tmp_path):
    cfg, scene, model, tex, perceptual, perc_params, params, template = \
        _seq_setup()
    cfg = dataclasses.replace(cfg, stages=dataclasses.replace(
        cfg.stages, seq_max_frames=1, seq_iters_first=1))
    tx, step_fn = make_train_step("seq", model, tex, perceptual, perc_params,
                                  cfg, template=template)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    out = str(tmp_path / "seq")
    # step_fn donates state buffers; keep the returned state for reuse below
    state = run_seq_stage(state, step_fn, template, scene.frame_target,
                          n_frames=1, cfg=cfg, save_path=out,
                          key=jax.random.PRNGKey(0), model=model,
                          tex_module=tex)
    strip_path = os.path.join(out, "validate", "seq_frame0000.png")
    assert os.path.exists(strip_path)

    # direct call: strip shape = 3 rows x 7 panels; metrics carry the
    # union + per-part numbers
    target = scene.frame_target(0)
    strip, metrics = validate_seq_stage(
        jax.random.PRNGKey(1), model, state.params, tex, template, target,
        cfg)
    H, W = cfg.render.train_res
    assert strip.shape == (3 * H, 7 * W, 3)
    assert np.isfinite(strip).all()
    for k in ("psnr", "mask_iou", "cloth_iou", "body_iou"):
        assert k in metrics, k
    assert 0.0 <= metrics["mask_iou"] <= 1.0
    # the part masks partition the union coverage: cloth+body IoU vs their
    # own masks must both be defined, and the union IoU is >= each part's
    # IoU against the union mask by construction (sanity, not tightness)
    assert 0.0 <= metrics["cloth_iou"] <= 1.0
    assert 0.0 <= metrics["body_iou"] <= 1.0
