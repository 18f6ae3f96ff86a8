"""Per-frame resume of the serial seq driver: a relaunched run must skip
completed frames (their post-frame state checkpoint is the completion
marker) and warm-start from the last one, instead of re-optimizing from
frame 0 (the reference restarts seq from scratch on interruption,
train.py:1921-1926 — our watchdog-resume flow requires better)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from d3human_tpu.models.geometry import SeqTemplate
from d3human_tpu.ops.mesh_ops import find_connected_faces
from d3human_tpu.train.stages import run_seq_stage
from d3human_tpu.train.step import TrainState, make_train_step


def _seq_setup():
    cfg, scene, model, tex, perceptual, perc_params, params = \
        ge._small_setup(n_frames=3)
    cfg = dataclasses.replace(cfg, stages=dataclasses.replace(
        cfg.stages, seq_iters_first=2, seq_iters_rest=1, seq_max_frames=3,
        log_interval=1))
    v = np.asarray(scene.model.v_template)
    f = np.asarray(scene.model.faces)
    labels = scene.garment_faces
    vl = np.zeros(len(v), np.int64)
    vl[np.unique(f[labels == 1])] = 1
    connected, _ = find_connected_faces(f)
    template = SeqTemplate(
        v=jnp.asarray(v), f=jnp.asarray(f, jnp.int32),
        v_labels=jnp.asarray(vl),
        face_labels=jnp.asarray(labels, jnp.int32),
        body_vidx=jnp.asarray(np.nonzero(vl == 0)[0], jnp.int32),
        cloth_vidx=jnp.asarray(np.nonzero(vl == 1)[0], jnp.int32),
        body_f=jnp.asarray(f[labels == 0], jnp.int32),
        connected_faces=jnp.asarray(connected, jnp.int32),
    )
    return cfg, scene, model, tex, perceptual, perc_params, params, template


def test_run_seq_stage_per_frame_resume(tmp_path):
    cfg, scene, model, tex, perceptual, perc_params, params, template = \
        _seq_setup()
    tx, step_fn = make_train_step("seq", model, tex, perceptual, perc_params,
                                  cfg, template=template)

    def fresh_state():
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    out = str(tmp_path / "seq")
    # run A: frames 0..1 only
    cfg_a = dataclasses.replace(cfg, stages=dataclasses.replace(
        cfg.stages, seq_max_frames=2))
    state_a = run_seq_stage(fresh_state(), step_fn, template,
                            scene.frame_target, n_frames=3, cfg=cfg_a,
                            save_path=out, key=jax.random.PRNGKey(0),
                            model=model)
    for fr in range(2):
        assert os.path.exists(os.path.join(out, "delta", f"{fr}.npz")), fr
        assert os.path.exists(
            os.path.join(out, "ckp", f"state_frame{fr}.npz")), fr
    mtimes = {fr: os.path.getmtime(os.path.join(out, "delta", f"{fr}.npz"))
              for fr in range(2)}

    # run B: fresh state, full 3-frame budget -> must resume at frame 2,
    # warm-started from run A's post-frame-1 state. Inflating frame 0's
    # budget makes the step counter a resume discriminator: no-resume would
    # run 9+1+1 = 11 steps, resume runs A's 3 + frame 2's 1 = 4.
    cfg_b = dataclasses.replace(cfg, stages=dataclasses.replace(
        cfg.stages, seq_iters_first=9))
    state_b = run_seq_stage(fresh_state(), step_fn, template,
                            scene.frame_target, n_frames=3, cfg=cfg_b,
                            save_path=out, key=jax.random.PRNGKey(0),
                            model=model)
    assert os.path.exists(os.path.join(out, "delta", "2.npz"))
    for fr in range(2):  # completed frames untouched
        assert os.path.getmtime(
            os.path.join(out, "delta", f"{fr}.npz")) == mtimes[fr], fr
    assert int(state_a.step) == 3
    assert int(state_b.step) == 4, "resume must warm-start from run A's state"
