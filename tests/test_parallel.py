"""Multi-device tests on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3human_tpu.parallel.mesh import make_frame_mesh, shard_leading


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_frame_mesh_sharding_roundtrip():
    mesh = make_frame_mesh(8)
    sh = shard_leading(mesh, "frames")
    x = jnp.arange(16.0).reshape(8, 2)
    xs = jax.device_put(x, sh)
    assert len(xs.addressable_shards) == 8
    y = jax.jit(lambda x: x * 2, in_shardings=sh, out_shardings=sh)(xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2)


def test_dryrun_multichip_8():
    """The driver's multi-chip validation path: full frame-parallel seq-stage
    training step over an 8-device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_dp_step_grads_equal_serial_mean():
    """Replicated-grad DP (SURVEY §2.4 deliverable): one dp_step over an
    8-example batch sharded on the 8-device mesh must produce the SAME
    updated params as a serial step with hand-averaged gradients."""
    import __graft_entry__ as ge
    import optax

    from d3human_tpu.parallel.frames import make_dp_train_step
    from d3human_tpu.train.step import (
        TrainState, _post_step, make_stage_loss_fn,
    )

    cfg, scene, model, tex, perceptual, perc_params, params = ge._small_setup()
    raster_opts = dict(tile=(8, 16), max_faces_per_tile=128, bin_expand=8,
                       max_global=128)
    B = 8
    dp_step, tx, mesh, _ = make_dp_train_step(
        "init", model, tex, perceptual, perc_params, cfg,
        raster_opts=raster_opts)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    targets = [scene.frame_target(i % scene.n_frames) for i in range(B)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *targets)
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    new_state, aux = dp_step(state, stacked, keys)
    assert aux["total"].shape == (B,)

    # serial oracle: mean of per-example grads, one optimizer step
    loss_fn = make_stage_loss_fn("init", tex, perceptual, perc_params, cfg,
                                 raster_opts)

    def one_grad(target, key):
        def f(p):
            return loss_fn(model, None, p, target, state.step, key)[0]

        return jax.grad(f)(state.params)

    grads = [jax.jit(one_grad)(t, k) for t, k in zip(targets, keys)]
    mean_grads = jax.tree.map(lambda *g: sum(g) / B, *grads)
    updates, _ = tx.update(mean_grads, state.opt_state, state.params)
    ref_params = _post_step(optax.apply_updates(state.params, updates), model)

    flat_a = jax.tree_util.tree_leaves_with_path(new_state.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(ref_params))
    for path, a in flat_a:
        b = flat_b[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_run_seq_stage_parallel_artifacts(tmp_path):
    """The frame-parallel seq CLI driver must write the serial driver's
    artifact format (delta/<f>.npz + fine_all_<f>.ply + loss_log) so parity
    tooling is driver-agnostic; regression for the per-frame export jit."""
    import dataclasses

    import __graft_entry__ as ge
    from d3human_tpu.models.geometry import SeqTemplate
    from d3human_tpu.ops.mesh_ops import find_connected_faces
    from d3human_tpu.train.stages import run_seq_stage_parallel

    cfg, scene, model, tex, perceptual, perc_params, params = \
        ge._small_setup(n_frames=2)
    cfg = dataclasses.replace(cfg, stages=dataclasses.replace(
        cfg.stages, seq_iters_first=2, seq_max_frames=3, log_interval=1))
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
    out = str(tmp_path / "seq")
    run_seq_stage_parallel(
        params, template, lambda i: scene.frame_target(i), n_frames=3,
        cfg=cfg, save_path=out, key=jax.random.PRNGKey(0), model=model,
        tex_module=tex, perceptual=perceptual, perc_params=perc_params,
        n_devices=2)
    import os
    for fr in range(3):
        assert os.path.exists(os.path.join(out, "delta", f"{fr}.npz")), fr
        assert os.path.exists(os.path.join(out, f"fine_all_{fr}.ply")), fr
    assert os.path.exists(os.path.join(out, "loss_log", "scalars.jsonl"))
