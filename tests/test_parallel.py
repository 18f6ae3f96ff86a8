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
