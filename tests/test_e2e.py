"""End-to-end smoke test: synthetic body -> SDF pretrain -> init-stage
optimization steps with decreasing mask loss (SURVEY §4: the reference ships
no such test; this is the core regression gate for the rebuild)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3human_tpu.config import Config, GeometryConfig, RenderConfig, StageConfig, TextureConfig
from d3human_tpu.data.synthetic import make_scene
from d3human_tpu.models.geometry import GeometryModel
from d3human_tpu.models.perceptual import ConvPerceptual
from d3human_tpu.models.smplx.deformer import SMPLXDeformer
from d3human_tpu.models.texture import MLPTexture3D
from d3human_tpu.ops.tet_grid import make_tet_grid
from d3human_tpu.render import light as light_mod
from d3human_tpu.train.step import TrainState, make_train_step

RES = (48, 48)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        geometry=GeometryConfig(grid_res=12, max_verts=4096, max_tets=4096,
                                n_eikonal_samples=512),
        render=RenderConfig(train_res=RES, texture_res=RES, probe_res=16),
        texture=TextureConfig(n_levels=2, log2_hashmap_size=12,
                              internal_dims=16),
        stages=StageConfig(init_epoch=100, sdf_mlp_pretrain_steps=150),
    )
    # small field MLP for CPU test speed
    import dataclasses
    cfg = dataclasses.replace(
        cfg, field=dataclasses.replace(cfg.field, d_hidden=64, n_hidden=3,
                                       skip_in=(1,)))
    scene = make_scene(resolution=RES, n_frames=2)
    grid = make_tet_grid(res=12, bounds=((-0.6, -0.8, -0.4), (0.6, 0.8, 0.4)),
                         y_offset=0.0, scale=1.0)
    model = GeometryModel(cfg, grid, scene.deformer, scene.canon)
    key = jax.random.PRNGKey(0)
    gparams = model.init_params(key, n_images=scene.n_frames)
    # pretrain the SDF to the template body (ref hmsdf.py:215-273)
    gt_sdf = model.smpl_template_sdf()
    gparams, final_loss = model.pretrain_sdf(
        gparams, gt_sdf, steps=cfg.stages.sdf_mlp_pretrain_steps)
    return cfg, scene, model, gparams, float(final_loss)


def test_sdf_pretrain_converges(setup):
    cfg, scene, model, gparams, final_loss = setup
    assert final_loss < 0.01
    # extracted surface is non-empty and near the body
    mesh, sdf = jax.jit(model.extract)(gparams)
    assert int(mesh.n_cross) > 100
    assert int(mesh.n_cross) < cfg.geometry.max_verts


def test_init_stage_loss_decreases(setup):
    cfg, scene, model, gparams, _ = setup
    key = jax.random.PRNGKey(1)
    kt, kl, kp = jax.random.split(key, 3)

    mn = jnp.concatenate([jnp.asarray(cfg.render.kd_min[:3]),
                          jnp.asarray(cfg.render.ks_min)])
    mx = jnp.concatenate([jnp.asarray(cfg.render.kd_max[:3]),
                          jnp.asarray(cfg.render.ks_max)])
    tex = MLPTexture3D(cfg.texture, (mn, mx))
    perceptual = ConvPerceptual(channels=(8, 16, 24))
    perc_params = perceptual.init()

    params = {
        "geometry": gparams,
        "pose": scene.pose_params,
        "material": tex.init(kt),
        "light": light_mod.create_trainable_env(kl, cfg.render.probe_res),
    }
    # fixture arrays may have been donated by another test's step_fn
    params = jax.tree.map(jnp.array, params)
    tx, step_fn = make_train_step(
        "init", model, tex, perceptual, perc_params, cfg,
        raster_opts=dict(tile=(8, 16), max_faces_per_tile=256,
                         bin_expand=8, max_global=256))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))

    target = scene.frame_target(0)
    metrics = []
    for i in range(6):
        state, aux = step_fn(state, target, jax.random.fold_in(kp, i))
        metrics.append({k: float(v) for k, v in aux.items()})

    assert all(np.isfinite(m["total"]) for m in metrics)
    # mask loss must drop: silhouette gradients reach the SDF through the
    # antialiased coverage
    assert metrics[-1]["msk_loss"] < metrics[0]["msk_loss"]
    assert metrics[-1]["total"] < metrics[0]["total"]


def test_split_stage_runs(setup):
    cfg, scene, model, gparams, _ = setup
    key = jax.random.PRNGKey(2)
    kt, kl, kp = jax.random.split(key, 3)
    mn = jnp.zeros((6,))
    mx = jnp.ones((6,))
    tex = MLPTexture3D(cfg.texture, (mn, mx))
    perceptual = ConvPerceptual(channels=(8, 16, 24))
    perc_params = perceptual.init()
    params = {
        "geometry": gparams,
        "pose": scene.pose_params,
        "material": tex.init(kt),
        "light": light_mod.create_trainable_env(kl, cfg.render.probe_res),
    }
    # fixture arrays may have been donated by another test's step_fn
    params = jax.tree.map(jnp.array, params)
    tx, step_fn = make_train_step(
        "split", model, tex, perceptual, perc_params, cfg,
        raster_opts=dict(tile=(8, 16), max_faces_per_tile=256,
                         bin_expand=8, max_global=256))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    target = scene.frame_target(1)
    state, aux = step_fn(state, target, kp)
    assert np.isfinite(float(aux["total"]))
    assert float(aux["cloth_msk_loss"]) >= 0
    assert float(aux["body_msk_loss"]) >= 0


def test_split_msdf_reg_uses_signed_view(setup):
    """Regression (r5 fix): the split tick's open/close mSDF regularizers
    must act on each half's OWN sign-corrected msdf view (mesh.msdf_aug,
    already signed by _gshell_level2 — ref hmsdf_tets_split.py:254-264
    negates mSDF for body before everything downstream). The former
    `msdf_aug * sign` double-application returned the body half to the raw
    view, inverting its regularizers (and making cloth/body reg logs
    bit-identical, since both halves share aug vertex slots)."""
    from d3human_tpu.train import losses as L

    cfg, scene, model, gparams, _ = setup
    key = jax.random.PRNGKey(5)
    kt, kl, kp = jax.random.split(key, 3)
    tex = MLPTexture3D(cfg.texture, (jnp.zeros((6,)), jnp.ones((6,))))
    perceptual = ConvPerceptual(channels=(8, 16, 24))
    perc_params = perceptual.init()
    params = {
        "geometry": jax.tree.map(jnp.array, gparams),
        "pose": jax.tree.map(jnp.array, scene.pose_params),
        "material": tex.init(kt),
        "light": light_mod.create_trainable_env(kl, cfg.render.probe_res),
    }
    # make the msdf field spatially asymmetric so the two signed views are
    # numerically distinct (symmetric-around-zero fields could alias)
    g = model.grid
    params["geometry"]["msdf"] = jnp.tanh(3.0 * g.verts[:, 1] + 0.2)
    target = scene.frame_target(0)
    raster_opts = dict(tile=(8, 16), max_faces_per_tile=256, bin_expand=8,
                       max_global=256)
    aux = jax.jit(lambda c, p, t: L.tick_split(
        kp, model.bind(c), p["geometry"], p["pose"], tex, p["material"],
        perceptual, perc_params, t, jnp.int32(7), cfg, raster_opts,
    ))(model.consts(), params, target)
    cloth_reg = float(aux["cloth_mesh_msdf_reg_loss"])
    body_reg = float(aux["body_mesh_msdf_reg_loss"])
    assert cloth_reg != body_reg, (
        "cloth/body mesh-msdf regs identical — raw-view double-sign bug")

    # oracle: recompute the body half's open term from its OWN msdf_aug
    meshes_c, meshes_b = jax.jit(
        lambda c, p, t: model.bind(c).get_meshes_pair(
            p["geometry"], p["pose"], t["frame_idx"])
    )(model.consts(), params, target)
    regscale = (64.0 / cfg.geometry.grid_res) ** 3
    eps = 1e-3
    want_open = cfg.loss.msdf_reg_open_scale * regscale * float(
        L._huber_sum(jnp.clip(meshes_b.mesh.msdf_aug, -eps, None), -eps))
    # body reg = open + close; close >= 0, and open alone must already be
    # reproduced by the signed view (the raw view gives a different value)
    assert body_reg >= want_open - 1e-9
    raw_open = cfg.loss.msdf_reg_open_scale * regscale * float(
        L._huber_sum(jnp.clip(-meshes_b.mesh.msdf_aug, -eps, None), -eps))
    assert abs(want_open - raw_open) > 1e-9, "test scene not discriminating"


def test_validate_stage_jit_cache_reused(setup):
    """validate_stage must reuse one compiled render across calls (a fresh
    jit per validation recompiles the full render every save_interval)."""
    from d3human_tpu.train import validate as V

    cfg, scene, model, gparams, _ = setup
    tex = MLPTexture3D(cfg.texture, (jnp.zeros((6,)), jnp.ones((6,))))
    key = jax.random.PRNGKey(7)
    params = {
        "geometry": gparams,
        "pose": jax.tree.map(jnp.asarray, scene.pose_params),
        "material": tex.init(key),
    }
    target = scene.frame_target(0)
    V._JIT_CACHE.clear()
    s1 = V.validate_stage(key, model, params, tex, target, cfg)
    n1 = len(V._JIT_CACHE)
    s2 = V.validate_stage(key, model, params, tex, target, cfg)
    assert len(V._JIT_CACHE) == n1 == 1
    np.testing.assert_array_equal(s1, s2)
    # a different sign is a different entry
    V.validate_stage(key, model, params, tex, target, cfg, msdf_sign=-1.0)
    assert len(V._JIT_CACHE) == 2
