"""Golden-value lock on the init-tick loss dict (VERDICT r1 weak#8).

Regenerated 2026-08-17: z-aware tile binning changed which faces survive
the (deliberately undersized) test scene's per-tile truncation — nearest
faces now win instead of arbitrary ones.

A fixed scene + fixed params + fixed key must reproduce these numbers; a
drift means a loss weight, schedule, mask convention, or capacity-counter
change — exactly the class of silent parity regressions the reference's
formulas (train.py:718, hmsdf.py:830-902) pin down. Regenerate the goldens
deliberately (and say why in the commit) with:

    JAX_DEFAULT_MATMUL_PRECISION=highest JAX_PLATFORMS=cpu \
        python -m tests.test_golden_losses
(matmul precision must match tests/conftest.py or cap/mask values drift)
"""

import json

import jax
import jax.numpy as jnp
import pytest

GOLDEN = {
    "cap_aa": 0.214844,
    "cap_cov": 0.632812,
    "eik_loss": 0.383075,
    "img_loss": 0.602159,
    "iou": 0.066313,
    "msk_loss": 30.975279,
    "n_big_faces": 0.0,
    "n_cross": 1173.0,
    "n_max_tile": 705.0,
    "n_valid_tets": 1581.0,
    "normal_loss": 1.708954,
    "reg_loss": 0.597139,
    "sdf_reg_loss": 0.214064,
    "total": 33.281372,
}

_EXACT = {"n_cross", "n_valid_tets", "n_big_faces", "n_max_tile"}


def _compute():
    from __graft_entry__ import _small_setup
    from d3human_tpu.train import losses as L

    import dataclasses

    cfg, scene, model, tex, perceptual, perc_params, params = _small_setup()
    # goldens lock the FULL init tick incl. the shading/texture math, so pin
    # shading on regardless of the shipped default (which is off: the init
    # total has no image term, ref train.py:718)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, init_shading=True))
    target = scene.frame_target(0)
    raster_opts = dict(tile=(8, 16), max_faces_per_tile=128, bin_expand=8,
                       max_global=128)
    out = jax.jit(lambda c, p, t: {
        k: v for k, v in L.tick_init(
            jax.random.PRNGKey(3), model.bind(c), p["geometry"], p["pose"],
            tex, p["material"], perceptual, perc_params, t, jnp.int32(7),
            cfg, raster_opts).items() if jnp.ndim(v) == 0
    })(model.consts(), params, target)
    return {k: float(v) for k, v in out.items()}


def test_init_tick_matches_golden():
    out = _compute()
    assert set(out) == set(GOLDEN), (
        f"loss-dict keys changed: {sorted(set(out) ^ set(GOLDEN))}")
    for k, want in GOLDEN.items():
        got = out[k]
        if k in _EXACT:
            assert got == want, (k, got, want)
        else:
            assert got == pytest.approx(want, rel=5e-3, abs=1e-5), \
                (k, got, want)


def test_init_shading_off_only_zeroes_img_loss():
    """render.init_shading=False (the full-scale perf config) must leave
    every gradient-bearing init loss bit-identical — the init total has no
    image term (ref train.py:718) so skipping shading can only change the
    log-only img_loss (which drops to its msdf-hinge component)."""
    import dataclasses

    from __graft_entry__ import _small_setup
    from d3human_tpu.train import losses as L

    cfg, scene, model, tex, perceptual, perc_params, params = _small_setup()
    cfg = dataclasses.replace(          # explicit arms either way the
        cfg, render=dataclasses.replace(  # shipped default points
            cfg.render, init_shading=True))
    cfg_off = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, init_shading=False))
    target = scene.frame_target(0)
    raster_opts = dict(tile=(8, 16), max_faces_per_tile=128, bin_expand=8,
                       max_global=128)

    def run(c):
        return jax.jit(lambda cs, p, t: {
            k: v for k, v in L.tick_init(
                jax.random.PRNGKey(3), model.bind(cs), p["geometry"],
                p["pose"], tex, p["material"], perceptual, perc_params, t,
                jnp.int32(7), c, raster_opts).items() if jnp.ndim(v) == 0
        })(model.consts(), params, target)

    on = {k: float(v) for k, v in run(cfg).items()}
    off = {k: float(v) for k, v in run(cfg_off).items()}
    assert set(on) == set(off)
    for k in on:
        if k == "img_loss":
            assert off[k] <= on[k] + 1e-6
        else:
            assert off[k] == on[k], (k, on[k], off[k])


if __name__ == "__main__":
    print(json.dumps({k: round(v, 6) for k, v in sorted(_compute().items())},
                     indent=1))
