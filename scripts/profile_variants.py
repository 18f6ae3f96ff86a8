"""Bisect the step cost by disabling components one at a time (patch +
reload dependents), measuring N steps with per-step host readback (the only
trustworthy timing through the axon tunnel).

    python scripts/profile_variants.py [scale] [variant...]

variants: base, no_eik, no_perc, no_aa, no_raster, no_msdf_hinge, no_knn,
          no_texture
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp


def fresh_modules():
    import d3human_tpu.ops.rasterizer as R
    import d3human_tpu.ops.knn as K
    import d3human_tpu.models.perceptual as PP
    for m in (R, K, PP):
        importlib.reload(m)
    return R, K, PP


def reload_downstream():
    import d3human_tpu.models.smplx.deformer as D
    import d3human_tpu.models.geometry as G
    import d3human_tpu.render.pipeline as P
    import d3human_tpu.train.losses as L
    import d3human_tpu.train.step as S
    import bench as B
    importlib.reload(D)
    importlib.reload(G)
    importlib.reload(P)
    importlib.reload(L)
    importlib.reload(S)
    importlib.reload(B)
    return P, L, S, B


def run_variant(scale, variant, n=6):
    R, K, PP = fresh_modules()

    if variant == "no_aa":
        R.apply_aa = lambda color, weights: color
        R.aa_weights = lambda *a, **k: ()
    elif variant == "no_raster":
        def fake_rast(v_clip, faces, fv, res, **kw):
            H, W = res
            ids = (jnp.zeros((H, W), jnp.int32)
                   .at[H // 4: -(H // 4), W // 4: -(W // 4)].set(1))
            return R.Rast(tri_id=ids, zbuf=jnp.ones((H, W)))
        R.rasterize = fake_rast
    elif variant == "no_knn":
        K.knn = lambda q, r, k=1, **kw: (
            jnp.zeros((q.shape[0], k)), jnp.zeros((q.shape[0], k), jnp.int32))
    elif variant == "no_perc":
        PP.ConvPerceptual.loss = (
            lambda self, p, x, y: jnp.mean(x - y) * 0.0)

    P, L, S, B = reload_downstream()

    if variant == "no_eik":
        L.eikonal_loss = lambda *a, **k: jnp.asarray(0.0)
        importlib.reload(S)
        importlib.reload(B)
    elif variant == "no_msdf_hinge":
        L.msdf_image_hinges = lambda b, m: jnp.asarray(0.0)
        importlib.reload(S)
        importlib.reload(B)
    elif variant == "no_texture":
        import d3human_tpu.models.texture as T
        T.MLPTexture3D.sample = (
            lambda self, params, texc:
            jnp.ones(texc.shape[:-1] + (6,)) * 0.5)
        importlib.reload(B)

    state, step_fn, target, _ = B.build(scale)
    key = jax.random.PRNGKey(0)
    state, aux = step_fn(state, target, key)
    float(aux["total"])  # sync after compile+warm
    t0 = time.time()
    for i in range(n):
        state, aux = step_fn(state, target, jax.random.fold_in(key, i))
        float(aux["total"])          # per-step readback barrier
    dt = (time.time() - t0) / n * 1000
    print(f"{variant:16s} {dt:9.1f} ms/step", flush=True)


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "medium"
    variants = sys.argv[2:] or ["base", "no_eik", "no_perc", "no_aa",
                                "no_raster", "no_msdf_hinge", "no_knn",
                                "no_texture"]
    for v in variants:
        run_variant(scale, v)


if __name__ == "__main__":
    main()
