"""Bake the neural 3D texture of a trained run into a 2D UV texture + OBJ.

The reference's xatlas path (/root/reference/train.py:197-246) parametrizes
the mesh with xatlas and bakes via render_uv — but that code is DEAD in the
reference's main flow (never called from the stage drivers). This CLI makes
the capability live under the zero-dependency constraint:

  * --atlas lscm   (default) real parametrization, xatlas-equivalent:
    normal-similarity chart growing -> per-chart LSCM (least-squares
    conformal maps, the algorithm family xatlas descends from) ->
    uniform-texel-density shelf packing (pipeline/uv_unwrap.py).
  * --atlas grid   chart-per-face fallback: each triangle gets its own
    right-triangle cell in a sqrt(F) x sqrt(F) grid. Valid, watertight in
    UV space, zero seams-optimization. Fine for baking (every texel maps
    to exactly one surface point); not for hand-painting.
  * xatlas itself is NOT available in this image; if installed, pass
    --atlas xatlas to use it (optional import).

Usage:
    python scripts/bake_texture.py --run out/parity_r03 --stage init \
        --mesh out/parity_r03/init/watertight_imesh_final.obj \
        --res 2048 --out /tmp/baked
Writes <out>/texture_kd.png, texture_ks.png, mesh_uv.obj.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from d3human_tpu.utils.jax_setup import setup as _setup_jax  # noqa: E402

_setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def grid_atlas(n_faces: int, margin: float = 0.125):
    """Chart-per-face UV atlas: face i -> right triangle in grid cell i.

    Returns (v_tex [3F, 2], t_tex_idx [F, 3]). Each cell holds one triangle
    with ``margin`` cell-fractions of padding so bilinear taps at bake
    resolution never cross into a neighbor."""
    side = int(np.ceil(np.sqrt(n_faces)))
    cell = 1.0 / side
    ci = np.arange(n_faces) % side
    cj = np.arange(n_faces) // side
    x0 = ci * cell + margin * cell
    y0 = cj * cell + margin * cell
    x1 = (ci + 1) * cell - margin * cell
    y1 = (cj + 1) * cell - margin * cell
    v_tex = np.stack([
        np.stack([x0, y0], -1),
        np.stack([x1, y0], -1),
        np.stack([x0, y1], -1),
    ], axis=1).reshape(-1, 2).astype(np.float32)          # [F*3, 2]
    t_tex_idx = np.arange(n_faces * 3, dtype=np.int32).reshape(-1, 3)
    return v_tex, t_tex_idx


def xatlas_atlas(verts, faces):
    try:
        import xatlas
    except ImportError as e:
        raise SystemExit(
            "--atlas xatlas requested but the xatlas package is not "
            "installed in this image; use --atlas grid (chart-per-face)"
        ) from e
    vmapping, indices, uvs = xatlas.parametrize(verts, faces)
    return uvs.astype(np.float32), indices.astype(np.int32), vmapping


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="training out-dir")
    ap.add_argument("--stage", default="init")
    ap.add_argument("--mesh", required=True, help="OBJ to bake onto "
                    "(template/canonical positions = texture coords)")
    ap.add_argument("--res", type=int, default=2048)
    ap.add_argument("--atlas", choices=("lscm", "grid", "xatlas"),
                    default="lscm")
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None)
    args = ap.parse_args()

    from d3human_tpu.config import load_config
    from d3human_tpu.models.texture import MLPTexture3D
    from d3human_tpu.render.texture2d import render_uv
    from d3human_tpu.train.checkpoint import latest_checkpoint, load_params
    from d3human_tpu.utils.io import load_obj, save_image, write_obj

    cfg = load_config(args.config)
    verts, faces = load_obj(args.mesh)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    print(f"[bake] mesh {len(verts)} verts / {len(faces)} faces", flush=True)

    if args.atlas == "grid":
        v_tex, t_tex_idx = grid_atlas(len(faces))
        t_pos_idx = faces
    elif args.atlas == "lscm":
        from d3human_tpu.pipeline.uv_unwrap import unwrap
        v_tex, t_tex_idx, chart = unwrap(verts, faces)
        t_pos_idx = faces
        print(f"[bake] lscm atlas: {int(chart.max()) + 1} charts", flush=True)
    else:
        uvs, t_tex_idx, vmapping = xatlas_atlas(verts, faces)
        v_tex, t_pos_idx = uvs, t_tex_idx

    ck = latest_checkpoint(os.path.join(args.run, args.stage, "ckp"))
    if ck is None:
        raise SystemExit(f"no checkpoint under {args.run}/{args.stage}/ckp")
    key = jax.random.PRNGKey(0)
    mn = jnp.concatenate([jnp.asarray(cfg.render.kd_min[:3]),
                          jnp.asarray(cfg.render.ks_min)])
    mx = jnp.concatenate([jnp.asarray(cfg.render.kd_max[:3]),
                          jnp.asarray(cfg.render.ks_max)])
    tex = MLPTexture3D(cfg.texture, (mn, mx))
    template = {"params": {"material": tex.init(key)}}
    params = load_params(ck, template)

    mask, kd, ks = jax.jit(
        lambda m: render_uv(jnp.asarray(verts), jnp.asarray(v_tex),
                            jnp.asarray(t_tex_idx), jnp.asarray(t_pos_idx),
                            (args.res, args.res), tex, m)
    )(params["params"]["material"])

    os.makedirs(args.out, exist_ok=True)
    save_image(os.path.join(args.out, "texture_kd.png"),
               np.asarray(jnp.clip(kd, 0, 1) * mask))
    save_image(os.path.join(args.out, "texture_ks.png"),
               np.asarray(jnp.clip(ks, 0, 1) * mask))
    write_obj(os.path.join(args.out, "mesh_uv.obj"), verts, faces,
              uv=np.asarray(v_tex), uv_idx=np.asarray(t_tex_idx))
    print(f"[bake] wrote {args.out}/texture_kd.png, texture_ks.png, "
          f"mesh_uv.obj", flush=True)


if __name__ == "__main__":
    main()
