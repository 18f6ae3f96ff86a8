import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.train.optim import (
    _geometry_label, lr_schedule, make_optimizer, resolve_lrs,
)


def test_resolve_lrs_f3c_config():
    # f3c.json learning_rate = [0.03, 0.005]: indexed by pass
    # (ref train.py:568-571) -> pass 0 is the scalar 0.03
    lr_pos, lr_mat, lr_lgt = resolve_lrs((0.03, 0.005), pass_idx=0)
    assert lr_pos == 0.03 and lr_mat == 0.03 and abs(lr_lgt - 0.18) < 1e-9
    lr_pos, lr_mat, lr_lgt = resolve_lrs(((0.03, 0.005),), pass_idx=0)
    assert lr_pos == 0.03 and lr_mat == 0.005


def test_lr_schedule_warmup_and_decay():
    f = lr_schedule(1.0, warmup_iter=10)
    assert abs(float(f(5)) - 0.5) < 1e-6
    assert abs(float(f(10)) - 1.0) < 1e-6
    # 10^(-(5010-10)*2e-4) = 10^-1
    assert abs(float(f(5010)) - 0.1) < 1e-3


def test_geometry_labels_match_reference_groups():
    # init (ref train.py:599-614): msdf & nonrigid frozen
    assert _geometry_label("init", "['deform']") == "x1"
    # sdf_net gets its own label so the ref 1e-2 multiplier (train.py:612)
    # is tunable via optim.sdf_lr_mult without touching split's x1e-2 group
    assert _geometry_label("init", "['sdf_net']['layers'][0]['w']") == "xsdf"
    assert _geometry_label("init", "['msdf']") == "frozen"
    assert _geometry_label("init", "['nonrigid']['layers'][0]['w']") == "frozen"
    assert _geometry_label("init", "['cond']") == "x1e-3"
    # split (ref :895-901): sdf_net frozen, msdf trains at x1
    assert _geometry_label("split", "['sdf_net']['layers'][0]['w']") == "frozen"
    assert _geometry_label("split", "['msdf']") == "x1"
    assert _geometry_label("split", "['nonrigid']['layers'][0]['w']") == "x1e-3"
    assert _geometry_label("split", "['cond']") == "x1e-2"
    # seq (ref :1296-1304): ONLY 'nonrigid'/'cond' name matches move;
    # fix_code does NOT match the reference's `'cond' in name` filter
    assert _geometry_label("seq", "['nonrigid']['layers'][0]['w']") == "x1e-2"
    assert _geometry_label("seq", "['fix_code']") == "frozen"
    assert _geometry_label("seq", "['cond']") == "x1e-2"
    assert _geometry_label("seq", "['deform']") == "frozen"
    assert _geometry_label("seq", "['msdf']") == "frozen"


def test_frozen_groups_receive_zero_updates():
    params = {
        "geometry": {"deform": jnp.ones((4, 3)), "msdf": jnp.ones((4,)),
                     "sdf_net": {"layers": [{"w": jnp.ones((2, 2))}]}},
        "pose": {"trans": jnp.ones((2, 3))},
        "material": {"encoder": {"table": jnp.ones((8, 2))},
                     "net": [{"w": jnp.ones((2, 2))}]},
        "light": {"base": jnp.ones((4, 4, 3))},
    }
    tx = make_optimizer("init", 0.03, 0.03, 0.18, warmup_iter=0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # msdf frozen in init stage
    np.testing.assert_allclose(np.asarray(updates["geometry"]["msdf"]), 0.0)
    # deform moves
    assert float(jnp.abs(updates["geometry"]["deform"]).sum()) > 0
    # light and material move
    assert float(jnp.abs(updates["light"]["base"]).sum()) > 0
    assert float(jnp.abs(updates["material"]["encoder"]["table"]).sum()) > 0


def _full_params_tree():
    """A params tree with every group the stage drivers create."""
    return {
        "geometry": {
            "sdf_net": {"layers": [{"w": jnp.ones((2, 2))}]},
            "msdf": jnp.ones((4,)),
            "deform": jnp.ones((4, 3)),
            "nonrigid": {"layers": [{"w": jnp.ones((2, 2))}]},
            "body_nonrigid": {"layers": [{"w": jnp.ones((2, 2))}]},
            "cond": jnp.ones((3, 8)),
            "render_cond": jnp.ones((3, 8)),
            "fix_code": jnp.ones((1, 1, 8)),
        },
        "pose": {"trans": jnp.ones((2, 3)), "body_pose": jnp.ones((2, 63))},
        "material": {"encoder": {"table": jnp.ones((8, 2))},
                     "net": [{"w": jnp.ones((2, 2))}]},
        "light": {"base": jnp.ones((4, 4, 3))},
    }


def test_trainable_groups_per_stage():
    """Exactly which param groups move after one optimizer step, per stage
    (ref train.py:599-614 init / :895-901 split / :1296-1304 seq)."""
    moving = {
        "init": {"geometry/sdf_net", "geometry/deform", "geometry/cond",
                 "geometry/render_cond", "geometry/fix_code",
                 "pose", "material", "light"},
        "split": {"geometry/msdf", "geometry/deform", "geometry/nonrigid",
                  "geometry/body_nonrigid", "geometry/cond",
                  "geometry/render_cond", "geometry/fix_code",
                  "pose", "material", "light"},
        # seq: ONLY nonrigid + cond (+ material/light); pose and fix_code
        # are frozen (ref train.py:1296-1304)
        "seq": {"geometry/nonrigid", "geometry/body_nonrigid",
                "geometry/cond", "geometry/render_cond",
                "material", "light"},
    }
    for stage, expect in moving.items():
        params = _full_params_tree()
        tx = make_optimizer(stage, 0.03, 0.03, 0.18, warmup_iter=0)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        got = set()
        for top in ("pose", "material", "light"):
            s = float(sum(jnp.abs(x).sum()
                          for x in jax.tree.leaves(updates[top])))
            if s > 0:
                got.add(top)
        for name, sub in updates["geometry"].items():
            s = float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(sub)))
            if s > 0:
                got.add(f"geometry/{name}")
        assert got == expect, f"stage={stage}: {got} != {expect}"
