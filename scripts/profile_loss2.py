"""Loss fwd / fwd+bwd / extract-bwd timing at full scale via py-loop with
per-iteration scalar readbacks (scan-of-steps trips the axon remote-compile
size limit for the big programs).

Usage: python scripts/profile_loss2.py [full|medium]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp


def loop_time(name, fn, *args, iters=6):
    out = float(fn(*args))            # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = float(fn(*args))
    dt = (time.time() - t0) * 1000 / iters
    print(f"{name:36s} {dt:9.2f} ms/iter", flush=True)
    return dt


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "full"
    import bench as B

    state, step_fn, target, ex = B.build(scale)
    model, tex, cfg = ex["model"], ex["tex"], ex["cfg"]
    perceptual, perc_params = ex["perceptual"], ex["perc_params"]
    params = state.params
    consts = model.consts()
    print(f"== scale {scale} ==", flush=True)

    base = loop_time("noop readback", jax.jit(lambda x: x + 1.0),
                     jnp.float32(0))

    # extract fwd+bwd (geometry-only grads)
    def ext_grad(p):
        m = model.bind(consts)

        def f(p):
            mesh, sdf = m.extract(p)
            return (jnp.sum(mesh.verts * 1e-3) + jnp.sum(sdf * 1e-6)
                    + jnp.sum(mesh.msdf_aug * 1e-6))

        g = jax.grad(f)(p)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    loop_time("extract fwd+bwd", jax.jit(ext_grad), params["geometry"])

    from d3human_tpu.train import losses as L

    def loss_fwd(p, tgt):
        out = L.tick_init(jax.random.PRNGKey(0), model.bind(consts),
                          p["geometry"], p["pose"], tex, p["material"],
                          perceptual, perc_params, tgt, jnp.int32(5), cfg,
                          None)
        return out["total"]

    loop_time("loss fwd (tick_init)", jax.jit(loss_fwd), params, target)

    def loss_grad(p, tgt):
        def f(p):
            return loss_fwd(p, tgt)

        tot, g = jax.value_and_grad(f)(p)
        return tot + sum(jnp.sum(jnp.abs(x)) * 0 for x in jax.tree.leaves(g))

    loop_time("loss fwd+bwd", jax.jit(loss_grad), params, target)

    box = {"s": state}

    def one():
        box["s"], aux = step_fn(box["s"], target, jax.random.PRNGKey(0))
        return aux["total"]

    loop_time("full train step", one)
    print(f"(noop readback baseline {base:.1f} ms)")


if __name__ == "__main__":
    main()
