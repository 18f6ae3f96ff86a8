"""Time loss fwd vs full train step (fwd+bwd+opt) at a given scale with
per-iteration scalar readbacks (the only trustworthy timing through axon).

    python scripts/profile_fwd_step.py [full|medium|small]
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
    t0 = time.time()
    out = float(fn(*args))            # compile + warm
    print(f"{name:36s} compile+first {time.time()-t0:7.1f} s", flush=True)
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

    from d3human_tpu.train import losses as L

    def loss_fwd(c, p, tgt):
        out = L.tick_init(jax.random.PRNGKey(0), model.bind(c),
                          p["geometry"], p["pose"], tex, p["material"],
                          perceptual, perc_params, tgt, jnp.int32(5), cfg,
                          None)
        return out["total"]

    loop_time("loss fwd (tick_init)", jax.jit(loss_fwd), consts, params,
              target)

    box = {"s": state}

    def one():
        box["s"], aux = step_fn(box["s"], target, jax.random.PRNGKey(0))
        return aux["total"]

    loop_time("full train step", one)
    print(f"(noop readback baseline {base:.1f} ms)")


if __name__ == "__main__":
    main()
