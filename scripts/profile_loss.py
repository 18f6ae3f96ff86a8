"""Bisect the loss side of the init-stage step:

    python scripts/profile_loss.py [small|medium|full]

Times: render fwd, tick_init fwd, grad-of-(individual loss terms),
grad-of-total, full step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.time() - t0) / iters * 1000:9.2f} ms", flush=True)


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "small"
    import bench as B
    from d3human_tpu.train import losses as L

    state, step_fn, target, ex = B.build(scale)
    model, tex, perc, perc_p, cfg = (ex["model"], ex["tex"], ex["perceptual"],
                                     ex["perc_params"], ex["cfg"])
    params = state.params
    consts = model.consts()
    key = jax.random.PRNGKey(0)

    def tick(c, p, t, k):
        return L.tick_init(k, model.bind(c), p["geometry"], p["pose"], tex,
                           p["material"], perc, perc_p, t, jnp.int32(0), cfg)

    timeit("tick_init fwd (total)",
           jax.jit(lambda c, p, t, k: tick(c, p, t, k)["total"]),
           consts, params, target, key)

    for term in ("msk_loss", "normal_loss", "eik_loss", "sdf_reg_loss",
                 "img_loss"):
        timeit(f"grad wrt {term}",
               jax.jit(jax.grad(
                   lambda p, c, t, k, term=term: tick(c, p, t, k)[term],
                   argnums=0)),
               params, consts, target, key)

    timeit("grad wrt total",
           jax.jit(jax.grad(
               lambda p, c, t, k: tick(c, p, t, k)["total"], argnums=0)),
           params, consts, target, key)

    box = {"state": state}

    def one_step():
        box["state"], aux = step_fn(box["state"], target, key)
        return aux["total"]

    timeit("full train step", one_step)


if __name__ == "__main__":
    main()
