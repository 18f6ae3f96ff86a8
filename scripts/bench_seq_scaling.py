"""Frame-parallel seq-stage scaling check on a virtual CPU device mesh.

The rebuild's headline TPU win is sharding per-frame seq optimization over
the 'frames' mesh axis (parallel/frames.py): per-frame wall-clock should
stay ~FLAT as devices (= frames optimized concurrently) grow, because XLA
compiles the sharded vmap into per-device independent programs with no
collectives. The reference runs frames strictly serially
(/root/reference/train.py:1921-1926), so total wall-clock there is
sum(frames).

    python scripts/bench_seq_scaling.py [n_iters]

Prints per-frame ms at 1/2/4/8 virtual devices + the parallel efficiency.
Uses small shapes — this checks SCALING SHAPE on the CPU mesh, not absolute
TPU speed (bench.py BENCH_SCALE=seq measures that).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("D3H_PLATFORM", "cpu")
os.environ.setdefault("D3H_NUM_CPU_DEVICES", "8")

from d3human_tpu.utils.jax_setup import setup as _setup

_setup()

import jax
import numpy as np
import jax.numpy as jnp


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    assert len(jax.devices()) >= 8, (
        "need 8 virtual devices (D3H_NUM_CPU_DEVICES=8)")

    from __graft_entry__ import _small_setup
    from d3human_tpu.models.geometry import SeqTemplate
    from d3human_tpu.ops.mesh_ops import find_connected_faces
    from d3human_tpu.parallel.frames import make_parallel_seq_runner
    from d3human_tpu.parallel.mesh import make_frame_mesh

    results = []
    for nd in (1, 2, 4, 8):
        cfg, scene, model, tex, perceptual, perc_params, params = \
            _small_setup(n_frames=nd)
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
        mesh = make_frame_mesh(nd)
        launch, mesh = make_parallel_seq_runner(
            model, tex, perceptual, perc_params, template, cfg,
            n_frames=nd, n_iters=n_iters, mesh=mesh,
            raster_opts=dict(tile=(8, 16), max_faces_per_tile=128,
                             bin_expand=8, max_global=128))
        targets = [scene.frame_target(i % scene.n_frames) for i in range(nd)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *targets)
        # warm (compile)
        out = launch(params, stacked, jax.random.PRNGKey(0))
        jax.block_until_ready(out[1])
        t0 = time.time()
        out = launch(params, stacked, jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        dt = time.time() - t0
        per_frame_ms = dt * 1000 / n_iters  # wall-clock per iteration
        results.append({"devices": nd, "frames": nd,
                        "wall_ms_per_iter": round(per_frame_ms, 1)})
        print(results[-1], flush=True)

    # virtual CPU devices OVERSUBSCRIBE the host's physical cores, so flat
    # wall-clock is impossible here; the meaningful number is speedup vs
    # optimizing the same frames serially (the reference's schedule). On
    # real chips (one program per chip, no shared compute) this approaches
    # the device count.
    base = results[0]["wall_ms_per_iter"]
    nd = results[-1]["devices"]
    speedup = nd * base / results[-1]["wall_ms_per_iter"]
    print(json.dumps({
        "metric": f"seq frame-parallel speedup vs serial ({nd} frames, "
                  f"{nd} virtual cpu devices)",
        "value": round(speedup, 2),
        "unit": "x",
    }))


if __name__ == "__main__":
    main()
