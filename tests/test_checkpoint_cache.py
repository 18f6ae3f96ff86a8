"""Disk-cached pretraining (ref hmsdf.py:251-253 parity) and the watchdog's
detection primitives."""

import os
import socket
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_model(tmp_path):
    from d3human_tpu.config import Config, GeometryConfig, StageConfig
    from d3human_tpu.data.synthetic import make_scene
    from d3human_tpu.models.geometry import GeometryModel
    from d3human_tpu.ops.tet_grid import make_tet_grid

    cfg = Config(
        geometry=GeometryConfig(grid_res=8, max_verts=2048, max_tets=2048),
        stages=StageConfig(sdf_mlp_pretrain_steps=5,
                           sdf_deform_pretrain_steps=5),
    )
    scene = make_scene(resolution=(32, 32), n_frames=2)
    grid = make_tet_grid(res=8, bounds=((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)),
                         y_offset=0.0, scale=1.3)
    model = GeometryModel(cfg, grid, scene.deformer, scene.canon)
    return cfg, model


def test_cached_sdf_pretrain_roundtrip(tmp_path):
    from d3human_tpu.train.checkpoint import cached_sdf_pretrain

    cfg, model = _tiny_model(tmp_path)
    g0 = model.init_params(jax.random.PRNGKey(0), n_images=2)
    cache = os.path.join(tmp_path, "pre.npz")

    g1, loss = cached_sdf_pretrain(model, g0, 5, cache)
    assert loss is not None and os.path.exists(cache)

    # second call: loads from cache, sdf_net bit-identical, and the caller's
    # OTHER freshly-initialized fields are preserved (init re-pretrains after
    # reinit_fields — the cache must not stomp msdf/deform/cond)
    g0b = model.init_params(jax.random.PRNGKey(7), n_images=2)
    g2, loss2 = cached_sdf_pretrain(model, g0b, 5, cache)
    assert loss2 is None
    for a, b in zip(jax.tree_util.tree_leaves(g1["sdf_net"]),
                    jax.tree_util.tree_leaves(g2["sdf_net"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(g2["msdf"]),
                                  np.asarray(g0b["msdf"]))


def test_pretrain_cache_paths_key_on_determinants():
    import dataclasses

    from d3human_tpu.config import Config
    from d3human_tpu.train.checkpoint import pretrain_cache_paths

    c1 = Config()
    p1, n1 = pretrain_cache_paths(c1)
    c2 = dataclasses.replace(c1, geometry=dataclasses.replace(
        c1.geometry, grid_res=c1.geometry.grid_res * 2))
    p2, _ = pretrain_cache_paths(c2)
    assert p1 != p2
    c3 = dataclasses.replace(c1, seed=c1.seed + 1)
    p3, n3 = pretrain_cache_paths(c3)
    assert p1 != p3 and n1 != n3


def test_watchdog_detects_tunnel_and_restarts(tmp_path):
    """End-to-end: a command that stops writing its log gets killed and
    relaunched; a clean exit ends the watchdog with rc=0."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from watchdog_train import log_age_s, tunnel_alive

    # tunnel probe: a live local listener reads alive, a closed port dead
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    assert tunnel_alive(port)
    srv.close()
    assert not tunnel_alive(port)

    log = tmp_path / "w.log"
    log.write_text("x")
    assert log_age_s(str(log)) < 5

    # full loop: the child appends one line then exits 0 -> watchdog rc 0
    repo = os.path.join(os.path.dirname(__file__), "..")
    rc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "watchdog_train.py"),
         "--log", str(log), "--tunnel-port", "0", "--poll-s", "0.2",
         "--stale-min", "1", "--",
         sys.executable, "-c", "print('ok')"],
        timeout=60).returncode
    assert rc == 0


def test_watchdog_sigterm_kills_child(tmp_path):
    """The one-TPU-process reap path (bench.py -> run_guard): SIGTERM to
    the watchdog must take its training child down with it instead of
    orphaning a live TPU client, and must record the child pid in
    /tmp/watchdog_child.pid for the straggler sweep."""
    import signal
    import time

    repo = os.path.join(os.path.dirname(__file__), "..")
    log = tmp_path / "w.log"
    log.write_text("x")
    pidfile = tmp_path / "child.pid"
    wd = subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts", "watchdog_train.py"),
         "--log", str(log), "--tunnel-port", "0", "--poll-s", "0.2",
         "--stale-min", "10", "--child-pid-file", str(pidfile), "--",
         sys.executable, "-c", "import time; time.sleep(300)"])
    # wait for the child pid file to appear
    child = None
    t0 = time.time()
    while time.time() - t0 < 20:
        try:
            child = int(open(pidfile).read().strip())
            break
        except (OSError, ValueError):
            time.sleep(0.2)
    assert child is not None, "watchdog never wrote watchdog_child.pid"
    os.kill(child, 0)                      # child is alive
    wd.send_signal(signal.SIGTERM)
    assert wd.wait(timeout=30) == 2        # handler exit code
    t0 = time.time()
    while time.time() - t0 < 10:
        try:
            os.kill(child, 0)
            time.sleep(0.2)
        except ProcessLookupError:
            break
    with pytest.raises(ProcessLookupError):
        os.kill(child, 0)


def test_watchdog_busy_child_is_not_a_stall(tmp_path):
    """The r3 false-positive: a full-scale XLA compile logs nothing for
    >stale-min but burns host CPU the whole time; the watchdog must NOT
    kill it. Conversely the real wedge signature (futex wait at 0% CPU
    with a stale log) must still trip. proc_tree_cpu_s is the
    discriminator; this exercises it on both kinds of child."""
    import time

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from watchdog_train import proc_tree_cpu_s

    # busy child: CPU clock advances
    busy = subprocess.Popen(
        [sys.executable, "-c",
         "t=__import__('time');e=t.time()+8\n"
         "x=0\nwhile t.time()<e: x+=1"])
    try:
        c0 = proc_tree_cpu_s(busy.pid)
        time.sleep(1.5)
        c1 = proc_tree_cpu_s(busy.pid)
        assert c1 - c0 > 0.5, "busy child's CPU clock must advance"
    finally:
        busy.kill()
        busy.wait()

    # wedged child: asleep, CPU clock parked
    idle = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        # wait out interpreter startup: poll until the clock stops moving
        # (the single-core CI host can take seconds to reach the sleep)
        parked = False
        for _ in range(30):
            c0 = proc_tree_cpu_s(idle.pid)
            time.sleep(1.0)
            c1 = proc_tree_cpu_s(idle.pid)
            if c1 - c0 < 0.2:
                parked = True
                break
        assert parked, "sleeping child's CPU clock must park eventually"
    finally:
        idle.kill()
        idle.wait()

    # end-to-end: stale log + busy child survives a tiny stale-min window
    repo = os.path.join(os.path.dirname(__file__), "..")
    log = tmp_path / "w.log"
    log.write_text("x")
    os.utime(log, (1, 1))                  # ancient mtime = maximally stale
    rc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "watchdog_train.py"),
         "--log", str(log), "--tunnel-port", "0", "--poll-s", "0.3",
         "--stale-min", "0.02", "--stall-cpu-s", "0.2", "--",
         sys.executable, "-c",
         "t=__import__('time');e=t.time()+4\n"
         "x=0\nwhile t.time()<e: x+=1"],
        timeout=60).returncode
    assert rc == 0, "busy child must run to clean exit despite stale log"
