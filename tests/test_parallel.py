"""Multi-device tests on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3human_tpu.parallel.mesh import make_frame_mesh, shard_leading


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_frame_mesh_sharding_roundtrip():
    mesh = make_frame_mesh(8)
    sh = shard_leading(mesh, "frames")
    x = jnp.arange(16.0).reshape(8, 2)
    xs = jax.device_put(x, sh)
    assert len(xs.addressable_shards) == 8
    y = jax.jit(lambda x: x * 2, in_shardings=sh, out_shardings=sh)(xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2)


def test_dryrun_multichip_8():
    """The driver's multi-chip validation path: full frame-parallel seq-stage
    training step over an 8-device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
