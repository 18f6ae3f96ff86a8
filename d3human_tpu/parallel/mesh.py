"""Device mesh + distributed initialization helpers.

This is the rebuild's real distributed layer, replacing the reference's
vestigial NCCL env-var setup that never performs a collective
(/root/reference/train.py:1646-1655, SURVEY §2.4): a jax.sharding Mesh over
ICI with named axes, NamedSharding constructors, and multi-host DCN init via
jax.distributed. Collectives are inserted by XLA from sharding annotations
(psum/all_gather under the hood) — never hand-written point-to-point.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_distributed_init() -> None:
    """Multi-host DCN initialization (controller-less). No-op when the
    process is standalone — mirrors how the reference guards on WORLD_SIZE."""
    if "JAX_COORDINATOR_ADDRESS" in os.environ or (
            "COORDINATOR_ADDRESS" in os.environ):
        jax.distributed.initialize()


def make_frame_mesh(n_devices: int = 0, axis: str = "frames") -> Mesh:
    """1-D mesh over which independent per-frame optimizations shard."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_data_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_leading(mesh: Mesh, axis: str):
    """NamedSharding that splits the leading dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def put_sharded(tree, sharding):
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
