"""Device mesh + sharding helpers (the distributed layer).

The reference is strictly single-GPU/single-process (SURVEY.md §2:
no torch.distributed anywhere). This layer is NEW capability, built the TPU
way: a 1-D `jax.sharding.Mesh` over all chips, ray batches sharded along the
``data`` axis, parameters replicated. Gradient all-reduce is inserted by XLA
(rides ICI within a slice, DCN across hosts transparently) — there is no
NCCL-style backend to manage.

Rays are i.i.d. so data parallelism is embarrassingly parallel; the same
helpers shard the dense grid in volume extraction.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: list | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all local devices (or an explicit device list)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (the ray/point batch) across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Put a host batch onto the mesh, dim-0-sharded across devices."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params, opt state) on every device of the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
