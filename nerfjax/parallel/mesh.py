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
MODEL_AXIS = "model"


def make_mesh(
    devices: list | None = None,
    axis: str = DATA_AXIS,
    shape: tuple[int, int] | None = None,
) -> Mesh:
    """Device mesh over all GLOBAL devices (or an explicit device list).

    Default: a 1-D ``(data,)`` mesh — rays shard across every chip, the
    hash table (if ``shard_hash_table``) shards across the same axis.

    ``shape=(dp, tp)``: a 2-D ``(data, model)`` mesh. Rays shard along
    ``data``; ``table_shardings`` then shards the hash table along
    ``model`` only, so each data-parallel group holds one full copy of the
    table split across its ``tp`` chips. This is the pod shape for DP
    across hosts x TP within a host: with process-major device order and
    ``tp`` = chips-per-host, each mesh row is exactly one host, the
    table's gather/scatter collectives ride intra-host ICI, and only the
    gradient all-reduce crosses DCN.

    ``jax.devices()`` spans every process once
    :func:`nerfjax.parallel.init_distributed` has run, so the same call
    builds a pod-wide mesh on multi-host and a local mesh on one host.
    Device order is process-major, which is what
    ``process_batch_slice`` relies on for contiguous per-host blocks (in
    the 2-D case each process must own whole mesh rows, i.e. tp must
    divide the per-process device count).
    """
    if devices is None:
        devices = jax.devices()
    if shape is not None:
        dp, tp = int(shape[0]), int(shape[1])
        if dp * tp != len(devices):
            raise ValueError(
                f"mesh shape {dp}x{tp} != {len(devices)} devices"
            )
        return Mesh(np.asarray(devices).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (the ray/point batch) across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Put a host batch onto the mesh, dim-0-sharded across devices.

    Multi-process: ``batch`` is this process's contiguous block (see
    ``process_batch_slice``) and the global array is assembled from the
    per-process pieces without any host seeing the whole batch.
    """
    from nerfjax.parallel.distributed import put_process_local

    sh = batch_sharding(mesh, axis)
    return put_process_local(batch, jax.tree_util.tree_map(lambda _: sh, batch))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params, opt state) on every device of the mesh.

    Multi-process: every process must pass the same host values (same
    init seed / same restored checkpoint).
    """
    from nerfjax.parallel.distributed import put_process_local

    sh = replicated_sharding(mesh)
    return put_process_local(tree, jax.tree_util.tree_map(lambda _: sh, tree))


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
