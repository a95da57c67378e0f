"""Multi-host (multi-process) initialization and data-placement helpers.

The reference is single-GPU/single-process (SURVEY.md §2: no
torch.distributed anywhere); scaling beyond one host is new, TPU-native
capability. The design keeps the single-host code path untouched:

  * ``init_distributed()`` wires ``jax.distributed.initialize`` behind
    env vars / flags. After it runs, ``jax.devices()`` is GLOBAL (all
    chips of the pod) and ``make_mesh()`` therefore builds a pod-wide
    mesh with zero further changes — the same ``psum``-over-the-mesh
    code path rides ICI within a slice and DCN across hosts (the XLA
    collectives are inserted from the shardings exactly as on one host).
  * ``shard_batch``/``replicate`` detect ``jax.process_count() > 1`` and
    assemble global arrays from process-local data with
    ``jax.make_array_from_process_local_data`` (each process only ever
    touches its own rows — no host ever materializes the global batch).
  * ``process_batch_slice`` gives each host its contiguous block of the
    global ray batch; with the 1-D data mesh built from ``jax.devices()``
    (ordered by process), process p's devices hold exactly rows
    [p*B/nproc, (p+1)*B/nproc).

Single-host virtual-device testing: two local CPU processes with a
localhost coordinator (tests/test_multihost.py) exercise the full path —
global mesh, per-process batches, cross-process gradient all-reduce —
without TPU-pod hardware.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> tuple[int, int]:
    """Initialize multi-process JAX; no-op in the single-process case.

    Resolution order for each field: explicit argument, then
    ``NERFJAX_COORDINATOR`` / ``NERFJAX_NUM_PROCESSES`` /
    ``NERFJAX_PROCESS_ID`` env vars. On TPU pods where the cluster is
    auto-detectable (GKE/Cloud metadata), set ``NERFJAX_DISTRIBUTED=1``
    to call ``jax.distributed.initialize()`` with no arguments instead.

    Must run before the JAX backend is first touched. Safe to call twice
    (the second call is a no-op). Returns (process_index, process_count).
    """
    import jax

    coord = coordinator_address or os.environ.get("NERFJAX_COORDINATOR")
    nproc = num_processes
    if nproc is None:
        nproc = int(os.environ.get("NERFJAX_NUM_PROCESSES", "0") or 0)
    pid = process_id
    if pid is None:
        pid_env = os.environ.get("NERFJAX_PROCESS_ID")
        pid = int(pid_env) if pid_env is not None else None

    # NOTE: do not touch jax.process_count()/jax.devices() before
    # initialize() — any backend query forbids a later initialize. Detect
    # "already initialized" via the public API when present, falling back
    # to the private client state on older JAX.
    is_init = getattr(jax.distributed, "is_initialized", None)
    if callable(is_init):
        try:
            already = bool(is_init())
        except Exception:
            already = False
    else:
        try:
            already = jax._src.distributed.global_state.client is not None
        except Exception:
            already = False
    if not already:
        # Belt-and-braces for the documented "safe to call twice"
        # contract: if the detection above missed an earlier initialize
        # (private API moved), JAX raises RuntimeError here — treat that
        # as the no-op second call rather than crashing.
        try:
            if coord and nproc and nproc > 1:
                jax.distributed.initialize(
                    coordinator_address=coord,
                    num_processes=nproc,
                    process_id=pid,
                    local_device_ids=local_device_ids,
                )
            elif os.environ.get("NERFJAX_DISTRIBUTED"):
                jax.distributed.initialize()
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def process_batch_slice(batch: Any, global_batch_size: int | None = None) -> Any:
    """This process's contiguous block of a host-global batch dict.

    With the 1-D mesh over ``jax.devices()`` (process-major device order),
    dim-0 sharding assigns process p the rows
    [p*B/nproc, (p+1)*B/nproc). Identity in the single-process case, so
    data pipelines can apply it unconditionally. All leading dims must be
    divisible by process_count (the train loop guarantees this by
    construction: batch_size is a multiple of the device count).
    """
    import jax

    pc = jax.process_count()
    if pc == 1:
        return batch
    pi = jax.process_index()

    def _slice(x):
        n = x.shape[0]
        if n % pc:
            raise ValueError(
                f"batch dim {n} not divisible by process_count {pc}"
            )
        block = n // pc
        return x[pi * block : (pi + 1) * block]

    return jax.tree_util.tree_map(_slice, batch)


def put_process_local(tree: Any, sharding_tree: Any) -> Any:
    """Assemble global device arrays from process-local host data.

    Single-process: plain ``jax.device_put`` (async, zero-copy fast path).
    Multi-process: ``jax.make_array_from_process_local_data`` — for a
    dim-0-sharded array each process supplies its block (see
    ``process_batch_slice``); for a replicated sharding each process
    supplies the full (identical) array.
    """
    import jax

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(jax.device_put, tree, sharding_tree)

    def _make(x, sh):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(_make, tree, sharding_tree)
