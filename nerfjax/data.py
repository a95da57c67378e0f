"""Host-side ray data pipeline.

TPU-native replacement for the reference's torch Dataset + 4-worker
DataLoader (reference: scripts/dataset.py:8-105, scripts/train.py:209-217):
the whole NPZ fits in host RAM, so batching is a permutation + slice, and
throughput comes from *double-buffered async device_put* (the next sharded
batch is in flight while the current step runs) rather than worker processes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np

from nerfjax.rays import load_ray_data


class RayDataset:
    """In-memory (or memmapped) ray dataset over the precomputed NPZ.

    Mirrors the reference's load + stats printout (scripts/dataset.py:32-72).
    """

    def __init__(self, data_path: str | Path, use_memmap: bool = False, verbose: bool = True):
        self.data_path = Path(data_path)
        if not self.data_path.exists():
            raise FileNotFoundError(f"Data file not found: {self.data_path}")
        if verbose:
            print(f"Loading ray from: {self.data_path}")
        d = load_ray_data(self.data_path, use_memmap=use_memmap)
        self.rays_o = d["rays_o"]
        self.rays_d = d["rays_d"]
        self.rgbs = d["rgbs"]
        self.t_near = d["t_near"]
        self.t_far = d["t_far"]
        self.num_rays = len(self.rays_o)
        if verbose:
            print(f"Loaded {self.num_rays} rays")
            print(
                f"t_near range: [{float(np.min(self.t_near)):.3f}, "
                f"{float(np.max(self.t_near)):.3f}]"
            )
            print(
                f"t_far range: [{float(np.min(self.t_far)):.3f}, "
                f"{float(np.max(self.t_far)):.3f}]"
            )

    def __len__(self) -> int:
        return self.num_rays

    def epoch_batches(
        self,
        batch_size: int,
        seed: int,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ) -> Iterator[dict[str, np.ndarray]]:
        """Shuffled full-epoch batch iterator (host-side).

        drop_last=True keeps shapes static so the jitted train step never
        recompiles (the reference instead ran a ragged final batch).

        Multi-host: every process calls with the same seed (identical
        global permutation) and its own (process_index, process_count);
        each yields only its contiguous block of every global batch —
        rows [p*B/nproc, (p+1)*B/nproc) — matching the process-major
        device order of the 1-D data mesh. No host gathers the full batch.
        """
        if batch_size % process_count:
            raise ValueError(
                f"batch_size {batch_size} not divisible by process_count "
                f"{process_count}"
            )
        if process_count > 1 and not drop_last:
            raise ValueError(
                "multi-host batching requires drop_last=True (a ragged "
                "final batch cannot be block-sliced across processes)"
            )
        rng = np.random.default_rng(seed)
        perm = rng.permutation(self.num_rays)
        end = (self.num_rays // batch_size) * batch_size if drop_last else self.num_rays
        block = batch_size // process_count
        lo = process_index * block

        # Native one-pass parallel gather (the torch-DataLoader-worker role,
        # reference train.py:209-217) when the arrays qualify; numpy fancy
        # indexing otherwise. Both produce identical batches (tested).
        native_arrays = None
        vec = (self.rays_o, self.rays_d, self.rgbs)
        sca = (self.t_near, self.t_far)
        if (
            all(
                isinstance(a, np.ndarray)
                and a.dtype == np.float32
                and a.flags["C_CONTIGUOUS"]
                for a in vec + sca
            )
            # shape validation: the C kernel indexes all five arrays by the
            # same row index with hardcoded strides — every array must have
            # exactly num_rays rows and the vector arrays exactly 3 columns,
            # or out-of-bounds reads replace the numpy path's IndexError.
            and all(a.shape == (self.num_rays, 3) for a in vec)
            and all(a.shape == (self.num_rays,) for a in sca)
        ):
            native_arrays = {
                "rays_o": self.rays_o,
                "rays_d": self.rays_d,
                "rgbs": self.rgbs,
                "t_near": self.t_near,
                "t_far": self.t_far,
            }

        for start in range(0, end, batch_size):
            idx = perm[start + lo : start + lo + block]
            if native_arrays is not None:
                from nerfjax.native import gather_ray_batch_native

                batch = gather_ray_batch_native(native_arrays, idx)
                if batch is not None:
                    yield batch
                    continue
                native_arrays = None  # toolchain unavailable: numpy fallback
            yield {
                "rays_o": np.ascontiguousarray(self.rays_o[idx]),
                "rays_d": np.ascontiguousarray(self.rays_d[idx]),
                "rgb": np.ascontiguousarray(self.rgbs[idx]),
                "t_near": np.ascontiguousarray(self.t_near[idx]),
                "t_far": np.ascontiguousarray(self.t_far[idx]),
            }

    def steps_per_epoch(self, batch_size: int, drop_last: bool = True) -> int:
        return (
            self.num_rays // batch_size
            if drop_last
            else -(-self.num_rays // batch_size)
        )


def prefetch_to_device(iterator: Iterator, mesh, depth: int = 2) -> Iterator:
    """Double-buffered async host->device transfer of sharded batches.

    Keeps `depth` batches in flight (jax.device_put is async) so the host
    transfer overlaps device compute — the TPU-native equivalent of pinned
    memory + non_blocking copies in the reference (scripts/train.py:285-289).
    """
    import collections

    from nerfjax.parallel import shard_batch

    queue: collections.deque = collections.deque()
    for batch in iterator:
        queue.append(shard_batch(batch, mesh))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
