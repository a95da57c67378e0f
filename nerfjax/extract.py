"""Volume extraction: dense-grid density/RGB query -> colored occupancy.

The reference extracts a 512^3 volume by ~16k sequential 8192-point GPU
launches with per-batch host<->device copies, then ships 134M floats to host
for skimage Otsu (reference: scripts/extract_vol.py:85-150). Here the grid
query is a jitted, mesh-sharded scan over Z-slabs (device-resident, no
per-batch host traffic), Otsu is a device-side histogram (nerfjax.ops.otsu),
and only the final uint8 volumes land on host.

File contract preserved: volume.pth = {occupancy_volume uint8 [R,R,R],
rgb_volume uint8 [R,R,R,3], metadata{resolution,bounds,threshold,
occupied_ratio,total_voxels,occupied_voxels,timestamp,+stats}}
(reference: scripts/extract_vol.py:193-206).
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nerfjax import checkpoint as ckpt
from nerfjax import pth
from nerfjax.config import ConfigNode
from nerfjax.ops.otsu import otsu_threshold
from nerfjax.parallel import make_mesh, replicate
from nerfjax.train import build_fields


def _field_eval(field, params, pos3, view3, dtype):
    """Inference field eval: fused Pallas MLP head on TPU, XLA path elsewhere."""
    if hasattr(field, "apply_planar_fused") and jax.default_backend() == "tpu":
        return field.apply_planar_fused(params, pos3, view3, dtype=dtype)
    return field.apply_planar(params, pos3, view3, dtype=dtype)


def _density_eval(field, params, pos3, dtype):
    """Inference density-only eval: fused Pallas kernel on TPU (bit-identical
    sigma to the full fused head), XLA query_density elsewhere."""
    if (
        hasattr(field, "query_density_planar_fused")
        and jax.default_backend() == "tpu"
    ):
        return field.query_density_planar_fused(params, pos3, dtype=dtype)
    if hasattr(field, "query_density_planar"):
        sigma, _ = field.query_density_planar(params, pos3, dtype=dtype)
        return sigma
    # duck-typed field (tests): sigma from the full eval at a fixed view
    zero_view = tuple(jnp.zeros_like(pos3[0]) for _ in range(3))
    _, sigma = _field_eval(field, params, pos3, zero_view, dtype)
    return sigma


def _slab_query_density(field, params, zs: jnp.ndarray, res: int, bounds, dtype):
    """Density-only twin of _slab_query: returns sigma [nz, R, R]."""
    lo, hi = bounds
    coords = jnp.linspace(lo, hi, res, dtype=jnp.float32)
    nz = zs.shape[0]
    xs = coords[zs]
    px = jnp.broadcast_to(xs[:, None, None], (nz, res, res)).reshape(-1)
    py = jnp.broadcast_to(coords[None, :, None], (nz, res, res)).reshape(-1)
    pz = jnp.broadcast_to(coords[None, None, :], (nz, res, res)).reshape(-1)
    sigma = _density_eval(field, params, (px, py, pz), dtype)
    return sigma.astype(jnp.float32).reshape(nz, res, res)


def _slab_query(field, params, zs: jnp.ndarray, res: int, bounds, view, dtype):
    """Evaluate density+rgb for all voxels of |zs| z-slabs: returns
    (sigma [nz, R, R], rgb [nz, R, R, 3] in [0,1])."""
    lo, hi = bounds
    coords = jnp.linspace(lo, hi, res, dtype=jnp.float32)
    nz = zs.shape[0]
    # grid_points convention (reference extract_vol.py:74-77): meshgrid
    # indexing "ij" over (x, y, z) -> x is the slowest axis. We slab over x.
    xs = coords[zs]  # [nz] actually x-slabs
    px = jnp.broadcast_to(xs[:, None, None], (nz, res, res)).reshape(-1)
    py = jnp.broadcast_to(coords[None, :, None], (nz, res, res)).reshape(-1)
    pz = jnp.broadcast_to(coords[None, None, :], (nz, res, res)).reshape(-1)

    vx = jnp.full_like(px, view[0])
    vy = jnp.full_like(px, view[1])
    vz = jnp.full_like(px, view[2])
    rgb, sigma = _field_eval(field, params, (px, py, pz), (vx, vy, vz), dtype)
    return (
        sigma.astype(jnp.float32).reshape(nz, res, res),
        rgb.astype(jnp.float32).reshape(3, nz, res, res),
    )


def extract_volume(
    cfg: ConfigNode,
    *,
    params: dict | None = None,
    resolution: int | None = None,
    bounds: tuple[float, float] = (-1.0, 1.0),
    view_direction=(0.0, 0.0, -1.0),
    slab: int = 8,
    mesh=None,
    dtype=jnp.bfloat16,
    verbose: bool = True,
    hierarchical: bool | None = None,
    sparse_fetch: bool | None = None,
    coarse_density_only: bool | None = None,
    coarse_supersample: int | None = None,
) -> dict:
    """Full extraction: checkpoint -> dense colored occupancy volume dict.

    Queries the FINE field with a fixed canonical view direction
    (reference: scripts/extract_vol.py:85-120; loads only the fine model,
    :40-54 — but honours cfg.ngp instead of hardcoding NGP-large, fixing the
    reference quirk documented in SURVEY.md §7).

    hierarchical=True (default for resolutions >= 128) runs a coarse->fine
    two-level query: a supersampled coarse density pass marks candidate 4^3
    blocks (with dilation), and only those are refined at full resolution —
    empty space costs ~1/64th of an exhaustive query. Set hierarchical=False
    (CLI --exact) for the exhaustive reference-equivalent sweep.

    sparse_fetch (default: on for hierarchical, off for exact) fetches the
    occupancy bit-packed and the RGB compacted to occupied voxels — ~7x
    less host traffic at a 10%-occupied scene; unoccupied voxels' RGB
    becomes zeros (see _fetch_volumes). Exact mode defaults to the dense
    fetch so its volume.pth is byte-equivalent to the reference's.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    res = int(resolution or cfg.get("volume_resolution", 512))

    field_coarse, field_fine, shared = build_fields(cfg)
    if params is None:
        params = ckpt.load_field_params(cfg.checkpoint, cfg, which="fine")
    fine_params = params["model"] if "model" in params else params["fine"]
    fine_params = replicate(fine_params, mesh)

    view = np.asarray(view_direction, np.float32)
    view = tuple(float(v) for v in view / np.linalg.norm(view))

    if hierarchical is None:
        hierarchical = res >= 128 and res % 4 == 0
    if sparse_fetch is None:
        sparse_fetch = hierarchical
    if hierarchical:
        return _extract_hierarchical(
            cfg, field_fine, fine_params, res, bounds, view, mesh, dtype, verbose,
            sparse_fetch,
            coarse_density_only=coarse_density_only,
            coarse_supersample=coarse_supersample,
        )

    # pad x-slabs so every scan step processes n_dev * slab slices
    step_slices = n_dev * slab
    n_steps = -(-res // step_slices)
    padded = n_steps * step_slices

    # grid DP: x-slab indices sharded across the mesh, params replicated.
    # Results ACCUMULATE ON DEVICE into donated volume buffers — the host
    # loop only dispatches (async); a single fetch at the end pulls the
    # finished uint8 volumes. (Per-slab host fetches dominated wall time
    # through slow host links — see docs/PERF.md.)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P("data"))

    def slab_accum(params, sigma_vol, rgb_vol, zs):
        sig, rgb = _slab_query(field_fine, params, zs, res, bounds, view, dtype)
        rgb_u8 = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
        rgb_u8 = jnp.moveaxis(rgb_u8, 0, -1)  # [nz, R, R, 3]
        start = zs[0]
        sigma_vol = jax.lax.dynamic_update_slice(sigma_vol, sig, (start, 0, 0))
        rgb_vol = jax.lax.dynamic_update_slice(rgb_vol, rgb_u8, (start, 0, 0, 0))
        return sigma_vol, rgb_vol

    query = jax.jit(
        slab_accum,
        in_shardings=(repl, repl, repl, shard0),
        out_shardings=(repl, repl),
        donate_argnums=(1, 2),
    )

    t0 = time.time()
    # volumes padded along x to a whole number of sharded slab steps; padding
    # rows (queried with clamped coords) are sliced off before thresholding
    sigma_vol = jnp.zeros((padded, res, res), jnp.float32)
    rgb_vol = jnp.zeros((padded, res, res, 3), jnp.uint8)
    for s in range(n_steps):
        zs = np.minimum(
            np.arange(s * step_slices, (s + 1) * step_slices), res - 1
        ).astype(np.int32)
        sigma_vol, rgb_vol = query(fine_params, sigma_vol, rgb_vol, jnp.asarray(zs))

    sigma_vol = sigma_vol[:res]
    rgb_vol = rgb_vol[:res]
    threshold_dev = otsu_threshold(sigma_vol.reshape(res, -1))
    occupancy_dev = (sigma_vol > threshold_dev).astype(jnp.uint8)
    stats_dev = (
        jnp.min(sigma_vol), jnp.max(sigma_vol), jnp.mean(sigma_vol), jnp.std(sigma_vol)
    )
    jax.block_until_ready(occupancy_dev)
    threshold = float(threshold_dev)  # forces completion of all device work
    query_time = time.time() - t0

    occupancy, rgb_out, transfer_time, sparse_used, rgb_global_max = (
        _fetch_volumes(occupancy_dev, rgb_vol, res, sparse_fetch)
    )
    smin, smax, smean, sstd = (float(v) for v in jax.device_get(stats_dev))

    occupied = int(occupancy.sum())
    total = res**3
    if verbose:
        print(f"Otsu threshold: {threshold:.6f}")
        print(
            f"Occupied voxels: {occupied / total:.1%} ({occupied:,}/{total:,})"
        )
        print(
            f"Query time: {query_time:.1f}s for {total:,} voxels "
            f"(+{transfer_time:.1f}s host transfer)"
        )

    stats = {"min": smin, "max": smax, "mean": smean, "std": sstd}
    return {
        "occupancy_volume": occupancy,
        "rgb_volume": rgb_out,
        "metadata": {
            "resolution": res,
            "bounds": [float(bounds[0]), float(bounds[1])],
            "threshold": threshold,
            "occupied_ratio": occupied / total,
            "total_voxels": total,
            "occupied_voxels": occupied,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            "checkpoint_path": str(cfg.get("checkpoint", "")),
            "density_stats": stats,
            "view_direction": list(view),
            "query_seconds": query_time,
            "transfer_seconds": transfer_time,
            "sparse_fetch": bool(sparse_used),
            "rgb_global_max": rgb_global_max,
        },
    }


def _fetch_volumes(
    occupancy_dev, rgb_dev, res: int, sparse: bool
) -> tuple[np.ndarray, np.ndarray, float, bool, float]:
    """Pull the finished uint8 volumes to host; returns
    (occ, rgb, seconds, sparse_used, rgb_global_max) — sparse_used is False
    when the request fell back to the dense fetch (mostly-occupied volume).
    rgb_global_max is the pre-compaction max over the WHOLE device volume:
    the post-process normalizer (post_process_vol.py:87-93 divides by the
    global max), which compaction would otherwise shift when the brightest
    voxel is unoccupied.

    sparse=True replaces the dense 4*R^3-byte fetch with (a) the occupancy
    bit-packed on device (R^3/8 bytes) and (b) RGB gathered on device at the
    occupied voxels only (count*3 bytes, padded to a power of two). RGB of
    unoccupied voxels comes back as zeros — no downstream consumer reads it
    (post_process_vol.py:74-94 and all three GUIs index RGB by occupied
    voxels only), but the exact extraction mode keeps the dense fetch so
    volume.pth stays byte-equivalent to the reference contract
    (scripts/extract_vol.py:193-206).
    """
    t1 = time.time()
    occ_flat = occupancy_dev.reshape(-1)
    rgb_flat = rgb_dev.reshape(-1, 3)
    rgb_global_max = float(jnp.max(rgb_dev))
    total = res**3
    if sparse:
        bits = jax.jit(jnp.packbits)(occ_flat)
        occ_host = np.unpackbits(np.asarray(jax.device_get(bits)))[:total]
        count = int(occ_host.sum())
        # power-of-two pad bounds jit-cache variants to log2(R^3) programs
        K = 1 << max(12, (max(count, 1) - 1).bit_length())
        if K * 7 >= total * 4:  # sparse would move more bytes than dense
            sparse = False
        else:
            idx_host = np.flatnonzero(occ_host)

            @partial(jax.jit, static_argnums=2)
            def gather_occupied(occ_flat, rgb_flat, K):
                # jnp.nonzero(size=K) yields ascending indices (numpy
                # semantics) — matches np.flatnonzero order on the host side
                idx = jnp.nonzero(occ_flat, size=K, fill_value=0)[0]
                return jnp.take(rgb_flat, idx, axis=0)

            rgb_sparse = np.asarray(
                jax.device_get(gather_occupied(occ_flat, rgb_flat, K))
            )
            rgb_host = np.zeros((total, 3), np.uint8)
            rgb_host[idx_host] = rgb_sparse[: idx_host.shape[0]]
            occupancy = occ_host.reshape(res, res, res).astype(np.uint8)
            rgb_out = rgb_host.reshape(res, res, res, 3)
            return occupancy, rgb_out, time.time() - t1, True, rgb_global_max
    occupancy = np.asarray(jax.device_get(occupancy_dev)).reshape(res, res, res)
    rgb_out = np.asarray(jax.device_get(rgb_dev)).reshape(res, res, res, 3)
    return occupancy, rgb_out, time.time() - t1, False, rgb_global_max


def _dilate_mask(mask: np.ndarray) -> np.ndarray:
    """3^3 binary max-filter (one-cell dilation)."""
    out = mask.copy()
    p = np.pad(mask, 1)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                out |= p[
                    dx : dx + mask.shape[0],
                    dy : dy + mask.shape[1],
                    dz : dz + mask.shape[2],
                ]
    return out


def _extract_hierarchical(
    cfg, field, fine_params, res, bounds, view, mesh, dtype, verbose,
    sparse_fetch: bool = True,
    coarse_density_only: bool | None = None,
    coarse_supersample: int | None = None,
) -> dict:
    """Two-level extraction: supersampled coarse pass -> refine marked blocks.

    Empty space (the bulk of a [-1,1]^3 scene) is only touched by the coarse
    pass; this is what brings 512^3 extraction under the 60 s target on one
    v5e chip (the exhaustive sweep is 134M field queries).

    coarse_density_only (default: follows sparse_fetch) runs the mark pass
    through the density-only fused kernel — sigma is bit-identical to the
    full head, so marks/threshold/occupancy are unchanged; only the RGB of
    voxels in UNMARKED cells changes (to zeros). Those voxels are below the
    coarse margin, hence below the final Otsu threshold, hence unoccupied —
    and the sparse fetch already returns unoccupied RGB as zeros, so with
    sparse_fetch the output volume is byte-identical while the coarse pass
    skips the color MLP + SH and the [res2^3, 3] f32 RGB accumulator.

    coarse_supersample: subsamples per coarse cell per axis. Default
    (None) resolves to 1 (cell centers, 8x fewer coarse queries) under
    sparse_fetch and 2 (2^3-max mark) otherwise: the ss=1 mark was
    measured bit-identical (occupancy, RGB, threshold) to ss=2 on two
    real trained checkpoints under the sparse-fetch path while saving
    12-13.5 s warm at 512^3 (round-5c, benchmarks/extract_tuned.py;
    adopted by the pre-registered rule in benchmarks/r5_decision.py).
    The dense-fetch path keeps the conservative 2^3 mark because its
    unmarked-cell RGB is not masked by the occupancy bitmap.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    B = 4  # fine voxels per coarse cell per axis
    C = res // B
    if coarse_supersample is None:
        coarse_supersample = 1 if sparse_fetch else 2
    ss = int(coarse_supersample)
    if ss not in (1, 2):
        raise ValueError(f"coarse_supersample must be 1 or 2, got {ss}")
    res2 = ss * C  # supersampled coarse grid (ss^3 subsamples per cell)
    if coarse_density_only is None:
        coarse_density_only = sparse_fetch
    lo, hi = bounds
    n_dev = len(mesh.devices.ravel())

    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P("data"))

    t0 = time.time()
    # -- coarse pass (device-resident accumulation) ---------------------------
    step_slices = max(n_dev * 8, n_dev)
    n_csteps = -(-res2 // step_slices)
    padded2 = n_csteps * step_slices
    sig2 = jnp.zeros((padded2, res2, res2), jnp.float32)
    if coarse_density_only:
        def coarse_accum_d(params, cs_vol, zs):
            sig = _slab_query_density(field, params, zs, res2, bounds, dtype)
            return jax.lax.dynamic_update_slice(cs_vol, sig, (zs[0], 0, 0))

        coarse_query = jax.jit(
            coarse_accum_d,
            in_shardings=(repl, repl, shard0),
            out_shardings=repl,
            donate_argnums=(1,),
        )
        rgb2 = None
        for s in range(n_csteps):
            zs = np.minimum(
                np.arange(s * step_slices, (s + 1) * step_slices), res2 - 1
            ).astype(np.int32)
            sig2 = coarse_query(fine_params, sig2, jnp.asarray(zs))
    else:
        def coarse_accum(params, cs_vol, cr_vol, zs):
            sig, rgb = _slab_query(field, params, zs, res2, bounds, view, dtype)
            start = zs[0]
            cs_vol = jax.lax.dynamic_update_slice(cs_vol, sig, (start, 0, 0))
            cr_vol = jax.lax.dynamic_update_slice(
                cr_vol, jnp.moveaxis(rgb, 0, -1), (start, 0, 0, 0)
            )
            return cs_vol, cr_vol

        coarse_query = jax.jit(
            coarse_accum,
            in_shardings=(repl, repl, repl, shard0),
            out_shardings=(repl, repl),
            donate_argnums=(1, 2),
        )
        rgb2 = jnp.zeros((padded2, res2, res2, 3), jnp.float32)
        for s in range(n_csteps):
            zs = np.minimum(
                np.arange(s * step_slices, (s + 1) * step_slices), res2 - 1
            ).astype(np.int32)
            sig2, rgb2 = coarse_query(fine_params, sig2, rgb2, jnp.asarray(zs))
        rgb2 = rgb2[:res2]
    sig2 = sig2[:res2]

    # per-cell max over the ss^3 subsamples; broadcast defaults to full res —
    # all on device; only the [C^3] cell maxima come to host (for argwhere).
    @jax.jit
    def coarse_reduce(sig2, rgb2):
        if ss == 1:
            cell_sigma = sig2
        else:
            cell_sigma = sig2.reshape(C, ss, C, ss, C, ss).max(axis=(1, 3, 5))
        def rep(a):
            return jnp.repeat(jnp.repeat(jnp.repeat(a, B, 0), B, 1), B, 2)
        sigma_vol = rep(cell_sigma)
        if rgb2 is None:
            rgb_vol = jnp.zeros((res, res, res, 3), jnp.uint8)
        else:
            cell_rgb = rgb2[::ss, ::ss, ::ss]
            rgb_vol = jnp.clip(
                jnp.round(rep(cell_rgb) * 255.0), 0, 255
            ).astype(jnp.uint8)
        return cell_sigma, sigma_vol, rgb_vol

    cell_sigma_dev, sigma_vol, rgb_vol = coarse_reduce(sig2, rgb2)
    sigma_vol = sigma_vol.reshape(res**3)
    rgb_vol = rgb_vol.reshape(res**3, 3)
    cell_sigma = np.asarray(jax.device_get(cell_sigma_dev))

    coarse_thresh = float(otsu_threshold(jnp.asarray(cell_sigma.reshape(C, -1))))
    margin = 0.25 * coarse_thresh
    marked = _dilate_mask(cell_sigma > margin)
    n_marked = int(marked.sum())
    if verbose:
        print(
            f"Hierarchical extraction: {n_marked}/{C**3} cells marked "
            f"({n_marked / C**3:.1%}), coarse otsu {coarse_thresh:.4f}"
        )

    # -- fine pass over marked cells (device-side scatter) --------------------
    cells = np.argwhere(marked).astype(np.int32)  # [M, 3]
    CH = max(8192 // n_dev * n_dev, n_dev)  # cells per chunk
    step = (hi - lo) / (res - 1)

    off = np.stack(
        np.meshgrid(np.arange(B), np.arange(B), np.arange(B), indexing="ij"), -1
    ).reshape(-1, 3)  # [64, 3]

    def fine_accum(params, sigma_vol, rgb_vol, cx, cy, cz):
        # cell coords arrive as float32 and are floored/clipped in-graph:
        # index arrays fed straight from host inputs can push XLA's
        # gather/scatter emitters onto a ~100x slower path (docs/PERF.md).
        def vox(cb, o):
            ci = jnp.clip(jnp.floor(cb), 0, C - 1).astype(jnp.int32)
            return jnp.clip(ci[:, None] * B + o[None, :], 0, res - 1)

        xi = vox(cx, jnp.asarray(off[:, 0]))
        yi = vox(cy, jnp.asarray(off[:, 1]))
        zi = vox(cz, jnp.asarray(off[:, 2]))
        px = (lo + xi.astype(jnp.float32) * step).reshape(-1)
        py = (lo + yi.astype(jnp.float32) * step).reshape(-1)
        pz = (lo + zi.astype(jnp.float32) * step).reshape(-1)
        vx = jnp.full_like(px, view[0])
        vy = jnp.full_like(px, view[1])
        vz = jnp.full_like(px, view[2])
        rgb, sigma = _field_eval(field, params, (px, py, pz), (vx, vy, vz), dtype)
        flat = ((xi * res + yi) * res + zi).reshape(-1)
        sigma_vol = sigma_vol.at[flat].set(sigma.astype(jnp.float32), mode="drop")
        rgb_u8 = jnp.clip(jnp.round(rgb.astype(jnp.float32) * 255.0), 0, 255).astype(
            jnp.uint8
        )
        rgb_vol = rgb_vol.at[flat].set(rgb_u8.T, mode="drop")
        return sigma_vol, rgb_vol

    fine_jit = jax.jit(
        fine_accum,
        in_shardings=(repl, repl, repl, shard0, shard0, shard0),
        out_shardings=(repl, repl),
        donate_argnums=(1, 2),
    )

    for start in range(0, len(cells), CH):
        chunk = cells[start : start + CH]
        n = len(chunk)
        if n < CH:  # pad by repeating the first cell (rewrites same voxels)
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], CH - n, axis=0)])
        sigma_vol, rgb_vol = fine_jit(
            fine_params,
            sigma_vol,
            rgb_vol,
            jnp.asarray(chunk[:, 0].astype(np.float32)),
            jnp.asarray(chunk[:, 1].astype(np.float32)),
            jnp.asarray(chunk[:, 2].astype(np.float32)),
        )

    threshold_dev = otsu_threshold(sigma_vol.reshape(res, -1))
    occupancy_dev = (sigma_vol > threshold_dev).astype(jnp.uint8).reshape(res, res, res)
    stats_dev = (
        jnp.min(sigma_vol), jnp.max(sigma_vol), jnp.mean(sigma_vol), jnp.std(sigma_vol)
    )
    threshold = float(threshold_dev)  # sync point: device work done
    query_time = time.time() - t0

    occupancy, rgb_out, transfer_time, sparse_used, rgb_global_max = (
        _fetch_volumes(occupancy_dev, rgb_vol, res, sparse_fetch)
    )
    smin, smax, smean, sstd = (float(v) for v in jax.device_get(stats_dev))

    occupied = int(occupancy.sum())
    total = res**3
    if verbose:
        print(f"Otsu threshold: {threshold:.6f}")
        print(f"Occupied voxels: {occupied / total:.1%} ({occupied:,}/{total:,})")
        print(
            f"Query time: {query_time:.1f}s ({n_marked * B**3 + res2**3:,} queries, "
            f"+{transfer_time:.1f}s host transfer)"
        )

    stats = {"min": smin, "max": smax, "mean": smean, "std": sstd}
    return {
        "occupancy_volume": occupancy,
        "rgb_volume": rgb_out,
        "metadata": {
            "resolution": res,
            "bounds": [float(bounds[0]), float(bounds[1])],
            "threshold": threshold,
            "occupied_ratio": occupied / total,
            "total_voxels": total,
            "occupied_voxels": occupied,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            "checkpoint_path": str(cfg.get("checkpoint", "")),
            "density_stats": stats,
            "view_direction": list(view),
            "query_seconds": query_time,
            "transfer_seconds": transfer_time,
            "sparse_fetch": bool(sparse_used),
            "rgb_global_max": rgb_global_max,
            "hierarchical": True,
            "marked_cells": n_marked,
            "coarse_density_only": bool(coarse_density_only),
            "coarse_supersample": ss,
        },
    }


def save_volume(volume: dict, output_path: str | Path) -> None:
    """Write volume.pth (torch-compatible, contract per SURVEY.md §7.6)."""
    output_path = Path(output_path)
    if output_path.suffix.lower() != ".pth":
        raise ValueError(f"Unsupported output format: {output_path.suffix}")
    pth.save(
        {
            "occupancy_volume": volume["occupancy_volume"].astype(np.uint8),
            "rgb_volume": volume["rgb_volume"].astype(np.uint8),
            "metadata": volume["metadata"],
        },
        output_path,
    )
    print(f"Saved colored occupancy volume with metadata: {output_path}")


def load_volume(path: str | Path) -> dict:
    return pth.load(path)
