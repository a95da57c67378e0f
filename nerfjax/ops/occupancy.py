"""Occupancy-grid accelerated ray sampling (empty-space skipping).

The reference samples 64+192 points uniformly per ray regardless of scene
content (scripts/sampling.py, cfg N_samples/N_importance). Real Instant-NGP
gets its speed from an occupancy bitfield that concentrates samples in
non-empty space; the reference dropped that part. This module adds it back,
TPU-style with fully static shapes:

  * a dense density grid (default 128^3) maintained as an EMA of field
    queries at jittered cell centers (instant-ngp's decay-and-max update),
  * per-ray piecewise-constant sampling weights from the grid (one in-graph
    gather per segment midpoint — the fast XLA gather path),
  * inverse-CDF sampling against those weights (reusing render.sample_pdf)
    with a uniform exploration floor, so rays still see every region with
    low probability.

Everything is jit-compatible: the grid lives in the train state and updates
under lax.cond every `update_every` steps.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.render import sample_pdf


@dataclasses.dataclass(frozen=True)
class OccupancyGridSpec:
    resolution: int = 128
    decay: float = 0.95
    update_every: int = 16
    threshold: float = 1e-2
    floor: float = 0.02  # uniform exploration mass per segment
    n_segments: int = 128  # piecewise-constant resolution along each ray
    # Refresh only 1/P of the cells per update (rotating interleaved subset;
    # phase advances each update so every cell refreshes every P updates).
    # P=1 is the exact full refresh. P>1 cuts the update's field-query cost
    # by P at the price of staleness bounded by P*update_every steps; occupied
    # cells sit orders of magnitude above `threshold`, so the extra decay
    # (decay^P between refreshes) does not flip their occupancy bit.
    update_partitions: int = 1
    # Stratified arithmetic inverse-CDF sampler (see _sample_cdf_fast):
    # measured 55.5 -> ~15 ms of the tuned v5e step (docs/PERF.md round 4).
    # False = the reference-shaped sample_pdf path (iid uniforms +
    # searchsorted + per-ray sort).
    fast_cdf: bool = False


def init_grid(spec: OccupancyGridSpec) -> jnp.ndarray:
    """Start fully occupied so early training samples everywhere."""
    return jnp.ones((spec.resolution**3,), jnp.float32)


def update_grid(
    spec: OccupancyGridSpec,
    grid: jnp.ndarray,
    field,
    params,
    key: jax.Array,
    phase: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """EMA density refresh: grid <- max(decay*grid, sigma(jittered centers)).

    With spec.update_partitions == P > 1, only the rotating interleaved
    subset {lin : lin % P == phase} is re-queried (1/P of the field-eval
    cost); every cell still decays each update, so the full-refresh P=1 path
    is the exact special case. `phase` may be a traced int32 scalar (the
    caller advances it per update, e.g. (step // update_every) % P).
    """
    r = spec.resolution
    P = int(spec.update_partitions)
    kx, ky, kz = jax.random.split(key, 3)
    cell = 2.0 / r
    # cell-center coordinates per axis, plus uniform jitter within the cell
    centers = (jnp.arange(r, dtype=jnp.float32) + 0.5) * cell - 1.0

    n = r**3 // P
    # Normalize defensively: an out-of-range traced phase would gather
    # wrapped cells while dynamic_slice clamps the written column.
    ph = jnp.asarray(phase, jnp.int32) % P
    if P == 1:
        lin = jnp.arange(r**3, dtype=jnp.int32)
    else:
        if r**3 % P:
            raise ValueError(f"update_partitions={P} must divide resolution^3")
        # interleaved subset; phase stays in-graph (fast derived-index path)
        lin = jnp.arange(n, dtype=jnp.int32) * P + ph

    # component vectors via broadcasted iota (x fastest, like the grid
    # linearization idx = x + y*r + z*r^2)
    ix = lin % r
    iy = (lin // r) % r
    iz = lin // (r * r)
    jx = jax.random.uniform(kx, (n,), jnp.float32, -0.5, 0.5) * cell
    jy = jax.random.uniform(ky, (n,), jnp.float32, -0.5, 0.5) * cell
    jz = jax.random.uniform(kz, (n,), jnp.float32, -0.5, 0.5) * cell
    px = jnp.take(centers, ix) + jx
    py = jnp.take(centers, iy) + jy
    pz = jnp.take(centers, iz) + jz

    sigma, _ = field.query_density_planar(params, (px, py, pz))
    sigma = sigma.astype(jnp.float32)
    if P == 1:
        return jnp.maximum(grid * spec.decay, sigma)
    decayed = grid * spec.decay
    # refreshed subset = every P-th element: a strided column of the [n, P]
    # view — one dynamic_slice + dynamic_update_slice, no scatter.
    g2 = decayed.reshape(n, P)
    col = jax.lax.dynamic_slice(g2, (jnp.int32(0), ph), (n, 1))
    col = jnp.maximum(col, sigma[:, None])
    g2 = jax.lax.dynamic_update_slice(g2, col, (jnp.int32(0), ph))
    return g2.reshape(-1)


def _grid_lookup(spec: OccupancyGridSpec, grid, px, py, pz):
    """Density at positions in [-1,1] (nearest cell)."""
    r = spec.resolution
    def to_idx(p):
        return jnp.clip(((p + 1.0) * 0.5 * r).astype(jnp.int32), 0, r - 1)
    idx = to_idx(px) + to_idx(py) * r + to_idx(pz) * (r * r)
    return jnp.take(grid, idx, axis=0)


def segment_weights(
    spec: OccupancyGridSpec,
    grid: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray piecewise weights over n_segments uniform bins.

    Returns (bin_edges [B, M+1], weights [B, M])."""
    B = rays_o.shape[0]
    M = spec.n_segments
    near = t_near.reshape(-1, 1)
    far = t_far.reshape(-1, 1)
    t = jnp.linspace(0.0, 1.0, M + 1, dtype=jnp.float32)[None, :]
    edges = near * (1.0 - t) + far * t  # [B, M+1]
    mid = 0.5 * (edges[:, 1:] + edges[:, :-1])  # [B, M]

    px = rays_o[:, 0:1] + rays_d[:, 0:1] * mid
    py = rays_o[:, 1:2] + rays_d[:, 1:2] * mid
    pz = rays_o[:, 2:3] + rays_d[:, 2:3] * mid
    occ = _grid_lookup(spec, grid, px.reshape(-1), py.reshape(-1), pz.reshape(-1))
    occ = occ.reshape(B, M)
    w = (occ > spec.threshold).astype(jnp.float32) + spec.floor
    return edges, w


def _sample_cdf_fast(
    key: jax.Array,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    w: jnp.ndarray,
    n_samples: int,
) -> jnp.ndarray:
    """Stratified arithmetic inverse-CDF over UNIFORM segment bins.

    Distribution-equivalent to `sort(sample_pdf(...))` over the same
    piecewise-constant weights, with three v5e-measured cost cuts
    (docs/PERF.md round 4 — the sampler was 55.5 ms ≈ 30% of the tuned
    187 ms step):

      * STRATIFIED uniforms u[s] = (s + xi)/n per ray instead of iid draws:
        u is monotone, so z = F^{-1}(u) comes out sorted — the per-ray sort
        disappears (and intra-ray sample variance drops; standard NeRF
        stratification, same family as the coarse stratified sampler).
      * segment lookup by COMPARE-SUM against the CDF (a [B, n, M] VPU
        streaming reduction) instead of vmap'd `searchsorted` (a while loop
        issuing per-iteration gathers).
      * the segment bins are uniform in [near, far], so bin edges are
        ARITHMETIC in the segment index — only 2 gathers per sample
        (cdf[below], pdf[below]) vs sample_pdf's 4 take_along_axis.
    """
    B, M = w.shape
    w = w + 1e-5  # same degenerate-weight guard as sample_pdf
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)  # [B, M]; cdf[..., -1] ~ 1

    s = jnp.arange(n_samples, dtype=jnp.float32)[None, :]
    xi = jax.random.uniform(key, (B, n_samples), jnp.float32)
    u = (s + xi) * np.float32(1.0 / n_samples)  # [B, n] monotone per ray

    # below[b,s] = #{m < M-1 : cdf[b,m] <= u[b,s]} in 0..M-1
    below = jnp.sum(
        (u[:, :, None] >= cdf[:, None, : M - 1]).astype(jnp.int32), axis=-1
    )
    cdf_ext = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
    cdf_b = jnp.take_along_axis(cdf_ext, below, axis=-1)  # CDF at bin start
    denom = jnp.take_along_axis(pdf, below, axis=-1)
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)

    near = t_near.reshape(-1, 1)
    far = t_far.reshape(-1, 1)
    width = (far - near) * np.float32(1.0 / M)
    t = (u - cdf_b) / denom
    # float32 cumsum can leave cdf[-1] marginally below u, overshooting far
    # by ~1e-5; clip to honour the [near, far] contract exactly.
    return jnp.clip(near + (below.astype(jnp.float32) + t) * width, near, far)


def occupancy_sample(
    spec: OccupancyGridSpec,
    grid: jnp.ndarray,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    n_samples: int,
) -> jnp.ndarray:
    """Occupancy-weighted stratified depths z [B, n_samples] (sorted)."""
    edges, w = segment_weights(spec, grid, rays_o, rays_d, t_near, t_far)
    if spec.fast_cdf:
        return _sample_cdf_fast(key, t_near, t_far, w, n_samples)
    z = sample_pdf(key, edges, w, n_samples)
    return jnp.sort(z, axis=-1)
