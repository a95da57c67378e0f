"""TPU-optimized multiresolution hash-grid encoding.

Replaces tiny-cuda-nn's fused HashGrid CUDA kernels (reference:
scripts/instantngp.py:23-33) with a design built around measured v5e
characteristics (see docs/PERF.md):

  * XLA gather costs ~6-9 ns per INDEX, nearly independent of fetch width
    (<=16 lanes) — so fetch as much as possible per index:
      - DENSE levels store "cell rows": all 8 corners x 2 features of a cell
        contiguously -> ONE width-16 gather per point-level (22x fewer index
        ops than per-corner fetches). Cell-row tables are assembled from the
        canonical plane parameters by 8 shifted slices (pure streaming);
        autodiff turns that back into streaming adds, so dense levels need
        no scatter at all for the table-building step.
      - HASH levels pack the 2 bf16 features of an entry into one f32 word
        -> one width-1 gather per corner fetches both features (2.8x fewer
        ns per feature than two f32 gathers).
  * scatter-add costs ~5-7 ns per ELEMENT regardless of width — the hash
    backward is the step's hard floor; a custom VJP recomputes indices
    instead of saving the [8L, N] index tensor.
  * small minor dims ([N,3], [N,16,8]) pad to 128 lanes and waste up to 42x
    HBM; everything here is FEATURE-MAJOR: positions arrive as three [N]
    component vectors, intermediates are [8, N] / [L, N], and the encoding
    is returned as [L*F, N].

Semantics match nerfjax.fields.ngp.hashgrid_encode (the reference jnp
implementation kept as the test oracle) up to bf16 rounding of hash-level
table values.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.fields.ngp import HashGridSpec, _CORNERS, _HASH_PRIMES


def _split_levels(spec: HashGridSpec):
    levels = spec.level_params()
    dense = [lp for lp in levels if not lp["use_hash"]]
    hashed = [lp for lp in levels if lp["use_hash"]]
    # tcnn level scales grow monotonically: dense levels are a prefix.
    assert dense + hashed == levels
    return dense, hashed


# ---------------------------------------------------------------------------
# Hash levels: pair-packed gather with custom VJP
# ---------------------------------------------------------------------------


def _pack_pairs_bf16(planes: jnp.ndarray) -> jnp.ndarray:
    """[2, T] f32 -> [T] f32 whose bits hold (plane1_bf16 << 16) | plane0_bf16."""
    p = planes.astype(jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type(p[0], jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(p[1], jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(lo | (hi << 16), jnp.float32)


def _unpack_pairs(words: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 words -> (plane0, plane1) as f32 (bf16 values widened)."""
    u = jax.lax.bitcast_convert_type(words, jnp.uint32)
    f0 = jax.lax.bitcast_convert_type((u << 16).astype(jnp.uint32), jnp.float32)
    f1 = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32)
    return f0, f1


def _hash_level_indices(
    spec: HashGridSpec, hashed: list[dict], x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray
) -> jnp.ndarray:
    """[Lh*8, N] int32 indices into the concatenated hash-level table.

    Row order: (level-within-hashed, corner) — row = l*8 + c.
    Offsets are relative to the first hash level's slice. Vectorized over
    levels ([Lh, N] intermediates — last-two-dims layout, no lane padding).
    """
    base = hashed[0]["offset"]
    mask = np.uint32(spec.hashmap_size - 1)
    scales = jnp.asarray([lp["scale"] for lp in hashed], jnp.float32)[:, None]
    offs = jnp.asarray([lp["offset"] - base for lp in hashed], jnp.int32)[:, None]
    Lh = len(hashed)

    ix = jnp.floor(x[None, :] * scales + 0.5).astype(jnp.int32)  # [Lh, N]
    iy = jnp.floor(y[None, :] * scales + 0.5).astype(jnp.int32)
    iz = jnp.floor(z[None, :] * scales + 0.5).astype(jnp.int32)

    corners = []
    for dx, dy, dz in _CORNERS:
        h = (
            (ix + dx).astype(jnp.uint32) * _HASH_PRIMES[0]
            ^ (iy + dy).astype(jnp.uint32) * _HASH_PRIMES[1]
            ^ (iz + dz).astype(jnp.uint32) * _HASH_PRIMES[2]
        )
        corners.append((h & mask).astype(jnp.int32) + offs)
    idx = jnp.stack(corners, axis=1)  # [Lh, 8, N]
    return idx.reshape(Lh * 8, -1)


def _corner_weights(
    levels: list[dict], x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, clamp: bool
) -> jnp.ndarray:
    """[L*8, N] trilinear weights, row = l*8 + c (same order as indices)."""
    scales = jnp.asarray([lp["scale"] for lp in levels], jnp.float32)[:, None]
    px = x[None, :] * scales + 0.5  # [L, N]
    py = y[None, :] * scales + 0.5
    pz = z[None, :] * scales + 0.5
    if clamp:
        rmax = jnp.asarray([lp["res"] - 2 for lp in levels], jnp.float32)[:, None]
        bx = jnp.clip(jnp.floor(px), 0, rmax)
        by = jnp.clip(jnp.floor(py), 0, rmax)
        bz = jnp.clip(jnp.floor(pz), 0, rmax)
        tx = jnp.clip(px - bx, 0.0, 1.0)
        ty = jnp.clip(py - by, 0.0, 1.0)
        tz = jnp.clip(pz - bz, 0.0, 1.0)
    else:
        tx, ty, tz = px - jnp.floor(px), py - jnp.floor(py), pz - jnp.floor(pz)
    rows = []
    for dx, dy, dz in _CORNERS:
        wx = tx if dx else (1.0 - tx)
        wy = ty if dy else (1.0 - ty)
        wz = tz if dz else (1.0 - tz)
        rows.append(wx * wy * wz)
    w = jnp.stack(rows, axis=1)  # [L, 8, N]
    return w.reshape(w.shape[0] * 8, -1)


def _draw_corners(
    x: jnp.ndarray,
    y: jnp.ndarray,
    z: jnp.ndarray,
    cdf: jnp.ndarray,
    Lh: int,
    k: int,
    salt: int = 0,
) -> jnp.ndarray:
    """k iid corner draws per (level, point): P(corner) = trilinear weight.

    Returns [k, Lh, N] int32 in 0..7. Randomness derives from the sample
    POSITION BITS (positions are re-jittered every training step), so the
    sequence is deterministic per position: draw j is the j-th element of a
    fixed salted hash sequence. That determinism is load-bearing — a
    backward that replays the first b <= k draws reproduces exactly the
    corners the forward gathered, without saving them as residuals.
    TRAIN-ONLY assumption (same as the stochastic backward below): with an
    un-jittered sampler or duplicate positions the draws repeat every step
    and the estimator noise correlates.
    """
    bx = jax.lax.bitcast_convert_type(x, jnp.uint32)
    by = jax.lax.bitcast_convert_type(y, jnp.uint32)
    bz = jax.lax.bitcast_convert_type(z, jnp.uint32)
    seed = (
        bx * np.uint32(0x9E3779B1)
        ^ by * np.uint32(0x85EBCA77)
        ^ bz * np.uint32(0xC2B2AE3D)
    ) ^ np.uint32(salt & 0xFFFFFFFF)  # [N]; salt decorrelates draw families
    lvl = (
        jnp.arange(Lh, dtype=jnp.uint32)[:, None] * np.uint32(2654435761)
    )  # [Lh, 1]
    draws = []
    for j in range(k):
        h = (seed[None, :] ^ lvl) + np.uint32((j * 0x7F4A7C15) & 0xFFFFFFFF)
        h = (h ^ (h >> 15)) * np.uint32(0x2C1B3C6D)
        h = h ^ (h >> 12)
        u = (h >> 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))  # [Lh,N)
        u = u * cdf[:, 7, :]  # guard against float cumsum < 1
        c = jnp.sum(
            (u[:, None, :] >= cdf[:, :7, :]).astype(jnp.int32), axis=1
        )  # [Lh, N] in 0..7
        draws.append(c)
    return jnp.stack(draws)  # [k, Lh, N]


def _select_drawn_indices(idx3: jnp.ndarray, draws: jnp.ndarray) -> jnp.ndarray:
    """Gather-free corner-id -> table-index select.

    idx3: [Lh, 8, N] per-corner table indices; draws: [k, Lh, N] corner ids.
    Returns [k, Lh, N]. Uses a one-hot multiply-sum (VPU streaming) instead
    of a gather — corner selection must not itself cost gather issue slots.
    """
    corner8 = jnp.arange(8, dtype=jnp.int32)[None, :, None]  # [1, 8, 1]
    out = []
    for j in range(draws.shape[0]):
        onehot = (corner8 == draws[j][:, None, :]).astype(jnp.int32)  # [Lh,8,N]
        out.append(jnp.sum(idx3 * onehot, axis=1))  # [Lh, N]
    return jnp.stack(out)


# salt for the level-subset draw family (grad_levels): decorrelates the
# per-point level draws from the corner draws at the same position
_LEVEL_SALT = 0x85EBCA6B


def _draw_levels(x, y, z, Lh: int, g: int, salt: int) -> jnp.ndarray:
    """g iid uniform level draws per point -> [g, N] int32 in 0..Lh-1.

    Same position-bit randomness scheme as _draw_corners (deterministic
    per position; per-step sample jitter decorrelates across steps)."""
    bx = jax.lax.bitcast_convert_type(x, jnp.uint32)
    by = jax.lax.bitcast_convert_type(y, jnp.uint32)
    bz = jax.lax.bitcast_convert_type(z, jnp.uint32)
    seed = (
        bx * np.uint32(0x9E3779B1)
        ^ by * np.uint32(0x85EBCA77)
        ^ bz * np.uint32(0xC2B2AE3D)
    ) ^ np.uint32(salt & 0xFFFFFFFF)  # [N]
    ids = []
    for j in range(g):
        h = seed + np.uint32((j * 0x7F4A7C15) & 0xFFFFFFFF)
        h = (h ^ (h >> 15)) * np.uint32(0x2C1B3C6D)
        h = h ^ (h >> 12)
        u = (h >> 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
        ids.append(jnp.minimum((u * Lh).astype(jnp.int32), Lh - 1))
    return jnp.stack(ids)  # [g, N]


def _level_subsample(sel, coef, g, x, y, z, Lh: int, gl: int):
    """Unbiased level-subset backward: keep gl iid level draws per point.

    sel/coef: the [b, Lh, N] corner plan; g: [2, Lh, N] upstream grads.
    Each point scatters only gl of its Lh per-level contributions, scaled
    Lh/gl — E[estimate] = the full per-level sum (uniform iid draws), so
    composing with the (independent, differently salted) corner draws
    stays an unbiased estimate of the exact trilinear table gradient.
    Returns flattened (sel, gv0, gv1) with b*gl*N entries instead of
    b*Lh*N — the scatter volume, the dominant backward cost on v5e
    (docs/PERF.md round-5c attribution), shrinks by Lh/gl. The level
    select itself is a one-hot multiply-sum (VPU streaming, no gather).
    """
    ids = _draw_levels(x, y, z, Lh, gl, _LEVEL_SALT)  # [gl, N]
    lane = jnp.arange(Lh, dtype=jnp.int32)[None, :, None]  # [1, Lh, 1]
    lhot_i = (lane == ids[:, None, :]).astype(jnp.int32)  # [gl, Lh, N]
    lhot_f = lhot_i.astype(jnp.float32)
    scale = np.float32(Lh / gl)
    sel_s = jnp.sum(sel[:, None] * lhot_i[None], axis=2)  # [b, gl, N]
    gv0 = jnp.sum((g[0][None] * coef)[:, None] * lhot_f[None], axis=2) * scale
    gv1 = jnp.sum((g[1][None] * coef)[:, None] * lhot_f[None], axis=2) * scale
    return sel_s.reshape(-1), gv0.reshape(-1), gv1.reshape(-1)


def _stochastic_corner_plan(hashed, x, y, z, idx3, k: int, *, clamp=False, salt=0):
    """(sel [k,Lh,N] int32, coef [k,Lh,N] f32): an unbiased k-gather plan.

    sum_j coef_j * f[sel_j] is an unbiased estimate of the exact trilinear
    interpolation sum_c w_c f_c, and scattering coef_j * g to sel_j is an
    unbiased estimate of the exact gradient w_c * g. Two schemes:

      k == 1: one iid draw with P(corner) = w (coef = 1) — the importance
              factor w/p cancels.
      k >= 2: LEADER + RESIDUAL (variance reduction): the max-weight corner
              m is taken DETERMINISTICALLY with coef = w_m, and k-1 iid
              draws come from the residual distribution wr = w with w_m
              zeroed, each with coef = (sum wr)/(k-1). Unbiased by the same
              cancellation, but the leader term — on average ~0.4 of the
              total mass for uniformly placed samples — contributes zero
              variance, so this strictly dominates k iid draws at equal
              gather count.

    The same deterministic position-bit draws (_draw_corners) back both the
    forward estimator and its VJP: calling with equal k replays identical
    (sel, coef), so the backward of a stochastic forward is its exact VJP
    without residuals.
    """
    Lh, _, N = idx3.shape
    w = _corner_weights(hashed, x, y, z, clamp=clamp).reshape(Lh, 8, N)
    if k == 1:
        cdf = jnp.cumsum(w, axis=1)  # [Lh, 8, N]; last column ~ 1.0
        sel = _select_drawn_indices(
            idx3, _draw_corners(x, y, z, cdf, Lh, 1, salt=salt)
        )
        return sel, jnp.ones((1, Lh, N), jnp.float32)
    m = jnp.argmax(w, axis=1).astype(jnp.int32)  # [Lh, N]
    corner8 = jnp.arange(8, dtype=jnp.int32)[None, :, None]
    onehot_m = (corner8 == m[:, None, :]).astype(jnp.float32)  # [Lh, 8, N]
    wstar = jnp.max(w, axis=1)  # [Lh, N]
    wr = w * (1.0 - onehot_m)
    cdfr = jnp.cumsum(wr, axis=1)
    total = cdfr[:, 7, :]  # = 1 - wstar (exactly the drawn mass)
    sel_m = jnp.sum(idx3 * onehot_m.astype(jnp.int32), axis=1)  # [Lh, N]
    draws = _draw_corners(x, y, z, cdfr, Lh, k - 1, salt=salt)  # u scaled by total
    sel_r = _select_drawn_indices(idx3, draws)  # [k-1, Lh, N]
    sel = jnp.concatenate([sel_m[None], sel_r], axis=0)
    coef_r = jnp.broadcast_to(
        total[None] * np.float32(1.0 / (k - 1)), (k - 1, Lh, N)
    )
    coef = jnp.concatenate([wstar[None], coef_r], axis=0)
    return sel, coef


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hash_levels_encode(spec: HashGridSpec, hash_planes, x, y, z):
    """Encode all hash levels: -> [Lh, N] per plane, stacked as [2, Lh, N].

    hash_planes: [2, T_hash] f32 slice of the full plane table covering the
    hash levels.
    """
    out, _ = _hash_levels_fwd(spec, hash_planes, x, y, z)
    return out


def _hash_levels_fwd(spec, hash_planes, x, y, z):
    _, hashed = _split_levels(spec)
    Lh = len(hashed)
    N = x.shape[0]
    idx = _hash_level_indices(spec, hashed, x, y, z)  # [Lh*8, N]
    packed = _pack_pairs_bf16(hash_planes)  # [T_hash]
    fwd = int(getattr(spec, "fwd_corners", 8))
    if fwd >= 8:
        words = jnp.take(packed, idx.reshape(-1), axis=0).reshape(idx.shape)
        f0, f1 = _unpack_pairs(words)  # [Lh*8, N] each
        w = _corner_weights(hashed, x, y, z, clamp=False)  # [Lh*8, N]
        e0 = jnp.sum((f0 * w).reshape(Lh, 8, N), axis=1)  # [Lh, N]
        e1 = jnp.sum((f1 * w).reshape(Lh, 8, N), axis=1)
        # residuals: positions only — indices/weights are recomputed in bwd
        return jnp.stack([e0, e1]), (x, y, z)

    # Stochastic forward (fwd_corners = k < 8): dithered trilinear via
    # _stochastic_corner_plan — unbiased for the exact interpolation, with
    # leader+residual variance reduction at k >= 2. Gather volume for the
    # hashed levels (45% of the tuned v5e step, docs/PERF.md) shrinks by
    # 8/k. TRAIN-ONLY (see _draw_corners): eval/extract/render paths
    # construct specs with fwd_corners=8 (nerfjax.train.build_fields gates
    # the knob behind train=True).
    sel, coef = _stochastic_corner_plan(hashed, x, y, z, idx.reshape(Lh, 8, N), fwd)
    words = jnp.take(packed, sel.reshape(-1), axis=0).reshape(fwd, Lh, N)
    f0, f1 = _unpack_pairs(words)
    e0 = jnp.sum(f0 * coef, axis=0)  # [Lh, N]
    e1 = jnp.sum(f1 * coef, axis=0)
    return jnp.stack([e0, e1]), (x, y, z)


def _hash_levels_bwd(spec, res, g):
    x, y, z = res
    _, hashed = _split_levels(spec)
    Lh = len(hashed)
    N = x.shape[0]
    T_hash = sum(lp["size"] for lp in hashed)
    k = int(getattr(spec, "grad_corners", 8))
    fwd = int(getattr(spec, "fwd_corners", 8))
    if fwd < 8:
        # Backward of the stochastic forward. The estimator is linear in
        # the table, so its exact VJP scatters coef_j * g to each planned
        # corner; _stochastic_corner_plan is deterministic in the position
        # bits, so re-planning with b == fwd reproduces exactly the
        # forward's (sel, coef) without residuals. grad_corners < fwd
        # instead re-plans with b draws — a different but equally unbiased
        # estimate of the true trilinear gradient (precedent: the k<8
        # backward under the exact forward is already an independent
        # estimator, not the forward's VJP).
        b = min(k, fwd)
        idx3 = _hash_level_indices(spec, hashed, x, y, z).reshape(Lh, 8, N)
        sel, coef = _stochastic_corner_plan(hashed, x, y, z, idx3, b)
        gl = int(getattr(spec, "grad_levels", 0))
        if 0 < gl < Lh:
            sel, gv0, gv1 = _level_subsample(sel, coef, g, x, y, z, Lh, gl)
        else:
            sel = sel.reshape(-1)
            gv0 = (g[0][None] * coef).reshape(-1)
            gv1 = (g[1][None] * coef).reshape(-1)
        grad0 = jnp.zeros((T_hash,), jnp.float32).at[sel].add(gv0, mode="drop")
        grad1 = jnp.zeros((T_hash,), jnp.float32).at[sel].add(gv1, mode="drop")
        return jnp.stack([grad0, grad1]), None, None, None
    if k >= 8:
        idx = _hash_level_indices(spec, hashed, x, y, z).reshape(-1)  # [Lh*8*N]
        w = _corner_weights(hashed, x, y, z, clamp=False)  # [Lh*8, N]
        # g: [2, Lh, N] -> per-corner update = g_level * w_corner
        g0 = (jnp.repeat(g[0], 8, axis=0) * w).reshape(-1)
        g1 = (jnp.repeat(g[1], 8, axis=0) * w).reshape(-1)
        grad0 = jnp.zeros((T_hash,), jnp.float32).at[idx].add(
            g0, mode="drop", indices_are_sorted=False, unique_indices=False
        )
        grad1 = jnp.zeros((T_hash,), jnp.float32).at[idx].add(g1, mode="drop")
        # positions get no gradient (matches tcnn: no dL/dx through the grid)
        return jnp.stack([grad0, grad1]), None, None, None

    # Stochastic corner gradient (grad_corners = k < 8): scatter coef_j * g
    # to the k planned corners (_stochastic_corner_plan: k=1 iid draw,
    # k>=2 leader+residual). UNBIASED for the dense update g * w_c — the
    # inverse-probability factor cancels (k=1), resp. the leader term is
    # exact and the residual draws cancel over wr (k>=2). The scatter
    # volume, 68% of the v5e train step at k=8 (docs/PERF.md), shrinks by
    # 8/k. Randomness derives from the position bits: sample positions are
    # re-jittered every training step, so draws decorrelate across steps
    # without threading an explicit key through the VJP.
    # TRAIN-ONLY assumption: with a deterministic (un-jittered) sampler, or
    # duplicate positions within a batch, the same corners are drawn every
    # time and the estimator noise correlates across steps — use
    # grad_corners=8 (exact) outside jittered training. In practice only
    # train.build_fields sets k<8 (from cfg hash_grad_corners); every other
    # constructor defaults to exact, and eval/render paths never call the
    # VJP at all.
    idx = _hash_level_indices(spec, hashed, x, y, z).reshape(Lh, 8, N)
    sel, coef = _stochastic_corner_plan(hashed, x, y, z, idx, k)
    gl = int(getattr(spec, "grad_levels", 0))
    if 0 < gl < Lh:
        sel, gv0, gv1 = _level_subsample(sel, coef, g, x, y, z, Lh, gl)
    else:
        sel = sel.reshape(-1)  # [k*Lh*N]
        gv0 = (g[0][None] * coef).reshape(-1)
        gv1 = (g[1][None] * coef).reshape(-1)
    grad0 = jnp.zeros((T_hash,), jnp.float32).at[sel].add(gv0, mode="drop")
    grad1 = jnp.zeros((T_hash,), jnp.float32).at[sel].add(gv1, mode="drop")
    return jnp.stack([grad0, grad1]), None, None, None


_hash_levels_encode.defvjp(_hash_levels_fwd, _hash_levels_bwd)


# ---------------------------------------------------------------------------
# Dense levels: cell-row tables + width-16 gathers
# ---------------------------------------------------------------------------


def _dense_cell_rows(lp: dict, plane_slice: jnp.ndarray, dtype) -> jnp.ndarray:
    """[ (r-1)^3, 16 ] cell-row table for one dense level.

    Slot layout: s = corner*2 + plane with corner order _CORNERS.
    Built by 8 shifted slices of the [2, r, r, r] level grid — streaming, no
    random access; autodiff of this assembly is streaming adds (no scatter).
    """
    r = lp["res"]
    # linear index x + y*r + z*r^2 means reshape(r,r,r) axes are (z, y, x)
    g = plane_slice[:, : r * r * r].reshape(2, r, r, r).astype(dtype)
    slots = []
    for dx, dy, dz in _CORNERS:
        block = g[:, dz : dz + r - 1, dy : dy + r - 1, dx : dx + r - 1]
        slots.append(block[0])
        slots.append(block[1])
    rows = jnp.stack(slots, axis=-1)  # [r-1, r-1, r-1, 16]
    return rows.reshape((r - 1) ** 3, 16)


def _pack_rows16(rows16: jnp.ndarray) -> jnp.ndarray:
    """[C, 16] (bf16 values) -> [C, 8] f32 words: slot pair (2s, 2s+1) packed
    as (odd_bf16 << 16) | even_bf16 in each word."""
    u = jax.lax.bitcast_convert_type(
        rows16.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        u[:, 0::2] | (u[:, 1::2] << 16), jnp.float32
    )


def _unpack_rows8(words: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] f32 words -> [N, 16] f32 (bf16 values widened), slot order
    restored (even, odd, even, odd, ...)."""
    u = jax.lax.bitcast_convert_type(words, jnp.uint32)
    even = jax.lax.bitcast_convert_type((u << 16).astype(jnp.uint32), jnp.float32)
    odd = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32)
    return jnp.stack([even, odd], axis=-1).reshape(words.shape[0], 16)


@jax.custom_vjp
def _packed_row_gather(rows16: jnp.ndarray, row_idx: jnp.ndarray) -> jnp.ndarray:
    """Width-8 packed twin of `jnp.take(rows16, row_idx, axis=0)`.

    Measured on v5e (docs/PERF.md round-4 dense arms): gathering [N, 8] f32
    words instead of [N, 16] bf16 lanes saves ~7 ns/row in-step (the gather
    emitter pays per ELEMENT, not per byte) — 16.7 ms at the tuned op
    point's 2.36M dense rows. Values are identical to the bf16 row gather
    (the pack/unpack round-trip is exact on bf16 inputs); the VJP is exactly
    `take`'s transpose (row scatter-add), so gradients match the unpacked
    path bit-for-bit at equal dtype.
    """
    return _unpack_rows8(jnp.take(_pack_rows16(rows16), row_idx, axis=0))


def _packed_row_gather_fwd(rows16, row_idx):
    # zeros-template residual (broadcast(0): free) carries shape+dtype into
    # the bwd without saving rows16 itself
    zeros = jnp.zeros_like(rows16)
    return _packed_row_gather(rows16, row_idx), (row_idx, zeros)


def _packed_row_gather_bwd(res, g):
    row_idx, zeros = res
    grad = zeros.at[row_idx].add(g.astype(zeros.dtype), mode="drop")
    return grad, None


_packed_row_gather.defvjp(_packed_row_gather_fwd, _packed_row_gather_bwd)


def _dense_levels_encode(
    spec: HashGridSpec,
    dense: list[dict],
    planes: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    z: jnp.ndarray,
    dtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Encode dense levels -> ([Ld, N] plane0, [Ld, N] plane1)."""
    e0_rows, e1_rows = [], []
    for lp in dense:
        r = lp["res"]
        rows = _dense_cell_rows(lp, planes[:, lp["offset"] : lp["offset"] + lp["size"]], dtype)
        # NOTE index math mirrors the reference clamp semantics: base cell
        # clipped to [0, r-2], frac clipped to [0,1] so boundary points
        # reproduce corner-clamping exactly.
        px, py, pz = x * lp["scale"] + 0.5, y * lp["scale"] + 0.5, z * lp["scale"] + 0.5
        bx = jnp.clip(jnp.floor(px), 0, r - 2).astype(jnp.int32)
        by = jnp.clip(jnp.floor(py), 0, r - 2).astype(jnp.int32)
        bz = jnp.clip(jnp.floor(pz), 0, r - 2).astype(jnp.int32)
        row_idx = bx + by * (r - 1) + bz * (r - 1) * (r - 1)  # [N]
        if dtype == jnp.bfloat16:
            # pair-packed width-8 row gather (v5e: ~7 ns/row cheaper; values
            # identical — rows are already bf16 at this dtype)
            G = _packed_row_gather(rows, row_idx).astype(dtype)  # [N, 16]
        else:
            G = jnp.take(rows, row_idx, axis=0)  # [N, 16] one width-16 gather

        tx = jnp.clip(px - bx, 0.0, 1.0).astype(dtype)
        ty = jnp.clip(py - by, 0.0, 1.0).astype(dtype)
        tz = jnp.clip(pz - bz, 0.0, 1.0).astype(dtype)
        e0 = jnp.zeros_like(tx)
        e1 = jnp.zeros_like(tx)
        for c, (dx, dy, dz) in enumerate(_CORNERS):
            wx = tx if dx else (1.0 - tx)
            wy = ty if dy else (1.0 - ty)
            wz = tz if dz else (1.0 - tz)
            w = wx * wy * wz
            e0 = e0 + G[:, c * 2] * w
            e1 = e1 + G[:, c * 2 + 1] * w
        e0_rows.append(e0)
        e1_rows.append(e1)
    return jnp.stack(e0_rows, axis=0), jnp.stack(e1_rows, axis=0)


# ---------------------------------------------------------------------------
# Dense levels, level-subset backward (train-only): exact forward, gd-level
# stochastic scatter
# ---------------------------------------------------------------------------

# salt for the dense LEVEL-subset draws: decorrelates from both the hash
# level-subset draws (_LEVEL_SALT) and the dense corner draws (_DENSE_SALT)
_DENSE_GL_SALT = 0x27D4EB2F


def _dense_rows_weights_selected(dense: list[dict], ids, x, y, z):
    """Row indices + trilinear weights for the DRAWN level of each point.

    ids: [gd, N] drawn dense-level ids. Returns (rows [gd, N] int32 into
    the CONCATENATED cell-row table, w [gd, 8, N] trilinear weights). Row
    index for level l: bx + by*(r-1) + bz*(r-1)^2 + sum_{m<l}(r_m-1)^3,
    with the base cell clamped to [0, r-2] — the same clamp semantics as
    _dense_levels_encode, so these rows address exactly the rows its
    forward gathered. Everything is computed AFTER the level selection
    ([gd, N]-shaped), never materialized for all Ld levels — the
    all-levels one-hot variant measured SLOWER than the exact backward
    it replaces (docs/PERF.md round 5e)."""
    counts = [(lp["res"] - 1) ** 3 for lp in dense]
    scales_v = jnp.asarray([lp["scale"] for lp in dense], jnp.float32)
    rs_v = jnp.asarray([lp["res"] for lp in dense], jnp.float32)
    coffs_v = jnp.asarray(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), jnp.int32
    )

    scale = jnp.take(scales_v, ids)  # [gd, N]
    r_sel = jnp.take(rs_v, ids)
    coff = jnp.take(coffs_v, ids)

    px = x[None, :] * scale + 0.5  # [gd, N]
    py = y[None, :] * scale + 0.5
    pz = z[None, :] * scale + 0.5
    rmax = r_sel - 2.0
    bx = jnp.clip(jnp.floor(px), 0.0, rmax)
    by = jnp.clip(jnp.floor(py), 0.0, rmax)
    bz = jnp.clip(jnp.floor(pz), 0.0, rmax)
    tx = jnp.clip(px - bx, 0.0, 1.0)
    ty = jnp.clip(py - by, 0.0, 1.0)
    tz = jnp.clip(pz - bz, 0.0, 1.0)

    rm1 = (r_sel - 1.0).astype(jnp.int32)
    rows = (
        bx.astype(jnp.int32)
        + by.astype(jnp.int32) * rm1
        + bz.astype(jnp.int32) * rm1 * rm1
        + coff
    )  # [gd, N]

    w = []
    for dx, dy, dz in _CORNERS:
        wx = tx if dx else (1.0 - tx)
        wy = ty if dy else (1.0 - ty)
        wz = tz if dz else (1.0 - tz)
        w.append(wx * wy * wz)
    return rows, jnp.stack(w, axis=1), counts  # rows, [gd, 8, N], counts


@partial(jax.custom_vjp, nondiff_argnums=(0, 5))
def _dense_levels_encode_glv(spec: HashGridSpec, dense_planes, x, y, z, dtype):
    """Dense encode with a level-subset BACKWARD: -> [2, Ld, N].

    Forward: bit-identical to the exact path (_dense_levels_encode) — no
    estimator noise on activations. Backward: each point scatters the row
    gradients of only gd = spec.dense_grad_levels iid uniformly drawn dense
    levels, scaled Ld/gd (UNBIASED for the exact dense-table gradient; the
    trilinear weights inside a drawn level stay exact). The dense-row
    scatter is 11.6 ms of the tuned 62 ms v5e step at Ld*N = 983k rows
    (docs/PERF.md round-5c attribution) and prices per INDEX, so the
    backward cost shrinks by ~Ld/gd. TRAIN-ONLY (position-bit draws need
    per-step sample jitter); only train.build_fields sets
    dense_grad_levels > 0, and it rejects combining with dense_corners < 8
    (the stochastic dense path has its own backward).

    dense_planes: [2, T_dense] f32 prefix of the plane table covering the
    dense levels (dense levels are a prefix: _split_levels asserts it).
    """
    out, _ = _dense_glv_fwd(spec, dense_planes, x, y, z, dtype)
    return out


def _dense_glv_fwd(spec, dense_planes, x, y, z, dtype):
    dense, _ = _split_levels(spec)
    e0, e1 = _dense_levels_encode(spec, dense, dense_planes, x, y, z, dtype)
    return jnp.stack([e0, e1]), (x, y, z)


def _dense_glv_bwd(spec, dtype, res, g):
    x, y, z = res
    dense, _ = _split_levels(spec)
    Ld = len(dense)
    gd = int(getattr(spec, "dense_grad_levels", 0))

    ids = _draw_levels(x, y, z, Ld, gd, _DENSE_GL_SALT)  # [gd, N]
    sel, wsel, counts = _dense_rows_weights_selected(dense, ids, x, y, z)
    g32 = g.astype(jnp.float32)  # [2, Ld, N]
    # cotangent of the drawn level only: [gd, N] take along the Ld axis
    g0 = jnp.take_along_axis(g32[0], ids, axis=0)
    g1 = jnp.take_along_axis(g32[1], ids, axis=0)
    scale = np.float32(Ld / gd)

    # row gradient, slot layout s = corner*2 + plane (as _dense_cell_rows)
    parts = []
    for c in range(8):
        parts.append(wsel[:, c, :] * g0 * scale)
        parts.append(wsel[:, c, :] * g1 * scale)
    grow = jnp.stack(parts, axis=-1)  # [gd, N, 16]

    C_total = sum(counts)
    tbl = jnp.zeros((C_total, 16), jnp.float32).at[sel.reshape(-1)].add(
        grow.reshape(-1, 16), mode="drop"
    )

    # adjoint of _dense_cell_rows per level: 8 shifted-slice adds back into
    # the [2, r, r, r] grid — pure streaming, no scatter
    grads = []
    coff = 0
    for lp, C in zip(dense, counts):
        r = lp["res"]
        rows_l = tbl[coff : coff + C].reshape(r - 1, r - 1, r - 1, 16)
        coff += C
        grid = jnp.zeros((2, r, r, r), jnp.float32)
        for c, (dx, dy, dz) in enumerate(_CORNERS):
            grid = grid.at[0, dz : dz + r - 1, dy : dy + r - 1, dx : dx + r - 1].add(
                rows_l[..., 2 * c]
            )
            grid = grid.at[1, dz : dz + r - 1, dy : dy + r - 1, dx : dx + r - 1].add(
                rows_l[..., 2 * c + 1]
            )
        pl = grid.reshape(2, r * r * r)
        if lp["size"] != r * r * r:  # tcnn 8-entry alignment padding
            pl = jnp.pad(pl, ((0, 0), (0, lp["size"] - r * r * r)))
        grads.append(pl)
    return (jnp.concatenate(grads, axis=1), None, None, None)


_dense_levels_encode_glv.defvjp(_dense_glv_fwd, _dense_glv_bwd)


# ---------------------------------------------------------------------------
# Dense levels, stochastic (train-only): 1-corner dithered trilinear
# ---------------------------------------------------------------------------

# salt for the dense-level draw family: decorrelates dense draws from the
# hash-level draws at the same (level index, position)
_DENSE_SALT = 0x5BD1E995


def _dense_level_indices(
    spec: HashGridSpec, dense: list[dict], x, y, z
) -> jnp.ndarray:
    """[Ld, 8, N] int32 per-corner indices into the dense plane prefix.

    Dense levels are collision-free: idx = (bx+dx) + (by+dy)*r + (bz+dz)*r^2
    + level offset, with the base cell clamped to [0, r-2] (the same clamp
    semantics as _dense_levels_encode / _corner_weights(clamp=True))."""
    scales = jnp.asarray([lp["scale"] for lp in dense], jnp.float32)[:, None]
    rs = jnp.asarray([lp["res"] for lp in dense], jnp.int32)[:, None]
    offs = jnp.asarray([lp["offset"] for lp in dense], jnp.int32)[:, None]

    px = x[None, :] * scales + 0.5  # [Ld, N]
    py = y[None, :] * scales + 0.5
    pz = z[None, :] * scales + 0.5
    rmax = (rs - 2).astype(jnp.float32)
    bx = jnp.clip(jnp.floor(px), 0, rmax).astype(jnp.int32)
    by = jnp.clip(jnp.floor(py), 0, rmax).astype(jnp.int32)
    bz = jnp.clip(jnp.floor(pz), 0, rmax).astype(jnp.int32)

    corners = []
    for dx, dy, dz in _CORNERS:
        corners.append((bx + dx) + (by + dy) * rs + (bz + dz) * rs * rs + offs)
    return jnp.stack(corners, axis=1)  # [Ld, 8, N]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dense_levels_encode_stoch(spec: HashGridSpec, dense_planes, x, y, z):
    """Stochastic dense-level encode: -> [2, Ld, N].

    dense_planes: [2, T_dense] f32 prefix of the full plane table covering
    the dense levels. Same dithered-trilinear estimator as the hash levels
    (_stochastic_corner_plan), fetching pair-packed words by per-corner
    index instead of the width-16 cell-row gather — under fwd_corners=1 a
    point-level costs ONE ~7 ns pair gather vs one ~21.5 ns row gather
    (docs/PERF.md round-4 attribution), trading the scatter-free row
    backward for a k-corner scatter. TRAIN-ONLY (position-bit draws);
    gated by spec.dense_corners < 8, which only train.build_fields sets.
    """
    out, _ = _dense_stoch_fwd(spec, dense_planes, x, y, z)
    return out


def _dense_stoch_fwd(spec, dense_planes, x, y, z):
    dense, _ = _split_levels(spec)
    Ld = len(dense)
    N = x.shape[0]
    k = int(getattr(spec, "dense_corners", 8))
    idx3 = _dense_level_indices(spec, dense, x, y, z)  # [Ld, 8, N]
    packed = _pack_pairs_bf16(dense_planes)  # [T_dense]
    sel, coef = _stochastic_corner_plan(
        dense, x, y, z, idx3, k, clamp=True, salt=_DENSE_SALT
    )
    words = jnp.take(packed, sel.reshape(-1), axis=0).reshape(k, Ld, N)
    f0, f1 = _unpack_pairs(words)
    e0 = jnp.sum(f0 * coef, axis=0)  # [Ld, N]
    e1 = jnp.sum(f1 * coef, axis=0)
    return jnp.stack([e0, e1]), (x, y, z)


def _dense_stoch_bwd(spec, res, g):
    x, y, z = res
    dense, _ = _split_levels(spec)
    Ld = len(dense)
    N = x.shape[0]
    T_dense = sum(lp["size"] for lp in dense)
    k = int(getattr(spec, "dense_corners", 8))
    b = min(int(getattr(spec, "grad_corners", 8)), k)
    # replay the forward's deterministic plan (b == k) or an equally
    # unbiased b-draw re-plan (b < k) — same scheme as _hash_levels_bwd
    idx3 = _dense_level_indices(spec, dense, x, y, z)
    sel, coef = _stochastic_corner_plan(
        dense, x, y, z, idx3, b, clamp=True, salt=_DENSE_SALT
    )
    sel = sel.reshape(-1)
    gv0 = (g[0][None] * coef).reshape(-1)
    gv1 = (g[1][None] * coef).reshape(-1)
    grad0 = jnp.zeros((T_dense,), jnp.float32).at[sel].add(gv0, mode="drop")
    grad1 = jnp.zeros((T_dense,), jnp.float32).at[sel].add(gv1, mode="drop")
    return jnp.stack([grad0, grad1]), None, None, None


_dense_levels_encode_stoch.defvjp(_dense_stoch_fwd, _dense_stoch_bwd)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------


def hash_encode_planar(
    spec: HashGridSpec,
    planes: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    z: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Feature-major hash-grid encoding.

    Args:
      planes: [2, total] canonical fp32 parameter table.
      x, y, z: [N] position components in [0, 1].
    Returns:
      enc [L*F, N] in plane-major layout: rows 0..L-1 are plane 0 across
      levels (dense then hash), rows L..2L-1 are plane 1 — the transposed
      twin of fields.ngp.hashgrid_encode's [N, L*F] output.
    """
    dense, hashed = _split_levels(spec)
    dgl = int(getattr(spec, "dense_grad_levels", 0))
    if int(getattr(spec, "dense_corners", 8)) < 8 and dense:
        T_dense = sum(lp["size"] for lp in dense)
        ed = _dense_levels_encode_stoch(spec, planes[:, :T_dense], x, y, z)
        e0d, e1d = ed[0], ed[1]
    elif 0 < dgl < len(dense):
        # exact forward, gd-level subsampled backward (train-only)
        T_dense = sum(lp["size"] for lp in dense)
        ed = _dense_levels_encode_glv(spec, planes[:, :T_dense], x, y, z, dtype)
        e0d, e1d = ed[0], ed[1]
    else:
        e0d, e1d = _dense_levels_encode(spec, dense, planes, x, y, z, dtype)

    hash_base = hashed[0]["offset"]
    hp = planes[:, hash_base:]
    eh = _hash_levels_encode(spec, hp, x, y, z)  # [2, Lh, N]

    enc = jnp.concatenate(
        [e0d.astype(dtype), eh[0].astype(dtype), e1d.astype(dtype), eh[1].astype(dtype)],
        axis=0,
    )
    return enc
