"""Instant-NGP field: multiresolution hash-grid encoding + small MLPs.

Native TPU replacement for the reference's tiny-cuda-nn stack
(reference: scripts/instantngp.py:7-104): HashGrid(16 levels x 2 features,
base_res 16, per_level_scale 1.5, log2_hashmap_size 15/17/19) + SH degree-4
direction encoding + bias-free density MLP (32->64->16, ReLU out) + bias-free
color MLP (32->64->64->3, sigmoid out).

Hash-grid semantics follow tiny-cuda-nn / the Instant-NGP paper:
  * level scale  s_l = base_res * per_level_scale^l - 1
  * level res    r_l = ceil(s_l) + 1
  * dense (linear) indexing when r_l^3 fits in the table, spatial hash
    ``x ⊕ y*2654435761 ⊕ z*805459861 (mod T)`` otherwise.
All 16 levels live in ONE flat [total, 2] parameter array with static
per-level offsets, so the whole encode is a single XLA gather — TPU-friendly
(one big take; its transpose is one scatter-add for the backward pass).
A fused Pallas kernel backs the hot path where beneficial (nerfjax.ops).

Domain note (conscious fix, see SURVEY.md §7): the reference feeds [-1,1]
positions into tcnn which assumes [0,1]; here positions in [-1,1] are mapped
to [0,1] before encoding.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.fields.encodings import sh4_encode

Params = dict[str, Any]

_HASH_PRIMES = (np.uint32(1), np.uint32(2654435761), np.uint32(805459861))

NERF_TYPE_LOG2 = {"small": 15, "medium": 17, "large": 19}


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.5
    # Hash-level backward: 8 = exact trilinear gradient; 1..7 = UNBIASED
    # stochastic estimate scattering only k corners per (level, point),
    # sampled proportional to their trilinear weight. The table scatter-add
    # is 68% of the v5e train step (docs/PERF.md), so k=1 cuts the dominant
    # cost ~8x at the price of per-step gradient noise. Forward is always
    # exact.
    grad_corners: int = 8
    # Hash-level FORWARD: 8 = exact trilinear interpolation; 1..7 = UNBIASED
    # stochastic estimate (dithered trilinear): draw k corners per (level,
    # point) with probability = trilinear weight and average their raw
    # values — E[mean f_c] equals the exact interpolation because the
    # importance factor w/p cancels. Cuts the hashed forward gather volume
    # (45% of the tuned v5e step, docs/PERF.md) by 8/k at the price of
    # per-step encode noise. TRAIN-ONLY: relies on per-step sample jitter
    # to decorrelate draws; only nerfjax.train.build_fields(train=True)
    # ever sets it (< 8); eval/extract/render construct exact specs.
    fwd_corners: int = 8
    # DENSE-level forward/backward: 8 = exact width-16 cell-row gather with
    # scatter-free backward (nerfjax.ops.hash_encode cell rows); 1..7 =
    # the same stochastic dithered-trilinear estimator as fwd_corners,
    # fetching k pair-packed corners per (level, point) by direct index —
    # under k=1 a point-level costs one ~7 ns gather vs one ~21.5 ns row
    # gather, at the price of a k-corner scatter backward and per-step
    # encode noise. TRAIN-ONLY like fwd_corners (position-bit draws).
    dense_corners: int = 8
    # Hash-level backward LEVEL subsampling: 0 = scatter every hashed
    # level's gradient (default); 1..Lh-1 = scatter only that many iid
    # uniformly drawn levels per point, scaled Lh/gl (UNBIASED; position-
    # bit draws, independently salted from the corner draws). Composes
    # with grad_corners/fwd_corners: backward scatter volume shrinks by a
    # further Lh/gl on top of the 8/k corner cut — the k=1 scatter is 31%
    # of the tuned v5e step (docs/PERF.md round-5c attribution). Only the
    # STOCHASTIC backward paths honor it (grad_corners < 8 or
    # fwd_corners < 8); train.build_fields rejects it with the exact
    # backward. TRAIN-ONLY like the other estimators (per-step jitter).
    grad_levels: int = 0
    # Dense-level backward LEVEL subsampling: 0 = scatter every dense
    # level's row gradient (default); 1..Ld-1 = scatter only that many iid
    # uniformly drawn dense levels per point, scaled Ld/gd (UNBIASED; the
    # forward stays the EXACT cell-row encode — no activation noise; the
    # trilinear weights inside a drawn level stay exact). The dense-row
    # scatter is 19% of the tuned v5e step (docs/PERF.md round-5c
    # attribution) and prices per index, so the dense backward shrinks by
    # ~Ld/gd. Independent of the hash-level estimators; incompatible with
    # dense_corners < 8 (that path owns its backward — train.build_fields
    # rejects the combination). TRAIN-ONLY (position-bit draws).
    dense_grad_levels: int = 0
    # Promote the first E would-be-hashed levels to DENSE storage (their
    # full res^3 table instead of 2^log2 hashed slots). Model change
    # (opt-in, grows the table): the promoted level loses hash collisions
    # AND moves from 8 width-1 gathers/point to 1 width-16 cell-row gather
    # with a scatter-free backward (nerfjax.ops.hash_encode) — a v5e
    # throughput lever, since gather/scatter issue rate bounds the step.
    extra_dense_levels: int = 0

    @property
    def hashmap_size(self) -> int:
        return 1 << self.log2_hashmap_size

    def level_params(self) -> list[dict]:
        """Static per-level metadata: scale, resolution, table size, offset."""
        out = []
        offset = 0
        promoted = 0
        for l in range(self.n_levels):
            scale = self.base_resolution * (self.per_level_scale**l) - 1.0
            res = int(np.ceil(scale)) + 1
            dense_size = res**3
            # tcnn aligns per-level tables to a multiple of 8 entries.
            dense_size = -(-dense_size // 8) * 8
            use_hash = dense_size > self.hashmap_size
            if use_hash and promoted < self.extra_dense_levels:
                use_hash = False  # promoted to dense (see extra_dense_levels)
                promoted += 1
            size = self.hashmap_size if use_hash else dense_size
            out.append(
                {
                    "scale": float(scale),
                    "res": res,
                    "use_hash": use_hash,
                    "size": size,
                    "offset": offset,
                }
            )
            offset += size
        return out

    @property
    def total_table_size(self) -> int:
        levels = self.level_params()
        return levels[-1]["offset"] + levels[-1]["size"]

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features


_CORNERS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


def hashgrid_indices_and_weights(
    spec: HashGridSpec, x01: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute gather indices and trilinear weights for all levels.

    TPU layout note: columns are packed as [N, L*8] — for the canonical 16
    levels that is exactly one 128-lane tile, so the materialized gather
    index/weight/feature buffers are padding-free. (A naive [N, L, 8] layout
    pads both minor dims and blows HBM by 16x — measured on v5e.)
    Column order is level-major: col = level*8 + corner.

    Args:
      x01: [N, 3] positions in [0, 1].
    Returns:
      idx: [N, L*8] int32 indices into the flat table.
      w:   [N, L*8] float32 trilinear interpolation weights.
    """
    x = x01[:, 0]
    y = x01[:, 1]
    z = x01[:, 2]

    idx_cols: list[jnp.ndarray] = []
    w_cols: list[jnp.ndarray] = []
    for lp in spec.level_params():
        px, py, pz = x * lp["scale"] + 0.5, y * lp["scale"] + 0.5, z * lp["scale"] + 0.5
        fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
        tx, ty, tz = px - fx, py - fy, pz - fz  # fractional part
        ix, iy, iz = fx.astype(jnp.int32), fy.astype(jnp.int32), fz.astype(jnp.int32)

        for dx, dy, dz in _CORNERS:
            cx, cy, cz = ix + dx, iy + dy, iz + dz
            if lp["use_hash"]:
                h = (
                    cx.astype(jnp.uint32) * _HASH_PRIMES[0]
                    ^ cy.astype(jnp.uint32) * _HASH_PRIMES[1]
                    ^ cz.astype(jnp.uint32) * _HASH_PRIMES[2]
                )
                col = (h & np.uint32(spec.hashmap_size - 1)).astype(jnp.int32)
            else:
                r = lp["res"]
                col = (
                    jnp.clip(cx, 0, r - 1)
                    + jnp.clip(cy, 0, r - 1) * r
                    + jnp.clip(cz, 0, r - 1) * (r * r)
                )
            idx_cols.append(col + lp["offset"])
            wx = tx if dx else (1.0 - tx)
            wy = ty if dy else (1.0 - ty)
            wz = tz if dz else (1.0 - tz)
            w_cols.append(wx * wy * wz)

    return jnp.stack(idx_cols, axis=-1), jnp.stack(w_cols, axis=-1)


def _level_selector(spec: HashGridSpec) -> np.ndarray:
    """Static [L*8, L] 0/1 matrix summing the 8 corner columns of each level —
    the trilinear reduce becomes one MXU matmul instead of a padded reshape."""
    sel = np.zeros((spec.n_levels * 8, spec.n_levels), np.float32)
    for l in range(spec.n_levels):
        sel[l * 8 : (l + 1) * 8, l] = 1.0
    return sel


def hashgrid_encode(
    spec: HashGridSpec, table_planes: jnp.ndarray, x01: jnp.ndarray
) -> jnp.ndarray:
    """Multiresolution hash encoding: [N,3] in [0,1] -> [N, L*F].

    table_planes: [F, total] — feature-planes layout so each per-plane gather
    yields a dense lane-packed [N, L*8] buffer (a [total, F] table would
    gather into [N, L*8, F] and pad F=2 up to 128 lanes).

    Output feature layout is PLANE-MAJOR: [plane0 levels 0..L-1, plane1
    levels 0..L-1] — a fixed permutation of tcnn's level-major interleave
    (equivalent model up to a permutation of the first MLP layer's rows;
    documented for checkpoint interop in nerfjax.checkpoint).

    Backward pass is the gather transpose (scatter-add into the planes).
    """
    idx, w = hashgrid_indices_and_weights(spec, x01)  # [N, L*8] each
    sel = jnp.asarray(_level_selector(spec), table_planes.dtype)
    w = w.astype(table_planes.dtype)
    outs = []
    for f in range(spec.n_features):
        g = jnp.take(table_planes[f], idx, axis=0)  # [N, L*8]
        outs.append(
            jnp.dot(g * w, sel, preferred_element_type=table_planes.dtype)
        )  # [N, L]
    return jnp.concatenate(outs, axis=-1)  # [N, L*F]


def _mlp_init(key: jax.Array, dims: list[int], dtype=jnp.float32) -> list[Params]:
    """Bias-free MLP weights (tcnn Networks have no biases), He-uniform init
    matching tcnn's default for FullyFusedMLP."""
    layers = []
    keys = jax.random.split(key, len(dims) - 1)
    for k, fan_in, fan_out in zip(keys, dims[:-1], dims[1:]):
        bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
        layers.append({"w": jax.random.uniform(k, (fan_in, fan_out), dtype, -bound, bound)})
    return layers


def _mlp_apply(layers: list[Params], x: jnp.ndarray, out_act) -> jnp.ndarray:
    for p in layers[:-1]:
        x = jax.nn.relu(x @ p["w"])
    x = x @ layers[-1]["w"]
    return out_act(x)


@dataclasses.dataclass(frozen=True)
class InstantNGP:
    """NGP field. ``nerf_type`` in {small, medium, large} selects 2^{15,17,19}
    hash entries (reference: scripts/instantngp.py:14-21)."""

    nerf_type: str = "small"
    n_levels: int = 16
    n_features: int = 2
    base_resolution: int = 16
    per_level_scale: float = 1.5
    hidden: int = 64
    geo_feat_dim: int = 16
    grad_corners: int = 8  # see HashGridSpec.grad_corners
    fwd_corners: int = 8  # see HashGridSpec.fwd_corners (train-only)
    dense_corners: int = 8  # see HashGridSpec.dense_corners (train-only)
    grad_levels: int = 0  # see HashGridSpec.grad_levels (train-only)
    dense_grad_levels: int = 0  # see HashGridSpec.dense_grad_levels (train-only)
    extra_dense_levels: int = 0  # see HashGridSpec.extra_dense_levels

    def __post_init__(self):
        # fail at construction, not at first .spec access (a bad cfg
        # nerf_type should error before a training run starts)
        if self.nerf_type not in NERF_TYPE_LOG2:
            raise ValueError(
                f"Unknown nerf_type={self.nerf_type!r}; "
                f"expected one of {sorted(NERF_TYPE_LOG2)}"
            )

    @property
    def spec(self) -> HashGridSpec:
        return HashGridSpec(
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_hashmap_size=NERF_TYPE_LOG2[self.nerf_type],
            base_resolution=self.base_resolution,
            per_level_scale=self.per_level_scale,
            grad_corners=self.grad_corners,
            fwd_corners=self.fwd_corners,
            dense_corners=self.dense_corners,
            grad_levels=self.grad_levels,
            dense_grad_levels=self.dense_grad_levels,
            extra_dense_levels=self.extra_dense_levels,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        kt, kd, kc = jax.random.split(key, 3)
        spec = self.spec
        # tcnn initializes hash tables uniform in [-1e-4, 1e-4].
        # [F, total] feature-planes layout (see hashgrid_encode).
        table = jax.random.uniform(
            kt, (spec.n_features, spec.total_table_size), dtype, -1e-4, 1e-4
        )
        enc_dim = spec.output_dim  # 32
        return {
            "table": table,
            "dmlp": _mlp_init(kd, [enc_dim, self.hidden, self.geo_feat_dim], dtype),
            "cmlp": _mlp_init(
                kc, [self.geo_feat_dim + 16, self.hidden, self.hidden, 3], dtype
            ),
        }

    @staticmethod
    def _to01(pos: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip((pos + 1.0) * 0.5, 0.0, 1.0)

    def query_density(
        self, params: Params, pos: jnp.ndarray, **_: Any
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """[N,3] in [-1,1] -> (sigma [N,1], features [N,16]).

        sigma is the first channel of the (ReLU'd) density-MLP output
        (reference: scripts/instantngp.py:66-80).
        """
        enc = hashgrid_encode(self.spec, params["table"], self._to01(pos))
        features = _mlp_apply(params["dmlp"], enc, jax.nn.relu)
        sigma = features[:, :1]
        return sigma, features

    def apply(
        self,
        params: Params,
        pos: jnp.ndarray,
        view: jnp.ndarray,
        **_: Any,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """[N,3],[N,3] -> (rgb [N,3], sigma [N,1])."""
        sigma, features = self.query_density(params, pos)
        dir_enc = sh4_encode(view).astype(features.dtype)
        x = jnp.concatenate([features, dir_enc], axis=-1)
        rgb = _mlp_apply(params["cmlp"], x, jax.nn.sigmoid)
        return rgb, sigma

    # -- feature-major hot path ---------------------------------------------
    # Positions/directions as three [N] component vectors, activations as
    # [C, N]: no lane padding anywhere (see nerfjax.ops.hash_encode).

    def query_density_planar(
        self, params: Params, pos3, *, dtype=jnp.bfloat16, **_: Any
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(px,py,pz) [N] in [-1,1] -> (sigma [N], features [16, N])."""
        from nerfjax.ops.hash_encode import hash_encode_planar

        x = jnp.clip((pos3[0] + 1.0) * 0.5, 0.0, 1.0)
        y = jnp.clip((pos3[1] + 1.0) * 0.5, 0.0, 1.0)
        z = jnp.clip((pos3[2] + 1.0) * 0.5, 0.0, 1.0)
        enc = hash_encode_planar(self.spec, params["table"], x, y, z, dtype=dtype)
        # Under remat, save the gathered encoding ([2L, N] bf16 is small) so
        # the backward pass does not re-run the 100M+ random gathers; only
        # the cheap MLPs are recomputed (policy set in render_rays_planar).
        from jax.ad_checkpoint import checkpoint_name

        enc = checkpoint_name(enc, "hash_enc")
        h = enc
        for p in params["dmlp"][:-1]:
            h = jax.nn.relu(
                jnp.dot(p["w"].T.astype(dtype), h, preferred_element_type=dtype)
            )
        feat = jax.nn.relu(
            jnp.dot(
                params["dmlp"][-1]["w"].T.astype(dtype), h, preferred_element_type=dtype
            )
        )
        return feat[0], feat

    def apply_planar_fused(
        self, params: Params, pos3, view3, *, dtype=jnp.bfloat16,
        interpret: bool = False, **_: Any
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Forward with the fused Pallas MLP head (inference path): the hash
        encode runs in XLA (gathers), both MLPs + SH concat run fused in one
        Pallas kernel with VMEM-resident weights/activations."""
        from nerfjax.fields.encodings import sh4_encode_planar
        from nerfjax.ops.hash_encode import hash_encode_planar
        from nerfjax.ops.pallas_mlp import fused_ngp_head

        x = jnp.clip((pos3[0] + 1.0) * 0.5, 0.0, 1.0)
        y = jnp.clip((pos3[1] + 1.0) * 0.5, 0.0, 1.0)
        z = jnp.clip((pos3[2] + 1.0) * 0.5, 0.0, 1.0)
        enc = hash_encode_planar(self.spec, params["table"], x, y, z, dtype=dtype)
        sh = sh4_encode_planar(view3[0], view3[1], view3[2]).astype(dtype)
        rgb, sigma = fused_ngp_head(params, enc, sh, interpret=interpret)
        return rgb, sigma

    def query_density_planar_fused(
        self, params: Params, pos3, *, dtype=jnp.bfloat16,
        interpret: bool = False, **_: Any
    ) -> jnp.ndarray:
        """sigma [N] via the density-only fused Pallas kernel — bit-identical
        sigma to apply_planar_fused (same two f32-accumulated dmlp matmuls),
        skipping the color MLP + SH. Used by the extraction coarse mark pass
        (nerfjax.extract), which never reads coarse RGB."""
        from nerfjax.ops.hash_encode import hash_encode_planar
        from nerfjax.ops.pallas_mlp import fused_ngp_density

        x = jnp.clip((pos3[0] + 1.0) * 0.5, 0.0, 1.0)
        y = jnp.clip((pos3[1] + 1.0) * 0.5, 0.0, 1.0)
        z = jnp.clip((pos3[2] + 1.0) * 0.5, 0.0, 1.0)
        enc = hash_encode_planar(self.spec, params["table"], x, y, z, dtype=dtype)
        return fused_ngp_density(params, enc, interpret=interpret)

    def apply_planar(
        self, params: Params, pos3, view3, *, dtype=jnp.bfloat16, **_: Any
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Feature-major forward: -> (rgb [3, N], sigma [N])."""
        from nerfjax.fields.encodings import sh4_encode_planar

        sigma, feat = self.query_density_planar(params, pos3, dtype=dtype)
        de = sh4_encode_planar(view3[0], view3[1], view3[2]).astype(dtype)
        h = jnp.concatenate([feat, de], axis=0)
        for p in params["cmlp"][:-1]:
            h = jax.nn.relu(
                jnp.dot(p["w"].T.astype(dtype), h, preferred_element_type=dtype)
            )
        rgb = jax.nn.sigmoid(
            jnp.dot(
                params["cmlp"][-1]["w"].T.astype(dtype), h, preferred_element_type=dtype
            )
        )
        return rgb, sigma

    def num_params(self, params: Params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
