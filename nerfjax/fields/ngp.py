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

    @property
    def hashmap_size(self) -> int:
        return 1 << self.log2_hashmap_size

    def level_params(self) -> list[dict]:
        """Static per-level metadata: scale, resolution, table size, offset."""
        out = []
        offset = 0
        for l in range(self.n_levels):
            scale = self.base_resolution * (self.per_level_scale**l) - 1.0
            res = int(np.ceil(scale)) + 1
            dense_size = res**3
            # tcnn aligns per-level tables to a multiple of 8 entries.
            dense_size = -(-dense_size // 8) * 8
            use_hash = dense_size > self.hashmap_size
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


def _corner_offsets() -> np.ndarray:
    """The 8 corners of a unit cell as a [8,3] {0,1} array."""
    return np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1).reshape(8, 3)


def hashgrid_indices_and_weights(
    spec: HashGridSpec, x01: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute gather indices and trilinear weights for all levels.

    Args:
      x01: [N, 3] positions in [0, 1].
    Returns:
      idx: [N, L, 8] int32 indices into the flat table.
      w:   [N, L, 8] trilinear interpolation weights.
    """
    corners = jnp.asarray(_corner_offsets(), jnp.int32)  # [8,3]
    levels = spec.level_params()

    idx_all, w_all = [], []
    for lp in levels:
        pos = x01 * lp["scale"] + 0.5
        p0 = jnp.floor(pos)
        frac = pos - p0
        p0 = p0.astype(jnp.int32)  # [N,3]

        cpos = p0[:, None, :] + corners[None, :, :]  # [N,8,3]
        if lp["use_hash"]:
            c = cpos.astype(jnp.uint32)
            h = (
                c[..., 0] * _HASH_PRIMES[0]
                ^ c[..., 1] * _HASH_PRIMES[1]
                ^ c[..., 2] * _HASH_PRIMES[2]
            )
            idx = (h & np.uint32(spec.hashmap_size - 1)).astype(jnp.int32)
        else:
            r = lp["res"]
            c = jnp.clip(cpos, 0, r - 1)
            idx = c[..., 0] + c[..., 1] * r + c[..., 2] * (r * r)

        # Trilinear weights: prod over dims of frac^bit * (1-frac)^(1-bit).
        fb = corners[None, :, :].astype(x01.dtype)  # [1,8,3]
        w = jnp.prod(frac[:, None, :] * fb + (1.0 - frac[:, None, :]) * (1.0 - fb), axis=-1)

        idx_all.append(idx + lp["offset"])
        w_all.append(w)

    return jnp.stack(idx_all, axis=1), jnp.stack(w_all, axis=1)


def hashgrid_encode(spec: HashGridSpec, table: jnp.ndarray, x01: jnp.ndarray) -> jnp.ndarray:
    """Multiresolution hash encoding: [N,3] in [0,1] -> [N, L*F].

    One flat gather over all levels + trilinear blend. Backward pass is the
    gather transpose (scatter-add into the table), handled by XLA.
    """
    idx, w = hashgrid_indices_and_weights(spec, x01)  # [N,L,8] each
    feats = jnp.take(table, idx.reshape(-1), axis=0)  # [N*L*8, F]
    feats = feats.reshape(*idx.shape, spec.n_features)  # [N,L,8,F]
    enc = jnp.sum(feats * w[..., None].astype(feats.dtype), axis=2)  # [N,L,F]
    return enc.reshape(x01.shape[0], spec.output_dim)


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

    @property
    def spec(self) -> HashGridSpec:
        if self.nerf_type not in NERF_TYPE_LOG2:
            raise ValueError(f"Unknown nerf_type={self.nerf_type!r}")
        return HashGridSpec(
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_hashmap_size=NERF_TYPE_LOG2[self.nerf_type],
            base_resolution=self.base_resolution,
            per_level_scale=self.per_level_scale,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        kt, kd, kc = jax.random.split(key, 3)
        spec = self.spec
        # tcnn initializes hash tables uniform in [-1e-4, 1e-4].
        table = jax.random.uniform(
            kt, (spec.total_table_size, spec.n_features), dtype, -1e-4, 1e-4
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

    def num_params(self, params: Params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
