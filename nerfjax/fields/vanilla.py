"""Vanilla NeRF MLP field.

Functional reimplementation of the reference's 8x256 skip-MLP
(reference: scripts/model.py:56-216, OptimizedVanillaNeRF):
  * 4 ReLU layers on encoded position, skip-concat of the encoding, 4 more,
  * density head (bias init 0.1, weight ~ N(0, 0.01)) with train-time Gaussian
    noise on sigma before ReLU,
  * feature layer -> color head [feat ⊕ dir_enc] -> 128 -> ReLU -> 3 -> sigmoid.

Params are plain pytrees (dicts of jnp arrays) so the whole field slots
directly into jit/grad/pjit; weights are stored [in, out] (x @ W + b).
Checkpoint name-mapping to the reference's torch state_dict lives in
nerfjax.checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from nerfjax.fields.encodings import fourier_encode, fourier_output_dim

Params = dict[str, Any]


def _torch_linear_init(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) ==
    U(-sqrt(1/fan_in), sqrt(1/fan_in)) for both weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


@dataclasses.dataclass(frozen=True)
class VanillaNeRF:
    pos_L: int = 10
    dir_L: int = 4
    hidden_dim: int = 256
    include_input_pos: bool = True
    include_input_dir: bool = True
    # Train-time Gaussian noise on sigma pre-ReLU (reference model.py:160-166).
    sigma_noise: bool = True

    @property
    def pos_dim(self) -> int:
        return fourier_output_dim(self.pos_L, self.include_input_pos)

    @property
    def dir_dim(self) -> int:
        return fourier_output_dim(self.dir_L, self.include_input_dir)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        h = self.hidden_dim
        keys = jax.random.split(key, 12)
        params: Params = {
            "pos_layers": [
                _torch_linear_init(keys[0], self.pos_dim, h, dtype),
                _torch_linear_init(keys[1], h, h, dtype),
                _torch_linear_init(keys[2], h, h, dtype),
                _torch_linear_init(keys[3], h, h, dtype),
            ],
            "skip_layers": [
                _torch_linear_init(keys[4], h + self.pos_dim, h, dtype),
                _torch_linear_init(keys[5], h, h, dtype),
                _torch_linear_init(keys[6], h, h, dtype),
                _torch_linear_init(keys[7], h, h, dtype),
            ],
            "density": {
                "w": 0.01 * jax.random.normal(keys[8], (h, 1), dtype),
                "b": jnp.full((1,), 0.1, dtype),
            },
            "feature": _torch_linear_init(keys[9], h, h, dtype),
            "color_layers": [
                _torch_linear_init(keys[10], h + self.dir_dim, h // 2, dtype),
                _torch_linear_init(keys[11], h // 2, 3, dtype),
            ],
        }
        return params

    def _trunk(self, params: Params, pos: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        pe = fourier_encode(pos, self.pos_L, self.include_input_pos)
        x = pe
        for p in params["pos_layers"]:
            x = jax.nn.relu(_linear(p, x))
        x = jnp.concatenate([x, pe], axis=-1)
        for p in params["skip_layers"]:
            x = jax.nn.relu(_linear(p, x))
        return x, pe

    def query_density(
        self,
        params: Params,
        pos: jnp.ndarray,
        *,
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sigma [...,1], features [...,hidden])."""
        x, _ = self._trunk(params, pos)
        sigma = _linear(params["density"], x)
        if train and self.sigma_noise:
            if rng is None:
                raise ValueError("rng required for train-time sigma noise")
            sigma = sigma + jax.random.normal(rng, sigma.shape, sigma.dtype)
        sigma = jax.nn.relu(sigma)
        features = _linear(params["feature"], x)
        return sigma, features

    def apply(
        self,
        params: Params,
        pos: jnp.ndarray,
        view: jnp.ndarray,
        *,
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Forward pass: returns (rgb [...,3], sigma [...,1])."""
        sigma, features = self.query_density(params, pos, rng=rng, train=train)
        de = fourier_encode(view, self.dir_L, self.include_input_dir)
        x = jnp.concatenate([features, de], axis=-1)
        for p in params["color_layers"][:-1]:
            x = jax.nn.relu(_linear(p, x))
        rgb = jax.nn.sigmoid(_linear(params["color_layers"][-1], x))
        return rgb, sigma

    # -- feature-major hot path ---------------------------------------------

    def query_density_planar(
        self,
        params: Params,
        pos3,
        *,
        rng: jax.Array | None = None,
        train: bool = False,
        dtype=jnp.float32,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(px,py,pz) [N] -> (sigma [N], features [hidden, N])."""
        from nerfjax.fields.encodings import fourier_encode_planar

        pe = fourier_encode_planar(
            pos3[0], pos3[1], pos3[2], self.pos_L, self.include_input_pos
        ).astype(dtype)
        def lin_t(p, v):
            return jnp.dot(
                p["w"].T.astype(dtype), v, preferred_element_type=dtype
            ) + p["b"].astype(dtype).reshape(-1, 1)

        h = pe
        for p in params["pos_layers"]:
            h = jax.nn.relu(lin_t(p, h))
        h = jnp.concatenate([h, pe], axis=0)
        for p in params["skip_layers"]:
            h = jax.nn.relu(lin_t(p, h))
        d = params["density"]
        sigma = jnp.dot(d["w"].T.astype(dtype), h, preferred_element_type=dtype) + d[
            "b"
        ].astype(dtype).reshape(-1, 1)
        sigma = sigma[0]
        if train and self.sigma_noise:
            if rng is None:
                raise ValueError("rng required for train-time sigma noise")
            sigma = sigma + jax.random.normal(rng, sigma.shape, sigma.dtype)
        sigma = jax.nn.relu(sigma)
        f = params["feature"]
        features = jnp.dot(f["w"].T.astype(dtype), h, preferred_element_type=dtype) + f[
            "b"
        ].astype(dtype).reshape(-1, 1)
        return sigma, features

    def apply_planar(
        self,
        params: Params,
        pos3,
        view3,
        *,
        rng: jax.Array | None = None,
        train: bool = False,
        dtype=jnp.float32,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Feature-major forward: -> (rgb [3, N], sigma [N])."""
        from nerfjax.fields.encodings import fourier_encode_planar

        sigma, features = self.query_density_planar(
            params, pos3, rng=rng, train=train, dtype=dtype
        )
        de = fourier_encode_planar(
            view3[0], view3[1], view3[2], self.dir_L, self.include_input_dir
        ).astype(dtype)
        h = jnp.concatenate([features, de], axis=0)
        for p in params["color_layers"][:-1]:
            h = jax.nn.relu(
                jnp.dot(p["w"].T.astype(dtype), h, preferred_element_type=dtype)
                + p["b"].astype(dtype).reshape(-1, 1)
            )
        p = params["color_layers"][-1]
        rgb = jax.nn.sigmoid(
            jnp.dot(p["w"].T.astype(dtype), h, preferred_element_type=dtype)
            + p["b"].astype(dtype).reshape(-1, 1)
        )
        return rgb, sigma

    def num_params(self, params: Params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
