"""Pallas TPU kernel: fused Instant-NGP MLP head.

Replaces tiny-cuda-nn's FullyFusedMLP pair (reference: scripts/instantngp.py
:41-64) for field evaluation: density MLP (32->64->16, ReLU out), concat
with the SH-4 direction encoding, color MLP (32->64->64->3, sigmoid out) —
all five matmuls fused over one point tile, with every weight matrix and
intermediate activation resident in VMEM. The unfused XLA path materializes
each [64, N] activation in HBM between matmuls; here a [C, TILE] tile flows
HBM -> VMEM once and only rgb/sigma leave.

Feature-major layout ([C, N]); used on the inference paths (volume
extraction, eval rendering). Training gradients go through the XLA path
(identical math, see fields.ngp.apply_planar).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # lanes per program; multiple of 128


def _head_kernel(enc_ref, sh_ref, w1_ref, w2_ref, w3_ref, w4_ref, w5_ref, out_ref):
    """One tile: enc [E,T], sh [16,T] -> out [4,T] (rgb rows 0..2, sigma 3).
    E = n_levels * n_features (32 for the reference 16-level shape, 24 for
    the tuned 12-level one)."""
    enc = enc_ref[:]
    f = jnp.float32
    h = jnp.maximum(jnp.dot(w1_ref[:], enc, preferred_element_type=f), 0.0)
    feat = jnp.maximum(jnp.dot(w2_ref[:], h, preferred_element_type=f), 0.0)  # [16,T]
    x2 = jnp.concatenate([feat, sh_ref[:]], axis=0)  # [32,T]
    h2 = jnp.maximum(jnp.dot(w3_ref[:], x2, preferred_element_type=f), 0.0)
    h3 = jnp.maximum(jnp.dot(w4_ref[:], h2, preferred_element_type=f), 0.0)
    rgb = jax.nn.sigmoid(jnp.dot(w5_ref[:], h3, preferred_element_type=f))  # [3,T]
    out_ref[:] = jnp.concatenate([rgb, feat[0:1, :]], axis=0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ngp_head(
    params: dict,
    enc: jnp.ndarray,
    sh: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(rgb [3,N], sigma [N]) from enc [E,N] and sh [16,N].

    params: the InstantNGP param dict (dmlp/cmlp weight lists, [in,out]).
    E is read from enc (the dmlp input width must match — e.g. 24 for the
    tuned 12-level model); a full-height block is legal for any E since a
    Mosaic block dim may equal the array dim.
    """
    n = enc.shape[1]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        enc = jnp.pad(enc, ((0, 0), (0, n_pad - n)))
        sh = jnp.pad(sh, ((0, 0), (0, n_pad - n)))

    dt = enc.dtype
    w1 = params["dmlp"][0]["w"].T.astype(dt)  # [64, E]
    w2 = params["dmlp"][1]["w"].T.astype(dt)  # [16, 64]
    w3 = params["cmlp"][0]["w"].T.astype(dt)  # [64, 32]
    w4 = params["cmlp"][1]["w"].T.astype(dt)  # [64, 64]
    w5 = params["cmlp"][2]["w"].T.astype(dt)  # [3, 64]

    grid = (n_pad // TILE,)
    data_spec = lambda c: pl.BlockSpec(
        (c, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((4, n_pad), dt),
        grid=grid,
        in_specs=[
            data_spec(enc.shape[0]),
            data_spec(16),
            w_spec,
            w_spec,
            w_spec,
            w_spec,
            w_spec,
        ],
        out_specs=data_spec(4),
        interpret=interpret,
    )(enc, sh, w1, w2, w3, w4, w5)

    rgb = out[0:3, :n]
    sigma = out[3, :n]
    return rgb, sigma


def _density_kernel(enc_ref, w1_ref, w2_ref, out_ref):
    """Density-only tile: enc [E,T] -> out [1,T] (sigma = dmlp feat row 0).
    Bit-identical sigma to _head_kernel (same two f32-accumulated matmuls);
    skips w3-w5 + SH entirely — the coarse extraction mark pass never reads
    RGB (reference workload: scripts/extract_vol.py:85-120)."""
    f = jnp.float32
    h = jnp.maximum(jnp.dot(w1_ref[:], enc_ref[:], preferred_element_type=f), 0.0)
    # full w2 dot (same shape as _head_kernel's -> same accumulation order,
    # hence bit-identical sigma); the extra 15 rows are ~free vs w3-w5
    feat = jnp.maximum(jnp.dot(w2_ref[:], h, preferred_element_type=f), 0.0)
    out_ref[:] = feat[0:1, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ngp_density(
    params: dict, enc: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """sigma [N] from enc [E,N] — the density-only twin of fused_ngp_head."""
    n = enc.shape[1]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        enc = jnp.pad(enc, ((0, 0), (0, n_pad - n)))

    dt = enc.dtype
    w1 = params["dmlp"][0]["w"].T.astype(dt)  # [64, E]
    w2 = params["dmlp"][1]["w"].T.astype(dt)  # [16, 64]

    grid = (n_pad // TILE,)
    data_spec = lambda c: pl.BlockSpec(
        (c, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _density_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), dt),
        grid=grid,
        in_specs=[data_spec(enc.shape[0]), w_spec, w_spec],
        out_specs=data_spec(1),
        interpret=interpret,
    )(enc, w1, w2)
    return out[0, :n]
