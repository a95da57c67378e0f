"""Input encodings: Fourier positional encoding and spherical harmonics.

TPU notes: both are pure elementwise math on the VPU; XLA fuses them into the
first matmul of the consuming MLP, so no custom kernel is needed here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fourier_output_dim(L: int, include_input: bool = True) -> int:
    return (3 if include_input else 0) + 3 * 2 * L


def fourier_encode(x: jnp.ndarray, L: int, include_input: bool = True) -> jnp.ndarray:
    """Fourier feature encoding ``[x, sin(x·2^k·π), cos(x·2^k·π)]``, k < L.

    Parity: reference scripts/model.py:6-53 (OptimizedPositionalEncoding) —
    frequency bands ``2^k * π`` and a [sin-block, cos-block] layout where each
    block is the flattened [..., 3, L] tensor.
    """
    freq = (2.0 ** jnp.arange(L, dtype=x.dtype)) * jnp.pi  # [L]
    xf = x[..., None] * freq  # [..., 3, L]
    parts = [x] if include_input else []
    parts.append(jnp.sin(xf).reshape(*x.shape[:-1], -1))
    parts.append(jnp.cos(xf).reshape(*x.shape[:-1], -1))
    return jnp.concatenate(parts, axis=-1)


def fourier_encode_planar(
    px: jnp.ndarray, py: jnp.ndarray, pz: jnp.ndarray, L: int, include_input: bool = True
) -> jnp.ndarray:
    """Feature-major Fourier encoding: three [N] components -> [3+6L, N].

    Row layout matches fourier_encode's column layout: [x,y,z, sin-block
    (x*f0..x*fL-1, y*f0.., z*f0..), cos-block] so the two paths share
    checkpointed first-layer weights.
    """
    comps = [px, py, pz]
    rows = list(comps) if include_input else []
    freqs = [float(2.0**k * np.pi) for k in range(L)]
    for fn in (jnp.sin, jnp.cos):
        for c in comps:
            for f in freqs:
                rows.append(fn(c * f))
    return jnp.stack(rows, axis=0)


def sh4_encode(d: jnp.ndarray) -> jnp.ndarray:
    """Real spherical harmonics up to degree 4 (16 coefficients).

    Closed-form polynomial evaluation of the SH basis on unit directions,
    replacing tiny-cuda-nn's SphericalHarmonics encoding used by the reference
    NGP color net (reference: scripts/instantngp.py:34-40).

    Conscious fix vs the reference: tcnn's SH encoding assumes inputs in
    [0,1] and internally remaps ``2x-1``; the reference feeds unit vectors in
    [-1,1] directly, so tcnn evaluated SH of a distorted direction. We encode
    the true unit direction (documented deviation; PSNR-verified empirically).
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    sh = [
        jnp.full_like(x, 0.28209479177387814),  # l=0
        -0.48860251190291987 * y,  # l=1
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,  # l=2
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),  # l=3
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.stack(sh, axis=-1)


def sh4_encode_planar(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Feature-major SH4: three [N] components -> [16, N]."""
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    rows = [
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.stack(rows, axis=0)
