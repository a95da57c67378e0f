"""Otsu thresholding as a device-side histogram reduction.

The reference ships 134M densities to host and runs skimage's Otsu
(reference: scripts/extract_vol.py:123-150). Here the 256-bin histogram and
the between-class-variance argmax run on device; only the scalar threshold
comes back — matching skimage.filters.threshold_otsu's binning semantics
(256 bins over [min, max], threshold = lower edge... skimage returns
bin_centers[argmax]; we return the same bin-center convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NBINS = 256


@jax.jit
def otsu_threshold(values: jnp.ndarray) -> jnp.ndarray:
    """Scalar Otsu threshold of a flattened array (256 bins, skimage-style)."""
    v = values.reshape(-1).astype(jnp.float32)
    vmin = jnp.min(v)
    vmax = jnp.max(v)
    span = jnp.maximum(vmax - vmin, 1e-12)

    bin_idx = jnp.clip(((v - vmin) / span * NBINS).astype(jnp.int32), 0, NBINS - 1)
    hist = jnp.zeros((NBINS,), jnp.float32).at[bin_idx].add(1.0)

    bin_width = span / NBINS
    centers = vmin + (jnp.arange(NBINS, dtype=jnp.float32) + 0.5) * bin_width

    # Between-class variance for every split (skimage formulation).
    w1 = jnp.cumsum(hist)
    w2 = jnp.cumsum(hist[::-1])[::-1]
    m1 = jnp.cumsum(hist * centers) / jnp.maximum(w1, 1e-12)
    m2 = (jnp.cumsum((hist * centers)[::-1]) / jnp.maximum(w2[::-1], 1e-12))[::-1]

    # variance of split between bin i and i+1
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    i = jnp.argmax(var12)
    return centers[i]
