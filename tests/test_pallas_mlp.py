"""Fused Pallas MLP head vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.fields.encodings import sh4_encode_planar
from nerfjax.fields.ngp import InstantNGP
from nerfjax.ops.hash_encode import hash_encode_planar
from nerfjax.ops.pallas_mlp import fused_ngp_head


def test_fused_head_matches_xla_path():
    model = InstantNGP("small")
    params = model.init(jax.random.PRNGKey(0))
    N = 1500  # exercises tile padding (not a multiple of 1024)
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    view = pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    pos3 = tuple(jnp.asarray(pos[:, i]) for i in range(3))
    view3 = tuple(jnp.asarray(view[:, i]) for i in range(3))

    rgb_ref, sigma_ref = model.apply_planar(params, pos3, view3, dtype=jnp.float32)

    x = jnp.clip((pos3[0] + 1) * 0.5, 0, 1)
    y = jnp.clip((pos3[1] + 1) * 0.5, 0, 1)
    z = jnp.clip((pos3[2] + 1) * 0.5, 0, 1)
    enc = hash_encode_planar(model.spec, params["table"], x, y, z, dtype=jnp.float32)
    sh = sh4_encode_planar(*view3)
    rgb_f, sigma_f = fused_ngp_head(params, enc, sh, interpret=True)

    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_ref), atol=2e-5)


def test_apply_planar_fused_end_to_end_interpret():
    model = InstantNGP("small")
    params = model.init(jax.random.PRNGKey(1))
    N = 1024
    rng = np.random.default_rng(1)
    pos = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    view = pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    pos3 = tuple(jnp.asarray(pos[:, i]) for i in range(3))
    view3 = tuple(jnp.asarray(view[:, i]) for i in range(3))

    rgb_ref, sigma_ref = model.apply_planar(params, pos3, view3, dtype=jnp.float32)
    rgb_f, sigma_f = model.apply_planar_fused(
        params, pos3, view3, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_ref), atol=2e-5)


def test_fused_head_tuned_model_shape():
    """The tuned op point (12 levels + promoted dense levels) changes the
    encoding width to 24 — the fused head must derive E from the input, not
    assume the 16-level 32-wide shape (regression: extraction crashed with
    'contracting dimensions ... (24,) and (32,)' on tuned checkpoints)."""
    model = InstantNGP("small", n_levels=12, extra_dense_levels=2)
    params = model.init(jax.random.PRNGKey(2))
    N = 700
    rng = np.random.default_rng(2)
    pos = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    view = pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    pos3 = tuple(jnp.asarray(pos[:, i]) for i in range(3))
    view3 = tuple(jnp.asarray(view[:, i]) for i in range(3))

    rgb_ref, sigma_ref = model.apply_planar(params, pos3, view3, dtype=jnp.float32)

    x = jnp.clip((pos3[0] + 1) * 0.5, 0, 1)
    y = jnp.clip((pos3[1] + 1) * 0.5, 0, 1)
    z = jnp.clip((pos3[2] + 1) * 0.5, 0, 1)
    enc = hash_encode_planar(model.spec, params["table"], x, y, z, dtype=jnp.float32)
    assert enc.shape[0] == 24
    sh = sh4_encode_planar(*view3)
    rgb_f, sigma_f = fused_ngp_head(params, enc, sh, interpret=True)

    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_ref), atol=2e-5)
