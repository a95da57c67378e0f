import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.fields.encodings import fourier_encode, fourier_output_dim, sh4_encode
from nerfjax.fields.ngp import HashGridSpec, InstantNGP, hashgrid_encode
from nerfjax.fields.vanilla import VanillaNeRF


def test_fourier_encode_shapes_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    enc = fourier_encode(x, L=10)
    assert enc.shape == (1, 63)
    assert fourier_output_dim(10) == 63
    assert fourier_output_dim(4) == 27
    # layout: [x, sin-block(3*L), cos-block(3*L)], sin block is [...,3,L] flat
    np.testing.assert_allclose(np.asarray(enc[0, :3]), [0.5, -0.25, 1.0])
    np.testing.assert_allclose(
        float(enc[0, 3]), np.sin(0.5 * np.pi), rtol=1e-6
    )  # first sin = sin(x0 * 2^0 * pi)
    np.testing.assert_allclose(
        float(enc[0, 3 + 30]), np.cos(0.5 * np.pi), atol=1e-6
    )  # first cos


def test_sh4_orthonormality():
    """SH basis sampled on the sphere must be (near) orthonormal under the
    uniform measure — catches coefficient typos."""
    rng = np.random.default_rng(1)
    d = rng.normal(size=(200_000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(sh4_encode(jnp.asarray(d, jnp.float32)))
    gram = (Y.T @ Y) / len(Y) * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


@pytest.mark.slow
def test_vanilla_nerf_shapes_and_param_count():
    model = VanillaNeRF()
    params = model.init(jax.random.PRNGKey(0))
    # Reference param count: ~595k per model (8x256 skip MLP).
    n = model.num_params(params)
    assert 550_000 < n < 650_000

    pos = jax.random.uniform(jax.random.PRNGKey(1), (17, 3), minval=-1, maxval=1)
    view = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    rgb, sigma = model.apply(params, pos, view)
    assert rgb.shape == (17, 3)
    assert sigma.shape == (17, 1)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    assert (np.asarray(sigma) >= 0).all()


def test_vanilla_sigma_noise_needs_rng_and_changes_sigma():
    model = VanillaNeRF()
    params = model.init(jax.random.PRNGKey(0))
    pos = jnp.zeros((4, 3))
    view = jnp.ones((4, 3)) / np.sqrt(3)
    rgb0, sigma0 = model.apply(params, pos, view, train=False)
    rgb1, sigma1 = model.apply(params, pos, view, rng=jax.random.PRNGKey(7), train=True)
    assert not np.allclose(np.asarray(sigma0), np.asarray(sigma1))
    np.testing.assert_allclose(np.asarray(rgb0), np.asarray(rgb1), rtol=1e-5)


def test_hashgrid_spec_levels():
    spec = HashGridSpec(log2_hashmap_size=19)
    levels = spec.level_params()
    assert len(levels) == 16
    # level 0: scale 15, res 16 -> dense 4096 entries (< 2^19)
    assert levels[0]["res"] == 16
    assert not levels[0]["use_hash"]
    # top levels must hash
    assert levels[-1]["use_hash"]
    assert levels[-1]["size"] == 1 << 19
    # offsets strictly increasing, total consistent
    offs = [l["offset"] for l in levels]
    assert offs == sorted(offs)
    assert spec.total_table_size == levels[-1]["offset"] + levels[-1]["size"]


def test_hashgrid_encode_interpolates():
    """At an exact grid vertex of level 0 the encoding's level-0 channels must
    equal that vertex's table entry (trilinear weight collapses to 1)."""
    spec = HashGridSpec(n_levels=1, log2_hashmap_size=15, base_resolution=16)
    table = jax.random.normal(jax.random.PRNGKey(0), (2, spec.total_table_size))
    # level 0: scale = 15. pos = x*15 + 0.5. Choose x so pos lands on vertex 3:
    # x*15 + 0.5 = 3  ->  x = 2.5/15
    x = jnp.array([[2.5 / 15, 2.5 / 15, 2.5 / 15]])
    enc = hashgrid_encode(spec, table, x)
    res = spec.level_params()[0]["res"]
    vidx = 3 + 3 * res + 3 * res * res
    np.testing.assert_allclose(
        np.asarray(enc[0]), np.asarray(table[:, vidx]), rtol=1e-4
    )


def test_hashgrid_encode_matches_manual_trilinear():
    """Full trilinear check against a tiny numpy oracle at a generic point."""
    spec = HashGridSpec(n_levels=1, log2_hashmap_size=15, base_resolution=16)
    rng = np.random.default_rng(0)
    table = rng.normal(size=(2, spec.total_table_size)).astype(np.float32)
    res = spec.level_params()[0]["res"]
    scale = spec.level_params()[0]["scale"]
    x = np.array([[0.31, 0.57, 0.83]], np.float32)
    pos = x[0] * scale + 0.5
    p0 = np.floor(pos).astype(int)
    t = pos - p0
    expect = np.zeros(2)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                vid = (p0[0] + dx) + (p0[1] + dy) * res + (p0[2] + dz) * res * res
                w = (t[0] if dx else 1 - t[0]) * (t[1] if dy else 1 - t[1]) * (
                    t[2] if dz else 1 - t[2]
                )
                expect += w * table[:, vid]
    enc = hashgrid_encode(spec, jnp.asarray(table), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(enc[0]), expect, rtol=1e-4)


def test_hashgrid_encode_continuity():
    spec = HashGridSpec(n_levels=4, log2_hashmap_size=15)
    table = jax.random.normal(jax.random.PRNGKey(0), (2, spec.total_table_size)) * 0.1
    x = jnp.array([[0.3, 0.4, 0.5]])
    eps = 1e-5
    e0 = hashgrid_encode(spec, table, x)
    e1 = hashgrid_encode(spec, table, x + eps)
    assert float(jnp.max(jnp.abs(e0 - e1))) < 1e-2


def test_instant_ngp_shapes_and_param_count():
    model = InstantNGP("large")
    params = model.init(jax.random.PRNGKey(0))
    n = model.num_params(params)
    # Reference reports ~16.8M params for NGP-large (hash-dominated).
    assert 10e6 < n < 20e6

    pos = jax.random.uniform(jax.random.PRNGKey(1), (33, 3), minval=-1, maxval=1)
    view = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    rgb, sigma = model.apply(params, pos, view)
    assert rgb.shape == (33, 3)
    assert sigma.shape == (33, 1)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    assert (np.asarray(sigma) >= 0).all()


@pytest.mark.slow
def test_instant_ngp_is_trainable():
    """Gradient flows into the hash table (the gather transpose scatter-add)."""
    model = InstantNGP("small")
    params = model.init(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    view = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (64, 1))

    def loss(p):
        rgb, sigma = model.apply(p, pos, view)
        return jnp.mean(rgb**2) + jnp.mean(sigma)

    g = jax.grad(loss)(params)
    assert float(jnp.sum(jnp.abs(g["table"]))) > 0
    assert float(jnp.sum(jnp.abs(g["dmlp"][0]["w"]))) > 0
    assert float(jnp.sum(jnp.abs(g["cmlp"][0]["w"]))) > 0
