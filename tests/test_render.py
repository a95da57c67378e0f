import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.render import (
    merge_z_vals,
    raw2outputs,
    render_rays,
    sample_pdf,
    stratified_sample,
)
from nerfjax.fields.vanilla import VanillaNeRF


def test_stratified_sample_bounds_and_order():
    key = jax.random.PRNGKey(0)
    B, S = 32, 64
    ro = jnp.zeros((B, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (B, 1))
    near = jnp.full((B,), 0.5)
    far = jnp.full((B,), 2.0)
    pts, z = stratified_sample(key, ro, rd, near, far, S)
    assert pts.shape == (B, S, 3)
    assert z.shape == (B, S)
    zn = np.asarray(z)
    assert (zn >= 0.5 - 1e-5).all() and (zn <= 2.0 + 1e-5).all()
    assert (np.diff(zn, axis=-1) >= -1e-6).all()  # sorted per ray
    # points actually lie on the ray
    np.testing.assert_allclose(np.asarray(pts[..., 2]), zn, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pts[..., :2]), 0.0, atol=1e-6)


def test_sample_pdf_concentrates_mass():
    key = jax.random.PRNGKey(1)
    B, M = 16, 64
    bins = jnp.tile(jnp.linspace(0.0, 1.0, M)[None], (B, 1))
    w = jnp.zeros((B, M - 1)).at[:, 40:50].set(10.0)  # mass in [~0.63, ~0.79]
    samples = sample_pdf(key, bins, w, 256)
    s = np.asarray(samples)
    frac_inside = ((s > 0.6) & (s < 0.82)).mean()
    assert frac_inside > 0.95
    assert (s >= 0).all() and (s <= 1).all()


def test_sample_pdf_uniform_weights_cover_range():
    key = jax.random.PRNGKey(2)
    bins = jnp.linspace(0.0, 1.0, 33)[None]
    w = jnp.ones((1, 32))
    s = np.asarray(sample_pdf(key, bins, w, 4096))
    hist, _ = np.histogram(s, bins=8, range=(0, 1))
    assert hist.min() > 0.5 * hist.max()  # roughly uniform


def test_merge_z_vals_sorted():
    ro = jnp.zeros((4, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    zc = jnp.tile(jnp.linspace(0.0, 1.0, 8)[None], (4, 1))
    zi = jax.random.uniform(jax.random.PRNGKey(0), (4, 5))
    pts, z = merge_z_vals(ro, rd, zc, zi)
    assert z.shape == (4, 13)
    assert pts.shape == (4, 13, 3)
    assert (np.diff(np.asarray(z), axis=-1) >= 0).all()


def test_raw2outputs_opaque_surface():
    """A single very dense sample should dominate the color."""
    B, S = 2, 8
    z = jnp.tile(jnp.linspace(0.1, 1.0, S)[None], (B, 1))
    rgb = jnp.zeros((B, S, 3)).at[:, 3, :].set(jnp.array([1.0, 0.5, 0.25]))
    sigma = jnp.zeros((B, S)).at[:, 3].set(1e8)
    rgb_map, w = raw2outputs(rgb, sigma, z)
    np.testing.assert_allclose(np.asarray(rgb_map[0]), [1.0, 0.5, 0.25], atol=1e-4)
    np.testing.assert_allclose(np.asarray(w[:, 3]), 1.0, atol=1e-4)


def test_raw2outputs_empty_space_white_bg():
    B, S = 2, 8
    z = jnp.tile(jnp.linspace(0.1, 1.0, S)[None], (B, 1))
    rgb = jnp.ones((B, S, 3)) * 0.3
    sigma = jnp.zeros((B, S))
    rgb_map, w = raw2outputs(rgb, sigma, z, white_bg=True)
    np.testing.assert_allclose(np.asarray(rgb_map), 1.0, atol=1e-5)  # all background
    rgb_map2, _ = raw2outputs(rgb, sigma, z, white_bg=False)
    np.testing.assert_allclose(np.asarray(rgb_map2), 0.0, atol=1e-5)


def test_raw2outputs_weights_sum_le_one():
    key = jax.random.PRNGKey(3)
    B, S = 64, 32
    z = jnp.sort(jax.random.uniform(key, (B, S)), axis=-1)
    sigma = jax.random.uniform(key, (B, S)) * 5
    rgb = jax.random.uniform(key, (B, S, 3))
    _, w = raw2outputs(rgb, sigma, z)
    assert (np.asarray(w).sum(-1) <= 1.0 + 1e-4).all()
    assert (np.asarray(w) >= 0).all()


def test_render_rays_end_to_end_jit():
    model = VanillaNeRF(pos_L=4, dir_L=2, hidden_dim=32)
    pc = model.init(jax.random.PRNGKey(0))
    pf = model.init(jax.random.PRNGKey(1))
    B, S, I = 16, 8, 16

    @jax.jit
    def run(key, ro, rd, tn, tf):
        return render_rays(
            model, pc, model, pf, key, ro, rd, tn, tf, S, I, train=False
        )

    ro = jnp.zeros((B, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (B, 1))
    tn = jnp.full((B,), 0.1)
    tf = jnp.full((B,), 2.0)
    out = run(jax.random.PRNGKey(2), ro, rd, tn, tf)
    assert out["rgb_coarse"].shape == (B, 3)
    assert out["rgb_fine"].shape == (B, 3)
    assert out["z_vals"].shape == (B, S + I)
    assert np.isfinite(np.asarray(out["rgb_fine"])).all()


def test_single_pass_render_and_train_step():
    """single_pass=True: one field evaluation over n_samples+n_importance
    depths, fine-only loss; output dict keeps the hierarchical API shape."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.parallel import make_mesh, replicate, shard_batch
    from nerfjax.render import render_rays_planar
    from nerfjax.train import (
        TrainSettings,
        build_fields,
        init_occupancy,
        init_params,
        make_optimizer,
        make_train_step,
    )

    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "sp",
                "ngp": True,
                "nerf_type": "small",
                "N_samples": 8,
                "N_importance": 8,
                "occupancy_grid": True,
                "occ_resolution": 16,
                "single_pass": True,
                "hash_grad_corners": 2,
            }
        )
    )
    fc, ff, _ = build_fields(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B = 16
    o = rng.normal(size=(B, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    out = render_rays_planar(
        fc, params["model"], ff, params["model"], jax.random.PRNGKey(1),
        jnp.asarray(o), jnp.asarray(d),
        jnp.full((B,), 1.5), jnp.full((B,), 3.5),
        n_samples=8, n_importance=8, train=True,
        occ_spec=None, occ_grid=None, single_pass=True,
    )
    assert out["rgb_fine"].shape == (B, 3)
    assert out["z_vals"].shape == (B, 16)  # all 16 depths in one pass
    np.testing.assert_array_equal(
        np.asarray(out["rgb_coarse"]), np.asarray(out["rgb_fine"])
    )

    # full train step on the mesh: loss_coarse reported as 0, loss decreases
    mesh = make_mesh()
    settings = TrainSettings.from_cfg(cfg, total_steps=100)
    assert settings.single_pass
    tx = make_optimizer(settings)
    p = replicate(params, mesh)
    s = replicate(tx.init(jax.device_get(params)), mesh)
    st = replicate(jnp.zeros((), jnp.int32), mesh)
    occ = replicate(init_occupancy(settings), mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)
    B2 = 32
    batch = shard_batch(
        {
            "rays_o": np.repeat(o, 2, axis=0),
            "rays_d": np.repeat(d, 2, axis=0).astype(np.float32),
            "rgb": rng.uniform(size=(B2, 3)).astype(np.float32),
            "t_near": np.full((B2,), 1.5, np.float32),
            "t_far": np.full((B2,), 3.5, np.float32),
        },
        mesh,
    )
    ts = make_train_step(settings, fc, ff, tx, mesh)
    losses = []
    for _ in range(5):
        p, s, st, occ, m = ts(p, s, st, occ, key, batch)
        losses.append(float(m["loss_total"]))
        assert float(m["loss_coarse"]) == 0.0
    assert losses[-1] < losses[0]
