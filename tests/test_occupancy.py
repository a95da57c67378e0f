import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.ops.occupancy import (
    OccupancyGridSpec,
    init_grid,
    occupancy_sample,
    segment_weights,
    update_grid,
)


def _grid_with_box(spec, lo=-0.2, hi=0.2, value=10.0):
    """Dense grid occupied only inside a centered box."""
    r = spec.resolution
    centers = (np.arange(r) + 0.5) * (2.0 / r) - 1.0
    X, Y, Z = np.meshgrid(centers, centers, centers, indexing="ij")
    occ = ((X > lo) & (X < hi) & (Y > lo) & (Y < hi) & (Z > lo) & (Z < hi))
    # linearization x + y*r + z*r^2 -> index arrays accordingly
    g = np.zeros(r**3, np.float32)
    lin = np.arange(r**3)
    ix, iy, iz = lin % r, (lin // r) % r, lin // (r * r)
    g[lin] = np.where(occ[ix, iy, iz], value, 0.0)
    return jnp.asarray(g)


def test_segment_weights_detect_box():
    spec = OccupancyGridSpec(resolution=32, n_segments=64, floor=0.0)
    grid = _grid_with_box(spec)
    # ray through the box center along +x
    ro = jnp.array([[-2.0, 0.0, 0.0]])
    rd = jnp.array([[1.0, 0.0, 0.0]])
    edges, w = segment_weights(spec, grid, ro, rd, jnp.array([1.0]), jnp.array([3.0]))
    w = np.asarray(w[0])
    mids = np.asarray(0.5 * (edges[0, 1:] + edges[0, :-1])) - 2.0  # x coords
    inside = (mids > -0.2) & (mids < 0.2)
    assert w[inside].min() > 0.5
    assert w[~inside].max() < 0.1


def test_occupancy_sample_concentrates():
    spec = OccupancyGridSpec(resolution=32, n_segments=64, floor=0.01)
    grid = _grid_with_box(spec)
    B = 64
    ro = jnp.tile(jnp.array([[-2.0, 0.0, 0.0]]), (B, 1))
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (B, 1))
    z = occupancy_sample(
        spec, grid, jax.random.PRNGKey(0), ro, rd,
        jnp.full((B,), 1.0), jnp.full((B,), 3.0), 32,
    )
    z = np.asarray(z)
    assert (np.diff(z, axis=-1) >= 0).all()  # sorted
    x = z - 2.0  # x coordinate along the ray
    frac_inside = ((x > -0.2) & (x < 0.2)).mean()
    assert frac_inside > 0.85, frac_inside


def test_update_grid_tracks_field():
    """After updates, the grid is high inside the analytic sphere and low
    outside (using the NGP field fitted... here: a fake field)."""

    class FakeField:
        def query_density_planar(self, params, pos3, **kw):
            r = jnp.sqrt(pos3[0] ** 2 + pos3[1] ** 2 + pos3[2] ** 2)
            return jnp.where(r < 0.5, 20.0, 0.0), None

    spec = OccupancyGridSpec(resolution=16, decay=0.5)
    grid = init_grid(spec)
    for i in range(6):
        grid = update_grid(spec, grid, FakeField(), None, jax.random.PRNGKey(i))
    g = np.asarray(grid)
    r = spec.resolution
    centers = (np.arange(r) + 0.5) * (2.0 / r) - 1.0
    lin = np.arange(r**3)
    ix, iy, iz = lin % r, (lin // r) % r, lin // (r * r)
    radius = np.sqrt(centers[ix] ** 2 + centers[iy] ** 2 + centers[iz] ** 2)
    assert g[radius < 0.3].min() > 1.0
    assert g[radius > 0.8].max() < 0.1  # decayed away


@pytest.mark.slow
def test_train_with_occupancy_improves(tmp_path):
    """Full step with the occupancy path on (tiny grid) trains and the grid
    update branch executes without recompilation."""
    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.data import RayDataset, prefetch_to_device
    from nerfjax.parallel import make_mesh, replicate
    from nerfjax.train import (
        TrainSettings, build_fields, init_occupancy, init_params,
        make_optimizer, make_train_step,
    )
    from tests.synthetic import make_ray_npz

    npz = tmp_path / "r.npz"
    make_ray_npz(npz, n_rays=1024)
    cfg = with_defaults(ConfigNode({
        "scene_name": "o", "ngp": True, "nerf_type": "small",
        "N_samples": 16, "N_importance": 16, "precision": "bf16",
        "occupancy_grid": True, "occ_resolution": 16, "occ_update_every": 4,
        "lr": 1e-2,
    }))
    ds = RayDataset(npz, verbose=False)
    mesh = make_mesh()
    settings = TrainSettings.from_cfg(cfg, total_steps=50)
    fc, ff, _ = build_fields(cfg)
    params = replicate(init_params(cfg, jax.random.PRNGKey(0)), mesh)
    tx = make_optimizer(settings)
    opt_state = replicate(tx.init(jax.device_get(params)), mesh)
    step = replicate(jnp.zeros((), jnp.int32), mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)
    grid = replicate(init_occupancy(settings), mesh)
    step_fn = make_train_step(settings, fc, ff, tx, mesh)

    losses = []
    for epoch in range(4):
        for batch in prefetch_to_device(ds.epoch_batches(256, seed=epoch), mesh):
            params, opt_state, step, grid, m = step_fn(
                params, opt_state, step, grid, key, batch
            )
            losses.append(float(m["loss_total"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # grid was refreshed: no longer all ones
    g = np.asarray(jax.device_get(grid))
    assert g.std() > 0


def test_occupancy_sample_sorted_and_in_range():
    """Compositing assumes monotonically non-decreasing depths (dists =
    diff(z) feeds alpha = 1-exp(-sigma*dist)); the single-pass op point
    composites the occupancy samples directly, so this invariant is
    load-bearing. Also: every depth stays inside [t_near, t_far]."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfjax.ops.occupancy import OccupancyGridSpec, init_grid, occupancy_sample

    spec = OccupancyGridSpec(resolution=32, update_every=1)
    rng = np.random.default_rng(0)
    # half-empty grid: strong CDF concentration -> stresses the sort/range
    grid = np.asarray(init_grid(spec))
    g = rng.uniform(0, 1, size=grid.shape).astype(np.float32)
    g[: g.size // 2] = 0.0
    grid = jnp.asarray(g)

    B = 256
    o = rng.normal(size=(B, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    tn = jnp.full((B,), 1.5)
    tf = jnp.full((B,), 3.5)

    z = np.asarray(
        occupancy_sample(
            spec, grid, jax.random.PRNGKey(0), jnp.asarray(o), jnp.asarray(d),
            tn, tf, 48,
        )
    )
    assert z.shape == (B, 48)
    assert np.all(np.diff(z, axis=-1) >= 0), "depths must be sorted"
    assert np.all(z >= 1.5 - 1e-5) and np.all(z <= 3.5 + 1e-5)
