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


def test_partitioned_update_covers_all_cells():
    """P>1 refreshes a rotating interleaved subset; after P updates every
    cell has been re-queried, and occupied/empty classification matches the
    full-refresh result."""

    class FakeField:
        def query_density_planar(self, params, pos3, **kw):
            r = jnp.sqrt(pos3[0] ** 2 + pos3[1] ** 2 + pos3[2] ** 2)
            return jnp.where(r < 0.5, 20.0, 0.0), None

    full = OccupancyGridSpec(resolution=16, decay=0.5)
    part = OccupancyGridSpec(resolution=16, decay=0.5, update_partitions=4)

    gf = init_grid(full)
    gp = init_grid(part)
    for i in range(8):
        gf = update_grid(full, gf, FakeField(), None, jax.random.PRNGKey(i))
        gp = update_grid(
            part, gp, FakeField(), None, jax.random.PRNGKey(i),
            phase=i % part.update_partitions,
        )
    gf, gp = np.asarray(gf), np.asarray(gp)
    r = full.resolution
    centers = (np.arange(r) + 0.5) * (2.0 / r) - 1.0
    lin = np.arange(r**3)
    ix, iy, iz = lin % r, (lin // r) % r, lin // (r * r)
    radius = np.sqrt(centers[ix] ** 2 + centers[iy] ** 2 + centers[iz] ** 2)
    # same classification as the full refresh at the spec threshold (boundary
    # cells flip with the per-run jitter draws — allow a 2% fringe)
    assert gp[radius < 0.3].min() > 1.0
    assert gp[radius > 0.8].max() < 0.1
    assert ((gf > full.threshold) == (gp > full.threshold)).mean() > 0.98


def test_partitioned_update_p1_is_exact_full_refresh():
    """P=1 with any phase equals the original full update bit-for-bit."""

    class FakeField:
        def query_density_planar(self, params, pos3, **kw):
            return jnp.abs(pos3[0]) * 3.0, None

    spec = OccupancyGridSpec(resolution=8, decay=0.7)
    g0 = init_grid(spec) * 0.5
    a = update_grid(spec, g0, FakeField(), None, jax.random.PRNGKey(3))
    b = update_grid(spec, g0, FakeField(), None, jax.random.PRNGKey(3), phase=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partitioned_update_only_touches_subset():
    """A P=4 update changes only cells lin % 4 == phase beyond the decay."""

    class FakeField:
        def query_density_planar(self, params, pos3, **kw):
            return jnp.full(pos3[0].shape, 42.0), None

    spec = OccupancyGridSpec(resolution=8, decay=0.9, update_partitions=4)
    g0 = init_grid(spec)
    g1 = np.asarray(
        update_grid(spec, g0, FakeField(), None, jax.random.PRNGKey(0), phase=2)
    )
    lin = np.arange(spec.resolution**3)
    refreshed = lin % 4 == 2
    np.testing.assert_allclose(g1[refreshed], 42.0)
    np.testing.assert_allclose(g1[~refreshed], 0.9)


def test_fast_cdf_sampler_matches_distribution():
    """The stratified arithmetic sampler draws from the SAME piecewise-
    constant distribution as sample_pdf: per-segment sample mass matches the
    normalized weights, output is sorted and in [near, far], and samples
    concentrate in the occupied box exactly like the exact path."""
    spec = OccupancyGridSpec(resolution=32, n_segments=64, floor=0.01,
                             fast_cdf=True)
    grid = _grid_with_box(spec)
    B = 256
    ro = jnp.tile(jnp.array([[-2.0, 0.0, 0.0]]), (B, 1))
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (B, 1))
    tn, tf = jnp.full((B,), 1.0), jnp.full((B,), 3.0)
    z = np.asarray(
        occupancy_sample(spec, grid, jax.random.PRNGKey(0), ro, rd, tn, tf, 32)
    )
    assert (np.diff(z, axis=-1) >= 0).all()  # sorted by construction
    assert z.min() >= 1.0 and z.max() <= 3.0
    x = z - 2.0
    assert ((x > -0.2) & (x < 0.2)).mean() > 0.85

    # distribution match against the exact path: per-segment histogram of a
    # large sample agrees within sampling noise
    exact = OccupancyGridSpec(resolution=32, n_segments=64, floor=0.01)
    ze = np.asarray(
        occupancy_sample(exact, grid, jax.random.PRNGKey(1), ro, rd, tn, tf, 32)
    )
    hf, _ = np.histogram(z, bins=16, range=(1.0, 3.0))
    he, _ = np.histogram(ze, bins=16, range=(1.0, 3.0))
    hf = hf / hf.sum()
    he = he / he.sum()
    assert np.abs(hf - he).max() < 0.03, (hf, he)


def test_fast_cdf_sampler_uniform_weights_are_stratified():
    """With flat weights the fast sampler reduces to stratified-uniform in
    [near, far]: exactly one sample per stratum."""
    spec = OccupancyGridSpec(resolution=8, n_segments=16, floor=0.0,
                             fast_cdf=True, threshold=-1.0)
    grid = jnp.ones((8**3,), jnp.float32)
    B, n = 64, 16
    ro = jnp.zeros((B, 3))
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (B, 1))
    z = np.asarray(
        occupancy_sample(
            spec, grid, jax.random.PRNGKey(0), ro, rd,
            jnp.zeros((B,)), jnp.ones((B,)), n,
        )
    )
    # sample s must land in stratum [s/n, (s+1)/n)
    lo = np.arange(n) / n
    hi = (np.arange(n) + 1) / n
    assert (z >= lo[None, :] - 1e-6).all() and (z <= hi[None, :] + 1e-6).all()


def test_occ_segments_flows_from_cfg_and_low_M_still_concentrates():
    """occ_segments (round-5g lever) must reach OccupancyGridSpec.n_segments
    from the cfg, reject <1 loudly, and a coarse M must keep the sampler's
    contract: sorted depths in [near, far] that concentrate in occupied
    segments (empty-space skipping still works at M=32)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.ops.occupancy import (
        OccupancyGridSpec,
        init_grid,
        occupancy_sample,
    )
    from nerfjax.train import TrainSettings

    cfg = with_defaults(ConfigNode({"scene_name": "s", "occ_segments": 64}))
    s = TrainSettings.from_cfg(cfg, total_steps=10)
    assert s.occ_segments == 64 and s.occ_spec().n_segments == 64
    dflt = with_defaults(ConfigNode({"scene_name": "s"}))
    assert TrainSettings.from_cfg(dflt, total_steps=10).occ_spec().n_segments == 128
    with pytest.raises(ValueError, match="occ_segments"):
        dataclasses.replace(s, occ_segments=0).occ_spec()

    # coarse-M sampling keeps the invariants and the concentration
    spec = OccupancyGridSpec(resolution=32, update_every=1, n_segments=32,
                             fast_cdf=True)
    grid = np.zeros(np.asarray(init_grid(spec)).shape, np.float32)
    # occupy only the z > 0 half-space (grid linearization x + y*r + z*r^2)
    grid.reshape(32, 32, 32)[16:, :, :] = 1.0
    rng = np.random.default_rng(1)
    B = 512
    o = np.zeros((B, 3), np.float32)
    o[:, 2] = -2.5  # rays marching +z cross the occupied half at t = 2.5
    d = np.zeros((B, 3), np.float32)
    d[:, 2] = 1.0
    z = np.asarray(
        occupancy_sample(
            spec, jnp.asarray(grid), jax.random.PRNGKey(0), jnp.asarray(o),
            jnp.asarray(d), jnp.full((B,), 1.5), jnp.full((B,), 3.5), 24,
        )
    )
    assert np.all(np.diff(z, axis=-1) >= 0)
    assert np.all(z >= 1.5 - 1e-5) and np.all(z <= 3.5 + 1e-5)
    # the occupied half (t >= 2.5) must hold the large majority of samples
    frac_occ = float(np.mean(z >= 2.5))
    assert frac_occ > 0.75, frac_occ
