"""Hierarchical extraction must reproduce the exhaustive sweep's occupancy."""

import pytest
import jax
import numpy as np

from nerfjax.config import ConfigNode, with_defaults
from nerfjax.extract import extract_volume


def _cfg(tmp_path):
    return with_defaults(
        ConfigNode(
            {
                "scene_name": "h",
                "output_dir": str(tmp_path / "out"),
                "ngp": True,
                "nerf_type": "small",
            }
        )
    )


@pytest.mark.slow
def test_hierarchical_matches_exact(tmp_path):
    from nerfjax.train import init_params

    cfg = _cfg(tmp_path)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["model"]["table"] = params["model"]["table"] * 2000.0

    res = 32
    exact = extract_volume(
        cfg, params=params, resolution=res, hierarchical=False, verbose=False
    )
    hier = extract_volume(
        cfg, params=params, resolution=res, hierarchical=True, verbose=False
    )
    occ_e = exact["occupancy_volume"]
    occ_h = hier["occupancy_volume"]

    # occupancy nearly identical (coarse-filled empty voxels are below
    # threshold; marked blocks get the exact fine values)
    agree = (occ_e == occ_h).mean()
    assert agree > 0.995, agree

    # occupied voxels carry the same RGB (fine pass values)
    both = (occ_e == 1) & (occ_h == 1)
    if both.any():
        diff = np.abs(
            exact["rgb_volume"][both].astype(int) - hier["rgb_volume"][both].astype(int)
        )
        assert diff.mean() < 4

    md = hier["metadata"]
    assert md["hierarchical"] is True
    assert md["marked_cells"] <= (res // 4) ** 3  # random field is dense everywhere
    assert md["resolution"] == res


def test_hierarchical_skips_empty_space(tmp_path):
    """With a sparse analytic field, most cells are skipped and occupancy is
    exactly the analytic ball."""
    import jax.numpy as jnp

    from nerfjax.extract import _extract_hierarchical
    from nerfjax.parallel import make_mesh

    class BallField:
        def apply_planar(self, params, pos3, view3, dtype=None, **kw):
            r2 = pos3[0] ** 2 + pos3[1] ** 2 + pos3[2] ** 2
            sigma = jnp.where(r2 < 0.3**2, 50.0, 0.0)
            rgb = jnp.stack([jnp.ones_like(sigma), sigma * 0, sigma * 0])
            return rgb, sigma

    cfg = _cfg(tmp_path)
    res = 64
    vol = _extract_hierarchical(
        cfg, BallField(), {}, res, (-1.0, 1.0), (0.0, 0.0, -1.0),
        make_mesh(), jnp.float32, verbose=False,
    )
    C = res // 4
    assert vol["metadata"]["marked_cells"] < 0.2 * C**3  # skipped most space
    # occupancy equals the analytic ball sampled on the grid
    g = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    expect = (X**2 + Y**2 + Z**2 < 0.3**2)
    agree = (vol["occupancy_volume"].astype(bool) == expect).mean()
    assert agree > 0.999, agree


def test_hierarchical_empty_scene_fast_path(tmp_path):
    """A zero-density field marks (almost) nothing and stays consistent."""
    from nerfjax.train import init_params

    cfg = _cfg(tmp_path)
    params = init_params(cfg, jax.random.PRNGKey(1))
    params["model"]["table"] = params["model"]["table"] * 0.0

    vol = extract_volume(
        cfg, params=params, resolution=32, hierarchical=True, verbose=False
    )
    assert vol["occupancy_volume"].sum() <= 32**3  # no crash, sane output
    assert vol["metadata"]["total_voxels"] == 32**3


@pytest.mark.slow
def test_sharded_extraction_matches_single_device():
    """Grid-DP extraction over the 8-virtual-device mesh must be bit-identical
    to the 1-device extraction (SURVEY §2 'volume extraction DP'; round-4
    verdict #4 — mirrors __graft_entry__.dryrun_multichip arm 5)."""
    from nerfjax.parallel import make_mesh
    from nerfjax.train import init_params

    devices = jax.devices()
    assert len(devices) >= 8, devices
    cfg = with_defaults(
        ConfigNode({"scene_name": "h8", "ngp": True, "nerf_type": "small"})
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["model"]["table"] = params["model"]["table"] * 2000.0

    kwargs = dict(
        params=params, resolution=32, hierarchical=True, sparse_fetch=True,
        verbose=False,
    )
    v8 = extract_volume(cfg, mesh=make_mesh(devices[:8]), **kwargs)
    v1 = extract_volume(cfg, mesh=make_mesh(devices[:1]), **kwargs)

    np.testing.assert_array_equal(v8["occupancy_volume"], v1["occupancy_volume"])
    np.testing.assert_array_equal(v8["rgb_volume"], v1["rgb_volume"])
    assert v8["metadata"]["threshold"] == v1["metadata"]["threshold"]
    assert v8["metadata"]["occupied_voxels"] == v1["metadata"]["occupied_voxels"]


@pytest.mark.slow
def test_coarse_density_only_identical_occupancy(tmp_path):
    """The density-only coarse mark pass must reproduce the full-head
    hierarchical extraction exactly on occupancy/threshold, and on RGB
    everywhere the sparse fetch reads (occupied voxels)."""
    from nerfjax.train import init_params

    cfg = _cfg(tmp_path)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["model"]["table"] = params["model"]["table"] * 2000.0

    kwargs = dict(params=params, resolution=32, hierarchical=True,
                  sparse_fetch=True, verbose=False)
    full = extract_volume(cfg, coarse_density_only=False, **kwargs)
    dens = extract_volume(cfg, coarse_density_only=True, **kwargs)

    np.testing.assert_array_equal(
        dens["occupancy_volume"], full["occupancy_volume"]
    )
    assert dens["metadata"]["threshold"] == full["metadata"]["threshold"]
    assert dens["metadata"]["marked_cells"] == full["metadata"]["marked_cells"]
    # sparse fetch zeroes unoccupied RGB in BOTH arms -> full volumes equal
    np.testing.assert_array_equal(dens["rgb_volume"], full["rgb_volume"])
    assert dens["metadata"]["coarse_density_only"] is True


@pytest.mark.slow
def test_coarse_supersample1_close_occupancy(tmp_path):
    """ss=1 (cell centers, 8x fewer coarse queries) is a measured-equality
    lever: on the smooth test field it must agree with ss=2 on nearly every
    voxel; exact equality is asserted on the REAL checkpoint by
    benchmarks/extract_tuned.py before any default change."""
    from nerfjax.train import init_params

    cfg = _cfg(tmp_path)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["model"]["table"] = params["model"]["table"] * 2000.0

    kwargs = dict(params=params, resolution=32, hierarchical=True,
                  sparse_fetch=True, verbose=False)
    ss2 = extract_volume(cfg, coarse_supersample=2, **kwargs)
    ss1 = extract_volume(cfg, coarse_supersample=1, **kwargs)
    agree = (ss1["occupancy_volume"] == ss2["occupancy_volume"]).mean()
    assert agree > 0.98, agree
    assert ss1["metadata"]["coarse_supersample"] == 1


def test_coarse_supersample_default_follows_sparse_fetch(tmp_path):
    """Round-5c adoption (benchmarks/r5_decision.py pre-registered rule):
    ss=1 is the default under the sparse fetch (measured bit-identical to
    ss=2 on two real checkpoints, -12/-13.5 s warm at 512^3); the dense
    fetch keeps the conservative 2^3 mark."""
    from nerfjax.train import init_params

    cfg = _cfg(tmp_path)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["model"]["table"] = params["model"]["table"] * 2000.0

    kwargs = dict(params=params, resolution=32, hierarchical=True,
                  verbose=False)
    sparse = extract_volume(cfg, sparse_fetch=True, **kwargs)
    dense = extract_volume(cfg, sparse_fetch=False, **kwargs)
    assert sparse["metadata"]["coarse_supersample"] == 1
    assert dense["metadata"]["coarse_supersample"] == 2


def test_fused_density_matches_fused_head_sigma():
    """fused_ngp_density must produce bit-identical sigma to fused_ngp_head
    (same two f32-accumulated dmlp matmuls) — interpret mode (no TPU)."""
    import jax.numpy as jnp

    from nerfjax.fields.ngp import InstantNGP
    from nerfjax.ops.pallas_mlp import fused_ngp_density, fused_ngp_head

    model = InstantNGP("small")
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(32, 300)).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(16, 300)).astype(np.float32))
    _, sigma_head = fused_ngp_head(params, enc, sh, interpret=True)
    sigma_dens = fused_ngp_density(params, enc, interpret=True)
    np.testing.assert_array_equal(np.asarray(sigma_dens), np.asarray(sigma_head))
