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
