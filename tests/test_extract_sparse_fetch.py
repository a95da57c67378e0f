"""Sparse (occupied-voxel-compacted) host fetch must reproduce the dense
fetch exactly where it matters: occupancy everywhere, RGB at occupied voxels.

The sparse path replaces the dense 4*R^3-byte device->host transfer with the
occupancy bit-packed (R^3/8 bytes) plus RGB gathered at occupied voxels only
(~7x less traffic at a 10%-occupied scene through the slow tunnel link).
Unoccupied voxels' RGB becomes zeros; nothing downstream reads it
(reference: scripts/post_process_vol.py:74-94 indexes RGB by occupancy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfjax.config import ConfigNode, with_defaults
from nerfjax.extract import _fetch_volumes, extract_volume


def test_fetch_volumes_sparse_matches_dense():
    # res >= 32 so the padded gather (K floor 4096) beats the dense fetch
    # and the sparse branch actually engages (smaller volumes fall back)
    rng = np.random.default_rng(0)
    res = 32
    occ = (rng.uniform(size=(res, res, res)) < 0.1).astype(np.uint8)
    rgb = rng.integers(0, 256, size=(res, res, res, 3), dtype=np.uint8)

    occ_dev, rgb_dev = jnp.asarray(occ), jnp.asarray(rgb)
    d_occ, d_rgb, _, d_used, d_max = _fetch_volumes(occ_dev, rgb_dev, res, sparse=False)
    s_occ, s_rgb, _, s_used, s_max = _fetch_volumes(occ_dev, rgb_dev, res, sparse=True)

    assert d_used is False and s_used is True
    # normalizer preserved: the pre-compaction global max rides metadata even
    # when the brightest voxel is unoccupied and its RGB came back as zeros
    assert d_max == s_max == float(rgb.max())
    np.testing.assert_array_equal(d_occ, occ)
    np.testing.assert_array_equal(s_occ, occ)
    np.testing.assert_array_equal(d_rgb, rgb)
    mask = occ.astype(bool)
    np.testing.assert_array_equal(s_rgb[mask], rgb[mask])
    assert (s_rgb[~mask] == 0).all()


def test_fetch_volumes_dense_fallback_when_mostly_occupied():
    """>~57% occupancy would move more bytes sparse than dense — the helper
    must fall back to the dense fetch (full RGB preserved everywhere)."""
    rng = np.random.default_rng(1)
    res = 8
    occ = np.ones((res, res, res), np.uint8)
    rgb = rng.integers(0, 256, size=(res, res, res, 3), dtype=np.uint8)
    s_occ, s_rgb, _, s_used, _ = _fetch_volumes(
        jnp.asarray(occ), jnp.asarray(rgb), res, sparse=True
    )
    assert s_used is False  # fell back
    np.testing.assert_array_equal(s_occ, occ)
    np.testing.assert_array_equal(s_rgb, rgb)  # dense fallback keeps all RGB


def test_fetch_volumes_empty_occupancy():
    res = 32
    occ = np.zeros((res, res, res), np.uint8)
    rgb = np.full((res, res, res, 3), 7, np.uint8)
    s_occ, s_rgb, _, s_used, s_max = _fetch_volumes(
        jnp.asarray(occ), jnp.asarray(rgb), res, sparse=True
    )
    assert s_used is True
    assert s_max == 7.0  # global max survives even with zero occupancy
    assert s_occ.sum() == 0
    assert (s_rgb == 0).all()


@pytest.mark.slow
def test_extract_volume_sparse_vs_dense_fetch(tmp_path):
    """End-to-end: hierarchical extraction with and without sparse fetch
    agrees on occupancy and on RGB at occupied voxels."""
    from nerfjax.train import init_params

    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "sf",
                "output_dir": str(tmp_path / "out"),
                "ngp": True,
                "nerf_type": "small",
            }
        )
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["model"]["table"] = params["model"]["table"] * 2000.0

    res = 32
    # pin the coarse mark (default ss now follows sparse_fetch — round-5c
    # adoption) so this test compares ONLY the fetch paths
    dense = extract_volume(
        cfg, params=params, resolution=res, hierarchical=True, verbose=False,
        sparse_fetch=False, coarse_supersample=2,
    )
    sparse = extract_volume(
        cfg, params=params, resolution=res, hierarchical=True, verbose=False,
        sparse_fetch=True, coarse_supersample=2,
    )
    np.testing.assert_array_equal(
        dense["occupancy_volume"], sparse["occupancy_volume"]
    )
    mask = dense["occupancy_volume"].astype(bool)
    np.testing.assert_array_equal(
        dense["rgb_volume"][mask], sparse["rgb_volume"][mask]
    )
    # metadata records whether the sparse fetch actually ran (requesting it
    # on a small/mostly-occupied volume falls back to dense and says so)
    assert isinstance(sparse["metadata"]["sparse_fetch"], bool)
    assert dense["metadata"]["sparse_fetch"] is False
