import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfjax import pth
from nerfjax.config import ConfigNode, with_defaults
from nerfjax.extract import extract_volume, save_volume
from nerfjax.postprocess import (
    post_process,
    slice_aabb,
    volume_to_points,
    voxelize_points,
    write_formats,
)


def _cfg(tmp_path, **over):
    base = {
        "scene_name": "t",
        "output_dir": str(tmp_path / "out"),
        "checkpoint_dir": str(tmp_path / "out/ckpt"),
        "transforms_json": str(tmp_path / "transforms_t.json"),
        "volume_resolution": 32,
        "ngp": True,
        "nerf_type": "small",
        "volume_output_path": str(tmp_path / "out/volume.pth"),
        "sliced_vol_path": str(tmp_path / "out/volume_sliced.pth"),
        "aabb_slice": True,
    }
    base.update(over)
    return with_defaults(ConfigNode(base))


def test_extract_volume_roundtrip(tmp_path):
    """Extract a small volume from random params; verify contract + torch load."""
    from nerfjax.train import init_params

    cfg = _cfg(tmp_path)
    params = init_params(cfg, jax.random.PRNGKey(0))
    # scale up the table so the field has nontrivial structure
    params["model"]["table"] = params["model"]["table"] * 2000.0

    vol = extract_volume(cfg, params=params, resolution=32, verbose=False)
    occ = vol["occupancy_volume"]
    rgb = vol["rgb_volume"]
    assert occ.shape == (32, 32, 32)
    assert rgb.shape == (32, 32, 32, 3)
    assert occ.dtype == np.uint8 and rgb.dtype == np.uint8
    assert set(np.unique(occ)) <= {0, 1}
    md = vol["metadata"]
    assert md["resolution"] == 32
    assert md["total_voxels"] == 32**3
    assert 0 <= md["occupied_ratio"] <= 1

    save_volume(vol, cfg.volume_output_path)
    back = pth.load(cfg.volume_output_path)
    np.testing.assert_array_equal(back["occupancy_volume"], occ)
    assert back["metadata"]["threshold"] == pytest.approx(md["threshold"])

    torch = pytest.importorskip("torch")
    tobj = torch.load(cfg.volume_output_path, weights_only=False)
    assert tobj["occupancy_volume"].shape == (32, 32, 32)


def test_extract_matches_pointmajor_model(tmp_path):
    """The slab query must agree with the reference-style point-major eval
    on the same grid points (extract_vol.py grid convention: meshgrid ij)."""
    from nerfjax.fields.ngp import InstantNGP
    from nerfjax.train import init_params

    cfg = _cfg(tmp_path)
    params = init_params(cfg, jax.random.PRNGKey(1))
    params["model"]["table"] = params["model"]["table"] * 2000.0
    res = 8
    vol = extract_volume(cfg, params=params, resolution=res, verbose=False)

    model = InstantNGP("small")
    coords = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    view = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (len(pts), 1))
    rgb_pm, sigma_pm = model.apply(params["model"], jnp.asarray(pts), jnp.asarray(view))
    rgb_pm = np.asarray(rgb_pm).reshape(res, res, res, 3)
    occ_expected = (
        np.asarray(sigma_pm).reshape(res, res, res) > vol["metadata"]["threshold"]
    )
    # bf16 slab query vs fp32 point-major: identical occupancy except within
    # rounding of the threshold
    agree = (vol["occupancy_volume"] == occ_expected).mean()
    assert agree > 0.98
    assert np.abs(vol["rgb_volume"].astype(int) - (rgb_pm * 255).astype(int)).mean() < 8


def test_volume_to_points_and_slice():
    occ = np.zeros((9, 9, 9), np.uint8)
    occ[4, 4, 4] = 1  # center -> (0,0,0)
    occ[0, 0, 0] = 1  # corner -> (-1,-1,-1)
    rgbv = np.zeros((9, 9, 9, 3), np.uint8)
    rgbv[4, 4, 4] = [255, 128, 0]
    pts, rgbs = volume_to_points(occ, rgbv)
    assert pts.shape == (2, 3)
    np.testing.assert_allclose(pts[1], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(pts[0], [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(rgbs[1], [1.0, 128 / 255, 0], atol=1e-3)

    sliced_pts, sliced_rgbs = slice_aabb(
        pts, rgbs, {"aabb_min": [-0.5, -0.5, -0.5], "aabb_max": [0.5, 0.5, 0.5]}
    )
    assert sliced_pts.shape == (1, 3)
    np.testing.assert_allclose(sliced_pts[0], [0, 0, 0], atol=1e-6)


def test_voxelize_roundtrip():
    pts = np.array([[-1, -1, -1], [0, 0, 0], [1, 1, 1]], np.float32)
    rgbs = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    binary, rgb_vol = voxelize_points(pts, rgbs, grid_size=17)
    assert binary[0, 0, 0] == 255
    assert binary[8, 8, 8] == 255
    assert binary[16, 16, 16] == 255
    assert binary.sum() == 3 * 255
    np.testing.assert_array_equal(rgb_vol[8, 8, 8], [0, 255, 0])


def test_post_process_and_write_formats_end_to_end(tmp_path):
    """volume.pth -> sliced .pth -> tif/tiff/vti files, all readable."""
    import json

    from nerfjax.formats.tiff import read_tiff_volume
    from nerfjax.formats.vti import read_vti_volume

    cfg = _cfg(tmp_path)
    # synthetic volume.pth: occupied ball
    res = 16
    g = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    occ = ((X**2 + Y**2 + Z**2) < 0.6**2).astype(np.uint8)
    rgbv = np.zeros((res, res, res, 3), np.uint8)
    rgbv[occ > 0] = [200, 100, 50]
    pth.save(
        {"occupancy_volume": occ, "rgb_volume": rgbv, "metadata": {"resolution": res}},
        cfg.volume_output_path,
    )
    # transforms json with scene_aabb
    (tmp_path / "transforms_t.json").write_text(
        json.dumps(
            {"scene_aabb": {"aabb_min": [-0.9, -0.9, -0.5], "aabb_max": [0.9, 0.9, 0.9]}}
        )
    )

    result = post_process(cfg, verbose=False)
    assert (result["points"][:, 2] >= -0.5).all()  # sliced below z=-0.5
    assert (tmp_path / "out/volume_sliced.pth").exists()

    out = write_formats(cfg, grid_size=16, verbose=False)
    base = "volume_sliced"
    napari = tmp_path / "out/napari"
    paraview = tmp_path / "out/paraview"
    vti = tmp_path / "out/vti"
    for p in (
        napari / f"{base}_binary.tif",
        napari / f"{base}_rgb.tif",
        paraview / f"{base}_binary.tiff",
        paraview / f"{base}_rgb.tiff",
        vti / f"{base}_binary.vti",
        vti / f"{base}_rgb.vti",
    ):
        assert p.exists(), p

    binary = out["binary_volume"]
    tif = read_tiff_volume(napari / f"{base}_binary.tif")
    np.testing.assert_array_equal(tif, binary)
    tif_pv = read_tiff_volume(paraview / f"{base}_binary.tiff")
    np.testing.assert_array_equal(tif_pv, np.transpose(binary, (2, 1, 0)))

    v = read_vti_volume(vti / f"{base}_binary.vti")
    np.testing.assert_array_equal(v, np.transpose(binary, (2, 1, 0)))

    # PIL can open our multi-page tiffs (external reader sanity)
    from PIL import Image

    img = Image.open(napari / f"{base}_rgb.tif")
    img.seek(3)
    np.testing.assert_array_equal(np.asarray(img), out["rgb_volume"][3])
