"""End-to-end pipeline through the CLI entry points, reference order
(final_gui.py:484-519): colmap2nerf(json fixture) -> precompute_rays ->
train -> extract_vol -> post_process_vol -> write_format."""

import json
import sys

import numpy as np
import pytest

from nerfjax.config import save_config
from tests.synthetic import make_image_scene

pytestmark = pytest.mark.slow


def _run_cli(module, monkeypatch, argv):
    import importlib

    mod = importlib.import_module(module)
    monkeypatch.setattr(sys, "argv", [module] + argv)
    mod.main()


@pytest.fixture()
def scene(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    scene_name = "mini"
    make_image_scene(tmp_path / "imgs", scene_name, n_frames=3, H=24, W=24)
    # move transforms to cwd under the canonical name
    (tmp_path / "imgs" / f"transforms_{scene_name}.json").rename(
        tmp_path / f"transforms_{scene_name}.json"
    )
    cfg = {
        "scene_name": scene_name,
        "output_dir": str(tmp_path / "outputs" / scene_name),
        "checkpoint_dir": str(tmp_path / "outputs" / scene_name / "checkpoints"),
        "transforms_json": str(tmp_path / f"transforms_{scene_name}.json"),
        "rays_file": str(tmp_path / f"{scene_name}_ray_data.npz"),
        "volume_resolution": 16,
        "batch_size": 128,
        "num_epochs": 2,
        "lr": 0.005,
        "ngp": True,
        "nerf_type": "small",
        "N_samples": 8,
        "N_importance": 8,
        "white_bg": False,
        "chunk_size": 32768,
        "use_memmap": False,
        "aabb_slice": True,
        "precision": "fp32",
        "occ_resolution": 16,
        "occ_update_every": 4,
    }
    cfg_path = tmp_path / "cfg.yml"
    save_config(cfg, cfg_path)
    return tmp_path, scene_name, str(cfg_path)


def test_full_pipeline(scene, monkeypatch):
    tmp_path, name, cfg_path = scene

    _run_cli("nerfjax.cli.precompute_rays", monkeypatch, ["--cfg_path", cfg_path])
    npz = tmp_path / f"{name}_ray_data.npz"
    assert npz.exists()
    data = np.load(npz)
    assert set(data.files) == {"rays_o", "rays_d", "rgbs", "t_near", "t_far"}
    assert len(data["rays_o"]) > 200

    _run_cli("nerfjax.cli.train", monkeypatch, ["--cfg_path", cfg_path])
    final = tmp_path / "outputs" / name / "checkpoints" / "nerf_final.pth"
    assert final.exists()

    _run_cli(
        "nerfjax.cli.render",
        monkeypatch,
        ["--cfg_path", cfg_path, "--frame", "0", "--orbit", "2", "--samples", "8",
         "--importance", "8"],
    )
    renders = tmp_path / "outputs" / name / "renders"
    from PIL import Image

    for fname in ("frame_0000.png", "orbit_0000.png", "orbit_0001.png"):
        assert (renders / fname).exists()
        assert Image.open(renders / fname).size == (24, 24)

    _run_cli("nerfjax.cli.extract_vol", monkeypatch, ["--cfg_path", cfg_path])
    vol_path = tmp_path / "outputs" / name / "volume.pth"
    assert vol_path.exists()

    _run_cli("nerfjax.cli.post_process_vol", monkeypatch, ["--cfg_path", cfg_path])
    sliced = tmp_path / "outputs" / name / "volume_sliced.pth"
    assert sliced.exists()

    _run_cli(
        "nerfjax.cli.write_format", monkeypatch, ["--cfg_path", cfg_path, "--grid_size", "16"]
    )
    out_dir = tmp_path / "outputs" / name
    assert (out_dir / "napari" / "volume_sliced_binary.tif").exists()
    assert (out_dir / "paraview" / "volume_sliced_rgb.tiff").exists()
    assert (out_dir / "vti" / "volume_sliced_binary.vti").exists()

    # TensorBoard event files exist (observability contract)
    logs = list((out_dir / "logs").glob("events.out.tfevents*"))
    assert logs, "no tensorboard event files written"


def test_resize_images_cli(tmp_path, monkeypatch):
    from PIL import Image

    monkeypatch.chdir(tmp_path)
    img_dir = tmp_path / "raw"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(
            (np.random.default_rng(i).uniform(0, 255, (64, 48, 3))).astype(np.uint8)
        ).save(img_dir / f"im{i}.png")

    cfg = {
        "scene_name": "s",
        "workspace": str(tmp_path / "ws"),
        "image_dir": str(img_dir),
        "tmp_image_dir": str(tmp_path / "resized"),
        "resize_images": True,
        "newSize": [32, 24],
    }
    cfg_path = tmp_path / "c.yml"
    save_config(cfg, cfg_path)
    _run_cli("nerfjax.cli.resize_images", monkeypatch, ["--cfg_path", str(cfg_path)])
    outs = sorted((tmp_path / "resized").iterdir())
    assert len(outs) == 3
    assert Image.open(outs[0]).size == (32, 24)
