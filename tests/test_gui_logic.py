import sys

import numpy as np

from nerfjax import pth
from nerfjax.config import ConfigNode
from nerfjax.gui.logic import (
    PIPELINE_STEPS,
    build_pipeline_commands,
    clip_aabb_band,
    generate_config_dict,
    load_volume_any,
    slice_z,
)


def test_generate_config_dict_schema_roundtrip(tmp_path):
    """The GUI-generated config must contain the full reference schema and
    survive a YAML round trip with working interpolation."""
    from nerfjax.config import load_config, save_config

    cfg_dict = generate_config_dict({"scene_name": "plot7", "batch_size": 8192})
    for key in (
        "scene_name", "output_dir", "checkpoint_dir", "transforms_json",
        "rays_file", "volume_resolution", "workspace", "image_dir",
        "image_dir_resize", "tmp_image_dir", "resize_images", "newSize",
        "rotation", "rot_order", "angles", "shift", "scale",
        "target_retention", "outlier_nb_neighbors", "outlier_std_ratio",
        "percentile_bbox", "aabb_adjust", "checkpoint", "volume_output_path",
        "aabb_slice", "sliced_vol_path", "colmap_dir", "batch_size",
        "num_epochs", "lr", "ngp", "nerf_type", "hidden_dim", "pos_L",
        "dir_L", "N_samples", "N_importance", "white_bg", "chunk_size",
        "use_memmap", "remove_below_aabb", "remove_upper_aabb",
    ):
        assert key in cfg_dict, key

    p = tmp_path / "plot7.yml"
    save_config(cfg_dict, p)
    cfg = load_config(p)
    assert cfg.output_dir == "./outputs/plot7"
    assert cfg.checkpoint == "./outputs/plot7/checkpoints/nerf_final.pth"
    assert cfg.batch_size == 8192
    assert cfg.percentile_bbox.upper == 99.0


def test_build_pipeline_commands():
    sel = [False] * len(PIPELINE_STEPS)
    sel[4] = True  # precompute
    sel[5] = True  # train
    cmds = build_pipeline_commands("cfg/x.yml", sel)
    assert len(cmds) == 2
    assert cmds[0][:3] == [sys.executable, "-m", "nerfjax.cli.precompute_rays"]
    assert cmds[1][2] == "nerfjax.cli.train"
    assert cmds[0][-2:] == ["--cfg_path", "cfg/x.yml"]


def test_load_volume_any_both_formats(tmp_path):
    # dense format
    occ = np.zeros((5, 5, 5), np.uint8)
    occ[2, 2, 2] = 1
    rgbv = np.zeros((5, 5, 5, 3), np.uint8)
    rgbv[2, 2, 2] = [255, 0, 0]
    p1 = tmp_path / "volume.pth"
    pth.save({"occupancy_volume": occ, "rgb_volume": rgbv, "metadata": {}}, p1)
    pts, rgbs, aabb = load_volume_any(p1)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0], [0, 0, 0], atol=1e-6)
    assert aabb is None

    # sliced format
    p2 = tmp_path / "volume_sliced.pth"
    pth.save(
        {
            "points_normalized": np.array([[0.5, 0, 0]], np.float32),
            "rgbs": np.array([[1.0, 0.5, 0.0]], np.float32),
            "aabb_meta": {"aabb_remove_below": -0.5, "aabb_remove_above": 0.5},
        },
        p2,
    )
    pts2, rgbs2, aabb2 = load_volume_any(p2)
    assert pts2.shape == (1, 3)
    assert aabb2["aabb_remove_below"] == -0.5


def test_slice_and_clip():
    pts = np.array([[0, 0, -0.9], [0, 0, 0.0], [0, 0, 0.9]], np.float32)
    rgbs = np.eye(3, dtype=np.float32)
    s, c = slice_z(pts, rgbs, -0.5, 0.5)
    assert len(s) == 1
    s2, _ = clip_aabb_band(pts, rgbs, {"aabb_remove_below": -1.0, "aabb_remove_above": 0.1})
    assert len(s2) == 2


def test_gui_classes_construct_headless():
    """GUI modules must import cleanly; widget construction is exercised only
    when a display is available."""
    import importlib
    import os

    fg = importlib.import_module("nerfjax.gui.final_gui")
    rg = importlib.import_module("nerfjax.gui.run_gui")
    assert hasattr(fg, "FinalGui") and hasattr(fg, "main")
    assert hasattr(rg, "PointCloudMinimalGui") and hasattr(rg, "main")
    if os.environ.get("DISPLAY"):
        gui = fg.FinalGui()
        assert len(gui.step_vars) == len(PIPELINE_STEPS)
        gui.root.destroy()
