"""Legacy-extractor CLI extras: --suggest-bounds, --format npy, --density-only."""

import json
import sys

import numpy as np
import pytest

from nerfjax.config import save_config


def _run_cli(module, monkeypatch, argv):
    import importlib

    mod = importlib.import_module(module)
    monkeypatch.setattr(sys, "argv", [module] + argv)
    mod.main()


@pytest.fixture()
def mini_cfg(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # minimal transforms with camera poses only (for --suggest-bounds)
    meta = {
        "h": 8, "w": 8, "K": [[8, 0, 4], [0, 8, 4], [0, 0, 1]],
        "frames": [
            {"file_path": "x", "transform_matrix": np.eye(4).tolist()},
            {
                "file_path": "y",
                "transform_matrix": (np.eye(4) + np.diag([0, 0, 0, 0])).tolist(),
            },
        ],
    }
    meta["frames"][1]["transform_matrix"][2][3] = 2.5
    tj = tmp_path / "transforms_m.json"
    tj.write_text(json.dumps(meta))
    cfg = {
        "scene_name": "m",
        "output_dir": str(tmp_path / "out"),
        "checkpoint_dir": str(tmp_path / "out/ckpt"),
        "transforms_json": str(tj),
        "volume_output_path": str(tmp_path / "out/volume.pth"),
        "volume_resolution": 16,
        "ngp": True,
        "nerf_type": "small",
    }
    p = tmp_path / "cfg.yml"
    save_config(cfg, p)
    return tmp_path, str(p)


def test_suggest_bounds(mini_cfg, monkeypatch, capsys):
    tmp_path, cfg_path = mini_cfg
    _run_cli(
        "nerfjax.cli.extract_vol", monkeypatch,
        ["--cfg_path", cfg_path, "--suggest-bounds"],
    )
    out = capsys.readouterr().out
    assert "Suggested bounds" in out
    assert "--bounds" in out


def test_npy_density_only(mini_cfg, monkeypatch):
    import jax

    from nerfjax import checkpoint as ckpt
    from nerfjax.config import ConfigNode, load_config, with_defaults
    from nerfjax.train import TrainSettings, init_params, make_optimizer

    tmp_path, cfg_path = mini_cfg
    cfg = with_defaults(load_config(cfg_path))
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(TrainSettings(total_steps=10))
    ckpt.save_train_state(
        tmp_path / "out/ckpt/nerf_final.pth", cfg, params, tx.init(params), 1
    )

    _run_cli(
        "nerfjax.cli.extract_vol", monkeypatch,
        ["--cfg_path", cfg_path, "--format", "npy", "--density-only", "--exact"],
    )
    occ = np.load(tmp_path / "out/volume_occupancy.npy")
    assert occ.shape == (16, 16, 16)
    meta = json.loads((tmp_path / "out/volume_metadata.json").read_text())
    assert meta["density_only"] is True
    assert not (tmp_path / "out/volume_rgb.npy").exists()
