"""The shipped scene configs must load, resolve, and drive build_fields."""

from pathlib import Path

import pytest

from nerfjax.config import load_config, with_defaults
from nerfjax.train import TrainSettings, build_fields

pytestmark = pytest.mark.slow

CFG_DIR = Path(__file__).parent.parent / "cfg"


@pytest.mark.parametrize(
    "name", ["base_cfg.yml", "blender_scene.yml", "real_scene.yml", "grass_scene.yml"]
)
def test_cfg_loads_and_resolves(name):
    cfg = with_defaults(load_config(CFG_DIR / name))
    assert cfg.output_dir.startswith("./outputs/")
    assert cfg.checkpoint.endswith("nerf_final.pth")
    assert cfg.N_samples == 64 and cfg.N_importance == 128
    fc, ff, shared = build_fields(cfg)
    assert shared  # all shipped configs are NGP
    s = TrainSettings.from_cfg(cfg, total_steps=100)
    assert s.n_samples == 64


def test_blender_operating_point():
    cfg = with_defaults(load_config(CFG_DIR / "blender_scene.yml"))
    assert cfg.batch_size == 8192
    assert cfg.num_epochs == 5
    assert cfg.lr == 0.0005
    assert cfg.nerf_type == "large"
    assert cfg.rot_order == [1, 0, 2]
    assert cfg.angles == [-3, 12, 0]


def test_real_grass_operating_points():
    real = with_defaults(load_config(CFG_DIR / "real_scene.yml"))
    assert real.batch_size == 4096 and real.num_epochs == 2 and real.lr == 0.001
    grass = with_defaults(load_config(CFG_DIR / "grass_scene.yml"))
    assert grass.batch_size == 4096 and grass.num_epochs == 1 and grass.lr == 0.0005


def test_tuned_operating_point_pins_adopted_knobs():
    """cfg/blender_scene_tuned.yml IS the adopted round-5d op point
    (spass12Led1k1f1scns24gl2 — benchmarks/r5d_decision.py ADOPT verdict);
    any drift of these knobs silently changes the bench headline and the
    PSNR evidence trail, so pin them."""
    cfg = with_defaults(load_config(CFG_DIR / "blender_scene_tuned.yml"))
    assert cfg.batch_size == 8192 and cfg.nerf_type == "large"
    assert cfg.N_samples == 8 and cfg.N_importance == 16  # ns24
    assert cfg.hash_n_levels == 12
    assert cfg.hash_extra_dense_levels == 1  # ed1 (res-122 promotion dropped)
    assert cfg.hash_grad_corners == 1 and cfg.hash_fwd_corners == 1
    assert cfg.hash_grad_levels == 2  # gl2 (r5d_decision.py ADOPT verdict)
    assert cfg.single_pass and cfg.occupancy_grid
    assert cfg.occ_fast_cdf and cfg.occ_update_partitions == 4
    assert cfg.occ_segments == 32  # sg32 (r5g_decision.py ADOPT verdict)

    s = TrainSettings.from_cfg(cfg, total_steps=100)
    assert s.n_samples == 8 and s.n_importance == 16
    assert s.single_pass and s.occ_fast_cdf and s.occ_update_partitions == 4
    assert s.occ_segments == 32
