import textwrap

from nerfjax.config import ConfigNode, load_config, save_config, with_defaults


def test_interpolation_basic(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(
        textwrap.dedent(
            """
            scene_name: "blender_scene"
            output_dir: "./outputs/${scene_name}"
            checkpoint_dir: "${output_dir}/checkpoints"
            transforms_json: "transforms_${scene_name}.json"
            rays_file: "${scene_name}_ray_data.npz"
            batch_size: 8192
            percentile_bbox:
              lower: 1.0
              upper: 99.0
              padding: 0.05
            """
        )
    )
    cfg = load_config(p)
    assert cfg.scene_name == "blender_scene"
    assert cfg.output_dir == "./outputs/blender_scene"
    assert cfg.checkpoint_dir == "./outputs/blender_scene/checkpoints"
    assert cfg.transforms_json == "transforms_blender_scene.json"
    assert cfg.rays_file == "blender_scene_ray_data.npz"
    assert cfg.batch_size == 8192
    assert cfg.percentile_bbox.lower == 1.0
    assert cfg.get("missing", 42) == 42
    assert "batch_size" in cfg


def test_full_string_ref_keeps_type():
    cfg = ConfigNode({"a": 5, "b": "${a}", "c": "x${a}y"})
    assert cfg.b == 5
    assert cfg.c == "x5y"


def test_defaults_overlay():
    cfg = with_defaults(ConfigNode({"scene_name": "s1", "batch_size": 1024}))
    assert cfg.batch_size == 1024
    assert cfg.N_samples == 64
    assert cfg.N_importance == 128
    assert cfg.output_dir == "./outputs/s1"
    assert cfg.chunk_size == 32768


def test_roundtrip(tmp_path):
    cfg = ConfigNode({"scene_name": "s", "out": "${scene_name}/x", "n": 3})
    save_config(cfg, tmp_path / "o.yml")
    cfg2 = load_config(tmp_path / "o.yml")
    assert cfg2.out == "s/x"
    assert cfg2.n == 3


def test_reference_cfg_schema_loads(tmp_path):
    # The actual base schema shipped by the reference must parse and resolve.
    cfg = with_defaults(ConfigNode({"scene_name": "name_of_your_scene"}))
    assert cfg.checkpoint.endswith("nerf_final.pth")
    assert cfg.volume_output_path == "./outputs/name_of_your_scene/volume.pth"
    assert cfg.aabb_adjust.aabb_min == [0, 0, 0]
