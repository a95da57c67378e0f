"""CLI: transforms JSON -> <scene>_ray_data.npz (reference: scripts/precompute_rays.py)."""

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.rays import precompute_rays_for_scene, save_ray_data


def main() -> None:
    args = cfg_parser("Precompute cube-intersecting rays for all frames").parse_args()
    cfg = load_cfg(args)
    # cfg.transforms_json / cfg.rays_file default to exactly the reference's
    # cwd-relative names (precompute_rays.py:195, base_cfg.yml), so honoring
    # them is a compatible superset that also supports absolute paths.
    transforms = cfg.get("transforms_json", f"transforms_{cfg.scene_name}.json")
    data = precompute_rays_for_scene(transforms)
    n = len(data["rays_o"])
    print(f"{n} rays with origins and directions.")
    filename = cfg.get("rays_file", f"{cfg.scene_name}_ray_data.npz")
    save_ray_data(data, filename)
    print(f"Saved rays data to {filename}.")


if __name__ == "__main__":
    main()
