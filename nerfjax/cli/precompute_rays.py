"""CLI: transforms JSON -> <scene>_ray_data.npz (reference: scripts/precompute_rays.py)."""

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.rays import precompute_rays_for_scene, save_ray_data


def main() -> None:
    args = cfg_parser("Precompute cube-intersecting rays for all frames").parse_args()
    cfg = load_cfg(args)
    transforms = f"transforms_{cfg.scene_name}.json"
    data = precompute_rays_for_scene(transforms)
    n = len(data["rays_o"])
    print(f"{n} rays with origins and directions.")
    filename = f"{cfg.scene_name}_ray_data.npz"
    save_ray_data(data, filename)
    print(f"Saved rays data to {filename}.")


if __name__ == "__main__":
    main()
