"""CLI: COLMAP text model -> transforms_<scene>.json.

Default mode "auto" is the reference's canonical corrected pipeline
(scripts/colmap2nerf_corrected.py, wired into the GUI launcher); mode
"euler" reproduces the normalize_with_aabb variant (config Euler rotations
+ near/far bounds).
"""

from pathlib import Path

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.colmap import colmap_to_nerf, write_transforms_json


def main() -> None:
    p = cfg_parser("Convert COLMAP model to NeRF transforms JSON")
    p.add_argument("--mode", default="auto", choices=["auto", "auto+z", "euler"])
    args = p.parse_args()
    cfg = load_cfg(args)

    result = colmap_to_nerf(cfg, mode=args.mode)
    out = Path(f"transforms_{cfg.scene_name}.json")
    write_transforms_json(result["transform"], out)

    v = result["validation"]
    if v.get("passed", True):
        print("All validations PASSED")
    else:
        print("Some validations FAILED - review the transformations!")

    if cfg.get("visualize", False):
        try:
            from nerfjax.gui.viewers import display_scene

            display_scene(result["points"], result["rgbs"],
                          result["transform"]["frames"],
                          result["transform"]["scene_aabb"])
        except Exception as e:  # viz deps optional
            print(f"[visualize] skipped: {e}")


if __name__ == "__main__":
    main()
