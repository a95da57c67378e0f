"""CLI: re-center a COLMAP model in place (reference: scripts/transform_colmap.py)."""

from pathlib import Path

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.colmap.transform import recenter_colmap_model


def main() -> None:
    p = cfg_parser("Re-center COLMAP model at percentile centroid")
    p.add_argument("--no_rotate", action="store_true",
                   help="skip aligning +Z with the mean camera view direction")
    args = p.parse_args()
    cfg = load_cfg(args)
    workdir = Path(cfg.get("colmap_dir", f"data/{cfg.scene_name}")) / "colmap_text"
    recenter_colmap_model(workdir, rotate_to_mean_view=not args.no_rotate)


if __name__ == "__main__":
    main()
