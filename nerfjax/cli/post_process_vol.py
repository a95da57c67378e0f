"""CLI: AABB-slice the occupancy volume (reference: scripts/post_process_vol.py)."""

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.postprocess import post_process


def main() -> None:
    p = cfg_parser("Slice occupancy volume by scene AABB")
    p.add_argument("--visualize", type=str, default=None, choices=["raw", "sliced"])
    args = p.parse_args()
    cfg = load_cfg(args)
    result = post_process(cfg)

    if args.visualize:
        try:
            from nerfjax.gui.viewers import display_pointcloud

            display_pointcloud(result["points"], result["rgbs"])
        except Exception as e:
            print(f"[visualize] skipped: {e}")


if __name__ == "__main__":
    main()
