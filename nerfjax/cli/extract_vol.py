"""CLI: extract the colored occupancy volume (reference: scripts/extract_vol.py,
flags per extract_vol.py:209-261)."""

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.extract import extract_volume, save_volume


def main() -> None:
    p = cfg_parser("Extract binary occupancy volume from trained NeRF")
    p.add_argument("--resolution", "-r", type=int, default=None,
                   help="grid resolution (default: cfg.volume_resolution)")
    p.add_argument("--bounds", nargs=2, type=float, default=[-1.0, 1.0])
    p.add_argument("--batch-size", "-b", type=int, default=8192,
                   help="accepted for reference-CLI parity; the jitted slab "
                        "query supersedes host-side batching")
    p.add_argument("--view-direction", nargs=3, type=float, default=[0.0, 0.0, -1.0])
    p.add_argument("--exact", action="store_true",
                   help="exhaustive grid sweep instead of hierarchical refine")
    args = p.parse_args()
    if args.resolution is not None and args.resolution <= 0:
        raise ValueError("Resolution must be positive")
    if args.bounds[0] >= args.bounds[1]:
        raise ValueError("Invalid bounds: min must be less than max")
    cfg = load_cfg(args)

    vol = extract_volume(
        cfg,
        resolution=args.resolution,
        bounds=tuple(args.bounds),
        view_direction=tuple(args.view_direction),
        hierarchical=False if args.exact else None,
    )
    save_volume(vol, cfg.volume_output_path)
    print("EXTRACTION COMPLETED SUCCESSFULLY!")


if __name__ == "__main__":
    main()
