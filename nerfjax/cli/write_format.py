"""CLI: export sliced volume to tif/tiff/vti (reference: scripts/write_format.py)."""

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.postprocess import write_formats


def main() -> None:
    p = cfg_parser("Export volume data to tiff/vti formats")
    p.add_argument("--grid_size", type=int, default=512)
    p.add_argument("--visualize", choices=["binary", "rgb", "both"], default=None)
    args = p.parse_args()
    cfg = load_cfg(args)
    write_formats(cfg, grid_size=args.grid_size)
    if args.visualize:
        print("[visualize] napari not bundled in this environment; "
              "open the written .tif files in napari to inspect")


if __name__ == "__main__":
    main()
