"""CLI: resize/copy scene images (reference: scripts/resize_images.py)."""

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.utils.images import prepare_images


def main() -> None:
    args = cfg_parser("Resize or copy scene images").parse_args()
    prepare_images(load_cfg(args))


if __name__ == "__main__":
    main()
