from __future__ import annotations

import argparse

from nerfjax.config import ConfigNode, load_config, with_defaults
from nerfjax.utils.cache import enable_compilation_cache

enable_compilation_cache()


def cfg_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cfg_path", type=str, required=True)
    return p


def load_cfg(args) -> ConfigNode:
    return with_defaults(load_config(args.cfg_path))
