"""Persistent XLA compilation cache.

TPU compiles are expensive (minutes through remote-compile setups); the
pipeline CLIs are separate processes, so without a persistent cache every
stage recompiles its programs. Enabled by all nerfjax entry points; override
the location with NERFJAX_CACHE_DIR, disable with NERFJAX_NO_CACHE=1.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_compilation_cache() -> None:
    global _enabled
    if _enabled or os.environ.get("NERFJAX_NO_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get(
        "NERFJAX_CACHE_DIR", str(Path.home() / ".cache" / "nerfjax" / "xla")
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception as e:  # older jax / readonly fs
        print(f"[nerfjax] compilation cache unavailable: {e}")
