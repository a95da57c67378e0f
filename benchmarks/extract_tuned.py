"""512^3 extraction timing on the round-3 tuned checkpoint (NGP-large,
12 levels + 2 promoted dense levels) — shows the tuned model shape speeds
the extraction path too, against the round-2 16-level number (46.8 s warm,
docs/PERF.md). Writes benchmarks/out/extract_tuned.json."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parent))

CKPT = (
    HERE / "out" / "parity" / "sphere_s0_spass12Led2_large_b8192"
    / "checkpoints" / "nerf_final.pth"
)


def main() -> None:
    from nerfjax.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.extract import extract_volume

    assert CKPT.exists(), CKPT
    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "tuned_extract",
                "ngp": True,
                "nerf_type": "large",
                "hash_n_levels": 12,
                "hash_extra_dense_levels": 2,
                "single_pass": True,
                "occupancy_grid": True,
                "hash_grad_corners": 2,
                "checkpoint": str(CKPT),
                "volume_resolution": 512,
            }
        )
    )
    results = []
    for run in ("cold", "warm"):
        t0 = time.perf_counter()
        vol = extract_volume(cfg, verbose=False)
        dt = time.perf_counter() - t0
        occ = vol["occupancy_volume"]
        meta = vol["metadata"]
        row = {
            "run": run,
            "wall_s": round(dt, 1),
            "query_s": round(float(meta.get("query_seconds", -1)), 1),
            "transfer_s": round(float(meta.get("transfer_seconds", -1)), 1),
            "occupied_ratio": round(float(occ.mean()), 4),
            "sparse_fetch": bool(meta.get("sparse_fetch", False)),
        }
        print(json.dumps(row))
        results.append(row)
    out = HERE / "out" / "extract_tuned.json"
    out.write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
