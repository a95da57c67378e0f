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

# Default: the round-5 adopted op point's checkpoint (sc sampler; the
# old round-3 spass12Led2 run dir no longer exists). Override with
# --ckpt/--extra-dense when the tuned op point moves (e.g. the ed1
# combo's checkpoint has only 1 promoted dense level).
CKPT = (
    HERE / "out" / "parity" / "sphere_s0_spass12Led2k1f1sc_large_b8192"
    / "checkpoints" / "nerf_final.pth"
)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=str(CKPT))
    ap.add_argument("--levels", type=int, default=12)
    ap.add_argument("--extra-dense", type=int, default=2)
    ap.add_argument("--out-tag", default="")
    args = ap.parse_args()

    from nerfjax.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.extract import extract_volume

    ckpt = Path(args.ckpt)
    assert ckpt.exists(), ckpt
    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "tuned_extract",
                "ngp": True,
                "nerf_type": "large",
                "hash_n_levels": args.levels,
                "hash_extra_dense_levels": args.extra_dense,
                "single_pass": True,
                "occupancy_grid": True,
                "hash_grad_corners": 2,
                "checkpoint": str(ckpt),
                "volume_resolution": 512,
            }
        )
    )
    import numpy as np

    # Arms (round-5 verdict #5, extraction headroom below 60 s):
    #   r4-full:   the round-4 configuration (full rgb+sigma coarse pass)
    #   dens:      density-only fused coarse pass (sigma bit-identical ->
    #              marks/threshold/occupancy identical; unmarked-cell RGB
    #              zeroed, which the sparse fetch zeroes anyway)
    #   dens-ss1:  + coarse pass at cell centers (8x fewer coarse queries);
    #              equality vs dens is MEASURED here, not assumed
    # Each arm runs cold then warm (remote compiles 2-4 min, cached after).
    arms = [
        ("r4-full", dict(coarse_density_only=False, coarse_supersample=2)),
        ("dens", dict(coarse_density_only=True, coarse_supersample=2)),
        ("dens-ss1", dict(coarse_density_only=True, coarse_supersample=1)),
    ]
    results = []
    vols = {}
    for name, kw in arms:
        for run in ("cold", "warm"):
            t0 = time.perf_counter()
            vol = extract_volume(cfg, verbose=False, **kw)
            dt = time.perf_counter() - t0
            occ = vol["occupancy_volume"]
            meta = vol["metadata"]
            row = {
                "arm": name,
                "run": run,
                "wall_s": round(dt, 1),
                "query_s": round(float(meta.get("query_seconds", -1)), 1),
                "transfer_s": round(float(meta.get("transfer_seconds", -1)), 1),
                "occupied_ratio": round(float(occ.mean()), 4),
                "marked_cells": int(meta.get("marked_cells", -1)),
                "sparse_fetch": bool(meta.get("sparse_fetch", False)),
            }
            print(json.dumps(row), flush=True)
            results.append(row)
        vols[name] = vol

    # equality gates on the REAL checkpoint
    eq = {}
    base = vols["r4-full"]
    for name in ("dens", "dens-ss1"):
        v = vols[name]
        eq[name] = {
            "occupancy_equal": bool(
                np.array_equal(v["occupancy_volume"], base["occupancy_volume"])
            ),
            "rgb_equal": bool(np.array_equal(v["rgb_volume"], base["rgb_volume"])),
            "threshold_equal": v["metadata"]["threshold"]
            == base["metadata"]["threshold"],
            "occupancy_agree": float(
                (v["occupancy_volume"] == base["occupancy_volume"]).mean()
            ),
        }
        print(json.dumps({name: eq[name]}), flush=True)

    out = HERE / "out" / f"extract_tuned{args.out_tag}.json"
    out.write_text(json.dumps({"rows": results, "equality": eq}, indent=2) + "\n")


if __name__ == "__main__":
    main()
