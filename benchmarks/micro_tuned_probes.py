"""Round-3 continuation probes around the tuned op point (12L + ed2).

Measures the full train step (bench.py's protocol, same _measure) at:
  * ed2 (the shipped tuned headline) — control re-measurement
  * ed3 — also promote res-183 to dense (+12.3M params; removes a hash
    level's 8-corner gathers and its k=2 scatter, at the price of
    rebuilding a (182)^3 x 16 cell-row table per step)
  * ed2 at batch 16384 — does a bigger batch amortize fixed step overhead?
  * 10 levels + ed2 — drop res-923/1385 as well (both above the 512^3
    extraction Nyquist; PSNR unproven — throughput probe only)

Writes benchmarks/out/micro_tuned_probes.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parent))

import bench  # noqa: E402


def main() -> None:
    import jax

    from nerfjax.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from nerfjax.parallel import make_mesh

    mesh = make_mesh()
    base = {
        "scene_name": "probe",
        "ngp": True,
        "nerf_type": "large",
        "batch_size": bench.BATCH,
        "precision": "bf16",
        "lr": 5e-4,
        "N_samples": 16,
        "N_importance": 32,
        "occupancy_grid": True,
        "hash_grad_corners": 2,
        "single_pass": True,
        "hash_n_levels": 12,
        "hash_extra_dense_levels": 2,
    }

    rows = []

    def probe(name: str, cfg: dict, batch_override: int | None = None) -> None:
        saved = bench.BATCH
        if batch_override is not None:
            bench.BATCH = batch_override
            cfg = {**cfg, "batch_size": batch_override}
        try:
            v = bench._measure(jax, mesh, cfg, warmup=3, steps=20)
        finally:
            bench.BATCH = saved
        row = {"probe": name, "rays_per_sec_per_chip": round(v, 1)}
        print(json.dumps(row))
        rows.append(row)
        out = HERE / "out" / "micro_tuned_probes.json"
        out.write_text(json.dumps(rows, indent=2) + "\n")

    probe("ed2_b8192_control", base)
    probe("ed3_b8192", {**base, "hash_extra_dense_levels": 3})
    probe("ed2_b16384", base, batch_override=16384)
    probe("10L_ed2_b8192", {**base, "hash_n_levels": 10})


if __name__ == "__main__":
    main()
