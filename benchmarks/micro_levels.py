"""Micro-experiment: hash-level count vs train-step time at the headline
operating point (NGP-large, batch 8192, single-pass 48 samples, k=2).

Rationale: the 16-level reference config tops out at res ~7000^3
(scale_15 = 16*1.5^15), far beyond the 512^3 volume this pipeline ever
extracts; levels 12-15 are pure gather/scatter volume (4 of the 11 hashed
levels ~= 36% of the index traffic that dominates the step — docs/PERF.md).

Usage: python benchmarks/micro_levels.py [arm ...] where arm is
"<n_levels>" or "<n_levels>ed<extra_dense_levels>" (e.g. 12ed1).
Appends rows to benchmarks/out/micro_levels.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parent))

BATCH = 8192


def measure(n_levels: int, extra_dense: int = 0, steps: int = 10,
            n_s: int = 16, n_i: int = 32) -> dict:
    import jax
    import jax.numpy as jnp

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.parallel import make_mesh, replicate, shard_batch
    from nerfjax.train import (
        TrainSettings,
        build_fields,
        init_occupancy,
        init_params,
        make_optimizer,
        make_train_step,
    )

    mesh = make_mesh()
    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "microlv",
                "ngp": True,
                "nerf_type": "large",
                "batch_size": BATCH,
                "N_samples": n_s,
                "N_importance": n_i,
                "precision": "bf16",
                "lr": 5e-4,
                "occupancy_grid": True,
                "hash_grad_corners": 2,
                "single_pass": True,
                "hash_n_levels": n_levels,
                "hash_extra_dense_levels": extra_dense,
            }
        )
    )
    settings = TrainSettings.from_cfg(cfg, total_steps=10_000)
    fc, ff, _ = build_fields(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    tx = make_optimizer(settings)
    opt_state = tx.init(params)

    occ_grid = replicate(init_occupancy(settings), mesh)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    step = replicate(jnp.zeros((), jnp.int32), mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)

    rng = np.random.default_rng(0)
    o = rng.normal(size=(BATCH, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o + rng.uniform(-0.3, 0.3, size=(BATCH, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    batch = shard_batch(
        {
            "rays_o": o,
            "rays_d": d.astype(np.float32),
            "rgb": rng.uniform(size=(BATCH, 3)).astype(np.float32),
            "t_near": np.full((BATCH,), 1.5, np.float32),
            "t_far": np.full((BATCH,), 3.5, np.float32),
        },
        mesh,
    )

    train_step = make_train_step(settings, fc, ff, tx, mesh)
    for _ in range(3):
        params, opt_state, step, occ_grid, metrics = train_step(
            params, opt_state, step, occ_grid, key, batch
        )
    float(metrics["loss_total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, step, occ_grid, metrics = train_step(
            params, opt_state, step, occ_grid, key, batch
        )
    float(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / steps
    return {
        "n_levels": n_levels,
        "extra_dense": extra_dense,
        "samples": n_s + n_i,
        "params_M": round(n_params / 1e6, 2),
        "step_s": round(dt, 4),
        "rays_per_s_chip": round(BATCH / dt, 1),
    }


def main() -> None:
    from nerfjax.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    arms = sys.argv[1:] or ["16", "14", "12"]
    out_path = HERE / "out" / "micro_levels.json"
    rows = []
    if out_path.exists():
        rows = json.loads(out_path.read_text())
    for arm in arms:
        # arm grammar: "<levels>[ed<extra_dense>][s<total_samples>]"
        n_s, n_i = 16, 32
        if "s" in arm:
            arm, samp = arm.split("s")
            total = int(samp)
            n_s, n_i = total // 3, total - total // 3
        if "ed" in arm:
            lv, ed = arm.split("ed")
            row = measure(int(lv), int(ed), n_s=n_s, n_i=n_i)
        else:
            row = measure(int(arm), n_s=n_s, n_i=n_i)
        print(json.dumps(row))
        rows.append(row)
        out_path.write_text(json.dumps(rows, indent=2) + "\n")


if __name__ == "__main__":
    main()
