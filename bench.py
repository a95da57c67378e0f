"""Headline benchmark: training throughput (rays/sec/chip) at the
PSNR-parity operating point.

Model & workload: Instant-NGP large (2^19 hash), batch 8192 rays, full
train step (sampling, field, compositing, MSE, grads, AdamW+OneCycle) —
not inference. Operating point: SINGLE-PASS occupancy sampling (all 48
samples per ray drawn from the occupancy-grid CDF, no coarse network pass
— instant-ngp's actual design) plus unbiased stochastic corner gradients
(hash_grad_corners=2). Measured over 3 seeds x 2 scene geometries
(benchmarks/psnr_parity.json, PERF.md table), this operating point beats
the PSNR of the reference's uniform hierarchical sampling by +3.0 dB
(sphere) / +3.6 dB (boxes) mean and matches-or-beats the exact
hierarchical occupancy arm, at the highest throughput of all arms.
The reference's exact 64+192 uniform point runs at ~1,045 rays/s/chip on
v5e-1 with the exact backward (docs/PERF.md step-timing table).

Baseline: the reference publishes no numbers (BASELINE.md). Two anchors:
  * MEASURED same-hardware ratio: the reference's own train_no_amp.py runs
    at 17.4 rays/s on one CPU core where nerfjax runs the identical
    workload at 804.6 rays/s — 46.2x (benchmarks/reference_cpu.json,
    benchmarks/nerfjax_cpu.json).
  * `vs_baseline` divides by REF_RAYS_PER_SEC = 400_000, the documented
    SPEED-OF-LIGHT upper bound for the reference NGP pipeline on its
    stated RTX-4090-class hardware (pure tiny-cuda-nn kernel throughput,
    zero torch/Python overhead); the realistic estimate from the
    launch-overhead decomposition in BASELINE.md is 70-130k rays/s, so
    vs_baseline is conservative by ~3-5x.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Speed-of-light upper bound for the reference on RTX-4090-class hardware;
# see module docstring + BASELINE.md "GPU-scaling argument".
REF_RAYS_PER_SEC = 400_000.0

BATCH = 8192
N_SAMPLES = 16
N_IMPORTANCE = 32
WARMUP_STEPS = 3
BENCH_STEPS = 20


def main() -> None:
    import jax

    from nerfjax.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from nerfjax.config import ConfigNode, with_defaults
    from nerfjax.parallel import make_mesh, replicate, shard_batch
    from nerfjax.train import (
        TrainSettings,
        build_fields,
        init_params,
        make_optimizer,
        make_train_step,
    )

    mesh = make_mesh()
    n_chips = len(mesh.devices.ravel())

    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "bench",
                "ngp": True,
                "nerf_type": "large",
                "batch_size": BATCH,
                "N_samples": N_SAMPLES,
                "N_importance": N_IMPORTANCE,
                "precision": "bf16",
                "lr": 5e-4,
                "occupancy_grid": True,
                "hash_grad_corners": 2,
                "single_pass": True,
            }
        )
    )
    settings = TrainSettings.from_cfg(cfg, total_steps=10_000)
    fc, ff, _ = build_fields(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(settings)
    opt_state = tx.init(params)

    from nerfjax.train import init_occupancy

    occ_grid = replicate(init_occupancy(settings), mesh)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    step = replicate(jnp.zeros((), jnp.int32), mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)

    rng = np.random.default_rng(0)
    B = BATCH * max(1, n_chips)  # keep per-chip batch = reference batch
    o = rng.normal(size=(B, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = (-o + rng.uniform(-0.3, 0.3, size=(B, 3)).astype(np.float32))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    batch = shard_batch(
        {
            "rays_o": o,
            "rays_d": d.astype(np.float32),
            "rgb": rng.uniform(size=(B, 3)).astype(np.float32),
            "t_near": np.full((B,), 1.5, np.float32),
            "t_far": np.full((B,), 3.5, np.float32),
        },
        mesh,
    )

    train_step = make_train_step(settings, fc, ff, tx, mesh)

    for _ in range(WARMUP_STEPS):
        params, opt_state, step, occ_grid, metrics = train_step(
            params, opt_state, step, occ_grid, key, batch
        )
    float(metrics["loss_total"])  # host fetch = real device sync

    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        params, opt_state, step, occ_grid, metrics = train_step(
            params, opt_state, step, occ_grid, key, batch
        )
    float(metrics["loss_total"])  # host fetch = real device sync
    dt = time.perf_counter() - t0

    rays_per_sec = BENCH_STEPS * B / dt
    rays_per_sec_chip = rays_per_sec / max(1, n_chips)

    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip_ngp_large_psnr_parity_op",
                "value": round(rays_per_sec_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec_chip / REF_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
