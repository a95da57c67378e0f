"""Price the occupancy-grid EMA update (the cost the 10-iter step timing
mostly misses: it fires every `update_every` steps inside lax.cond and
queries all res^3 cell centers through the fine field).

Measures:
  * one full update_grid call at the tuned op point's field (12L+ed2, f1)
  * the same with the exact forward (fwd=8) for reference
  * the partitioned variant (update 1/P of the cells per call), if
    ops.occupancy exposes it

Amortized per-step cost = update_ms / update_every (default 16).

Usage: python benchmarks/micro_occ_update.py [--res 128] [--partitions 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from nerfjax.utils.cache import enable_compilation_cache

enable_compilation_cache()

from nerfjax.config import ConfigNode, with_defaults  # noqa: E402
from nerfjax.ops.occupancy import OccupancyGridSpec, init_grid, update_grid  # noqa: E402
from nerfjax.train import _split_params, build_fields, init_params  # noqa: E402


def time_call(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # warm up the sum too, so its trace/compile + host round-trip is not
    # charged to the timed window below (ADVICE round 4)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # force a host fetch: block_until_ready alone does not reliably sync
    # through the axon tunnel (docs/PERF.md)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--partitions", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    base = {
        "scene_name": "occup",
        "ngp": True,
        "nerf_type": "large",
        "precision": "bf16",
        "hash_n_levels": 12,
        "hash_extra_dense_levels": 2,
        "single_pass": True,
        "hash_grad_corners": 1,
    }
    key = jax.random.PRNGKey(0)

    for fwd, label in ((1, "tuned f1"), (8, "exact fwd")):
        cfg = with_defaults(ConfigNode({**base, "hash_fwd_corners": fwd}))
        _, ff, _ = build_fields(cfg, train=True)
        # update_grid queries the FINE field; pass its param subtree, same
        # as the train.py caller (train.py:354)
        _, params = _split_params(init_params(cfg, key))

        spec = OccupancyGridSpec(resolution=args.res)
        grid = init_grid(spec)
        f = jax.jit(lambda g, k, ff=ff, spec=spec: update_grid(spec, g, ff, params, k))
        dt = time_call(f, grid, key, iters=args.iters)
        print(
            f"full update ({label:9s}) res={args.res}: {dt*1e3:8.1f} ms "
            f"-> amortized {dt*1e3/spec.update_every:5.1f} ms/step @ every {spec.update_every}"
        )

        if args.partitions > 1 and "update_partitions" in OccupancyGridSpec.__dataclass_fields__:
            pspec = OccupancyGridSpec(
                resolution=args.res, update_partitions=args.partitions
            )
            fp = jax.jit(
                lambda g, k, ph, ff=ff, pspec=pspec: update_grid(
                    pspec, g, ff, params, k, phase=ph
                )
            )
            dtp = time_call(fp, grid, key, jnp.int32(1), iters=args.iters)
            print(
                f"1/{args.partitions} update ({label:9s}) res={args.res}: {dtp*1e3:8.1f} ms "
                f"-> amortized {dtp*1e3/pspec.update_every:5.1f} ms/step"
            )


if __name__ == "__main__":
    main()
