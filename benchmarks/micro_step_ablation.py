"""Decompose the NGP train step's cost by ablating gradient paths.

Measures the full jitted train step at the headline operating point, then
variants with parts knocked out, to locate where the time actually goes:

  full        — the real train step (grads for everything)
  no-hash-bwd — stop_gradient around the hash-level encode (kills the
                2x[T] scatter-add backward)
  no-enc-bwd  — stop_gradient around the whole hash-grid encode (also
                kills the dense-level cell-row scatter backward)
  fwd-only    — loss only, no grad/optimizer at all

Usage: python benchmarks/micro_step_ablation.py [--batch 8192] [--ns 16] [--ni 32]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.utils.cache import enable_compilation_cache

enable_compilation_cache()

from nerfjax.config import ConfigNode, with_defaults  # noqa: E402
from nerfjax.parallel import make_mesh, replicate, shard_batch  # noqa: E402
from nerfjax.train import (  # noqa: E402
    TrainSettings,
    build_fields,
    init_occupancy,
    init_params,
    make_optimizer,
    make_train_step,
)


def make_batch(B):
    rng = np.random.default_rng(0)
    o = rng.normal(size=(B, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o + rng.uniform(-0.3, 0.3, size=(B, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": o,
        "rays_d": d.astype(np.float32),
        "rgb": rng.uniform(size=(B, 3)).astype(np.float32),
        "t_near": np.full((B,), 1.5, np.float32),
        "t_far": np.full((B,), 3.5, np.float32),
    }


def time_step(train_step, params, opt_state, step, occ, key, batch, iters=10):
    for _ in range(3):
        params, opt_state, step, occ, metrics = train_step(
            params, opt_state, step, occ, key, batch
        )
    float(metrics["loss_total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, step, occ, metrics = train_step(
            params, opt_state, step, occ, key, batch
        )
    float(metrics["loss_total"])
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--ns", type=int, default=16)
    p.add_argument("--ni", type=int, default=32)
    p.add_argument("--occupancy", action=argparse.BooleanOptionalAction,
                   default=True, help="--no-occupancy = uniform sampling arm")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--levels", type=int, default=16,
                   help="hash_n_levels (12 = round-3 tuned)")
    p.add_argument("--extra-dense", type=int, default=0,
                   help="hash_extra_dense_levels (2 = round-3 tuned)")
    p.add_argument("--single-pass", action="store_true",
                   help="single-pass occupancy sampling (tuned op point)")
    p.add_argument("--sgrad", type=int, default=8,
                   help="hash_grad_corners for the 'full' arm (2 = tuned)")
    p.add_argument("--forward-arms", action="store_true",
                   help="also run forward-side attribution arms "
                        "(no-hash-gather / no-hash-fwd / no-dense-gather / "
                        "uniform-sampler)")
    p.add_argument("--fwd", type=int, default=8,
                   help="hash_fwd_corners for the 'full' arm (8 = exact; "
                        "<8 = stochastic dithered-trilinear forward)")
    p.add_argument("--only-full", action="store_true",
                   help="time only the real train step (skip ablation arms) "
                        "— quick throughput probe of one op point")
    args = p.parse_args()

    mesh = make_mesh()
    cfg = with_defaults(
        ConfigNode(
            {
                "scene_name": "ablate",
                "ngp": True,
                "nerf_type": "large",
                "batch_size": args.batch,
                "N_samples": args.ns,
                "N_importance": args.ni,
                "precision": "bf16",
                "occupancy_grid": bool(args.occupancy),
                "hash_n_levels": args.levels,
                "hash_extra_dense_levels": args.extra_dense,
                "single_pass": bool(args.single_pass),
                "hash_grad_corners": args.sgrad,
                "hash_fwd_corners": args.fwd,
            }
        )
    )
    settings = TrainSettings.from_cfg(cfg, total_steps=10_000)
    fc, ff, _ = build_fields(cfg, train=True)
    # keep host copies: the train step donates its buffers, so each run
    # must materialize fresh device arrays
    params0 = jax.device_get(init_params(cfg, jax.random.PRNGKey(0)))
    tx = make_optimizer(settings)
    opt0 = jax.device_get(tx.init(params0))

    batch = shard_batch(make_batch(args.batch), mesh)

    import nerfjax.ops.hash_encode as he

    orig = he._hash_levels_encode

    def run(name, patch=None, fields=None):
        if patch is not None:
            he._hash_levels_encode = patch
        try:
            fcr, ffr = fields if fields is not None else (fc, ff)
            ts = make_train_step(settings, fcr, ffr, tx, mesh)
            params = replicate(jax.tree.map(jnp.asarray, params0), mesh)
            opt_state = replicate(jax.tree.map(jnp.asarray, opt0), mesh)
            step = replicate(jnp.zeros((), jnp.int32), mesh)
            occ = replicate(init_occupancy(settings), mesh)
            key = replicate(jax.random.PRNGKey(1), mesh)
            dt = time_step(ts, params, opt_state, step, occ, key, batch, args.iters)
            rays = args.batch / dt
            print(f"  {name:12s} {dt*1e3:8.1f} ms/step  ({rays:,.0f} rays/s)")
            return dt
        finally:
            he._hash_levels_encode = orig

    print(
        f"devices={jax.devices()} batch={args.batch} "
        f"samples={args.ns}+{args.ni} occupancy={args.occupancy}"
    )

    run("full")
    if args.only_full:
        return

    def no_hash_bwd(spec, hp, x, y, z):
        return jax.lax.stop_gradient(orig(spec, hp, x, y, z))

    run("no-hash-bwd", no_hash_bwd)

    # also kill the dense-level backward (cell-row scatter + assembly adds)
    orig_dense = he._dense_levels_encode

    def no_dense_bwd(spec, dense, planes, x, y, z, dtype):
        e0, e1 = orig_dense(spec, dense, planes, x, y, z, dtype)
        return jax.lax.stop_gradient(e0), jax.lax.stop_gradient(e1)

    he._dense_levels_encode = no_dense_bwd
    try:
        run("no-enc-bwd", no_hash_bwd)
    finally:
        he._dense_levels_encode = orig_dense

    # stochastic corner gradients (unbiased k-of-8 sampling); train=True so
    # a --fwd <8 run keeps the stochastic forward in these arms too (the
    # k-sweep isolates the backward delta only if the forward cost matches
    # the "full" arm's)
    for k in (4, 2, 1):
        cfg_k = cfg.merge({"hash_grad_corners": k})
        fck, ffk, _ = build_fields(cfg_k, train=True)
        run(f"sgrad-k{k}", fields=(fck, ffk))

    if args.forward_arms:
        # Forward-side attribution (all NOT-a-train-step semantics — each
        # arm deletes real work to price it; losses are meaningless):
        #   no-hash-gather — hashed levels keep ALL index/weight math but
        #     read a single broadcast table word instead of gathering
        #     (prices the 8-corner gathers alone)
        #   no-hash-fwd   — hashed levels return zeros (also prices the
        #     index/weight arithmetic)
        #   no-dense-gather — dense cell-row levels keep interpolation
        #     math, broadcast row 0 (prices the width-16 row gathers)
        def no_hash_gather(spec, hp, x, y, z):
            _, hashed = he._split_levels(spec)
            Lh = len(hashed)
            w = he._corner_weights(hashed, x, y, z, clamp=False)
            f = hp[0, 0].astype(w.dtype)  # one scalar read, no gather
            N = x.shape[0]
            e = jnp.sum((f * w).reshape(Lh, 8, N), axis=1)
            return jax.lax.stop_gradient(jnp.stack([e, e]))

        run("no-hash-gather", no_hash_gather)

        def no_hash_fwd(spec, hp, x, y, z):
            _, hashed = he._split_levels(spec)
            Lh = len(hashed)
            zero = jnp.zeros((2, Lh, x.shape[0]), hp.dtype) + hp[0, 0] * 0
            return jax.lax.stop_gradient(zero)

        run("no-hash-fwd", no_hash_fwd)

        orig_dense2 = he._dense_levels_encode

        def no_dense_gather(spec, dense, planes, x, y, z, dtype):
            def patched_take(rows, row_idx, axis=0):
                return jnp.broadcast_to(rows[0], (row_idx.shape[0],) + rows.shape[1:])

            take = jnp.take
            try:
                jnp.take = lambda a, i, axis=0: (
                    patched_take(a, i) if a.ndim == 2 and a.shape[1] == 16 else take(a, i, axis=axis)
                )
                e0, e1 = orig_dense2(spec, dense, planes, x, y, z, dtype)
            finally:
                jnp.take = take
            return jax.lax.stop_gradient(e0), jax.lax.stop_gradient(e1)

        he._dense_levels_encode = no_dense_gather
        try:
            run("no-dense-gather")
        finally:
            he._dense_levels_encode = orig_dense2

        # (sampler price: compare a separate `--no-occupancy` invocation —
        # the hierarchical-uniform control is already a first-class arm)


if __name__ == "__main__":
    main()
