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
    p.add_argument("--grad-levels", type=int, default=0,
                   help="hash_grad_levels for the 'full' arm: 0 = scatter "
                        "all hashed levels' grads; 1..Lh-1 = unbiased "
                        "per-point level subsampling (scatter volume / "
                        "(Lh/gl))")
    p.add_argument("--dense-grad-levels", type=int, default=0,
                   help="hash_dense_grad_levels for the 'full' arm: 0 = "
                        "scatter all dense levels' row grads; 1..Ld-1 = "
                        "unbiased per-point level subsampling of the dense "
                        "backward (exact forward)")
    p.add_argument("--fast-cdf", action="store_true",
                   help="occ_fast_cdf=true (stratified arithmetic inverse-"
                        "CDF sampler) for the 'full' arm")
    p.add_argument("--segments", type=int, default=128,
                   help="occ_segments for the 'full' arm: per-ray "
                        "piecewise-CDF resolution M (grid-lookup stream and "
                        "fast-CDF compare-sum are both linear in M)")
    p.add_argument("--dense-corners", type=int, default=8,
                   help="hash_dense_corners: 8=exact cell-row gathers; "
                        "1..7=stochastic dithered-trilinear dense levels "
                        "(pair gathers + k-corner scatter)")
    p.add_argument("--misc-arms", action="store_true",
                   help="price the NON-gather step components by deletion "
                        "(sampler / grid gathers / sort / SH / MLPs / "
                        "compositing) — decomposes the 'everything else' "
                        "bucket of the forward attribution")
    p.add_argument("--dense-arms", action="store_true",
                   help="experimental dense-level variants: pair-packed "
                        "width-8 f32 cell rows vs the width-16 baseline")
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
                "hash_dense_corners": args.dense_corners,
                "hash_grad_levels": args.grad_levels,
                "hash_dense_grad_levels": args.dense_grad_levels,
                "occ_fast_cdf": bool(args.fast_cdf),
                "occ_segments": args.segments,
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
    if args.only_full and not (args.misc_arms or args.dense_arms):
        return

    if not args.only_full:
        _standard_arms(args, run, he, orig, cfg, build_fields)
    if args.misc_arms:
        _misc_arms(run)
    if args.dense_arms:
        _dense_arms(run, he)


def _standard_arms(args, run, he, orig, cfg, build_fields):
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

def _misc_arms(run):
        # Price the NON-gather components by deletion (same methodology as
        # --forward-arms: each arm patches real work away; the train-step
        # semantics/losses of these arms are meaningless, only the deltas
        # against the same-session "full" arm matter).
        import nerfjax.ops.occupancy as occ_mod
        import nerfjax.fields.encodings as enc_mod
        import nerfjax.render as render_mod
        from nerfjax.fields.ngp import InstantNGP as InstantNGPPlanar

        # -- sampler arms ---------------------------------------------------
        orig_osample = occ_mod.occupancy_sample

        def uniform_z(spec, grid, key, rays_o, rays_d, t_near, t_far, n):
            # stratified uniform depths: no grid gathers, no CDF, no sort
            near = t_near.reshape(-1, 1)
            far = t_far.reshape(-1, 1)
            t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)[None, :]
            z = near * (1.0 - t) + far * t
            return z + (far - near) / n * (
                jax.random.uniform(key, z.shape, jnp.float32) - 0.5
            ) + grid[0] * 0.0

        occ_mod.occupancy_sample = uniform_z
        try:
            run("uniform-z")
        finally:
            occ_mod.occupancy_sample = orig_osample

        orig_lookup = occ_mod._grid_lookup

        def no_grid_gather(spec, grid, px, py, pz):
            return jnp.broadcast_to(grid[0], px.shape)

        occ_mod._grid_lookup = no_grid_gather
        try:
            run("no-grid-gather")
        finally:
            occ_mod._grid_lookup = orig_lookup

        def osample_nosort(spec, grid, key, rays_o, rays_d, t_near, t_far, n):
            from nerfjax.ops.occupancy import segment_weights
            from nerfjax.render import sample_pdf

            edges, w = segment_weights(spec, grid, rays_o, rays_d, t_near, t_far)
            return sample_pdf(key, edges, w, n)  # skip the per-ray sort

        occ_mod.occupancy_sample = osample_nosort
        try:
            run("no-z-sort")
        finally:
            occ_mod.occupancy_sample = orig_osample

        # -- SH / MLP arms ----------------------------------------------------
        orig_sh = enc_mod.sh4_encode_planar

        def no_sh(dx, dy, dz):
            return jnp.broadcast_to(dx[None, :] * 0.0, (16, dx.shape[0]))

        enc_mod.sh4_encode_planar = no_sh
        try:
            run("no-sh")
        finally:
            enc_mod.sh4_encode_planar = orig_sh

        orig_apply = InstantNGPPlanar.apply_planar

        def no_cmlp(self, params, pos3, view3, *, dtype=jnp.bfloat16, **_):
            # keep encode + dmlp; rgb from density features (no cmlp, no SH)
            sigma, feat = self.query_density_planar(params, pos3, dtype=dtype)
            rgb = jax.nn.sigmoid(feat[1:4] + params["cmlp"][-1]["w"][0, :3][:, None].astype(dtype))
            return rgb, sigma

        InstantNGPPlanar.apply_planar = no_cmlp
        try:
            run("no-cmlp")
        finally:
            InstantNGPPlanar.apply_planar = orig_apply

        orig_qd = InstantNGPPlanar.query_density_planar

        def no_dmlp(self, params, pos3, *, dtype=jnp.bfloat16, **_):
            from nerfjax.ops.hash_encode import hash_encode_planar
            from jax.ad_checkpoint import checkpoint_name

            x = jnp.clip((pos3[0] + 1.0) * 0.5, 0.0, 1.0)
            y = jnp.clip((pos3[1] + 1.0) * 0.5, 0.0, 1.0)
            z = jnp.clip((pos3[2] + 1.0) * 0.5, 0.0, 1.0)
            enc = hash_encode_planar(self.spec, params["table"], x, y, z, dtype=dtype)
            enc = checkpoint_name(enc, "hash_enc")
            feat = jax.nn.relu(
                enc[:16] + params["dmlp"][0]["w"][0, 0].astype(dtype)
            )  # encode kept, dmlp matmuls gone
            return feat[0], feat

        InstantNGPPlanar.query_density_planar = no_dmlp
        InstantNGPPlanar.apply_planar = no_cmlp
        try:
            run("no-mlp")
        finally:
            InstantNGPPlanar.query_density_planar = orig_qd
            InstantNGPPlanar.apply_planar = orig_apply

        # -- compositing arm -------------------------------------------------
        orig_r2o = render_mod.raw2outputs_planar

        def no_composite(rgb, sigma, z_vals, white_bg=False, dist_last=1e10):
            rgb_map = jnp.mean(rgb.astype(jnp.float32), axis=-1).T  # [B, 3]
            S = z_vals.shape[-1]
            w = jnp.broadcast_to(
                (sigma.astype(jnp.float32) * 0.0 + 1.0 / S), sigma.shape
            )
            return rgb_map, w

        render_mod.raw2outputs_planar = no_composite
        try:
            run("no-composite")
        finally:
            render_mod.raw2outputs_planar = orig_r2o

def _dense_arms(run, he):
        # Pair-packed dense cell rows: [C, 8] f32 words (two bf16 features
        # per word) instead of [C, 16] dtype lanes — half the row lanes at
        # equal bytes (bf16 baseline). The packed assembly routes through
        # bitcasts (non-differentiable), so BOTH arms stop-gradient the dense
        # encode; read dense-packed against the dense-sg16 control, which
        # prices the forward row-gather width effect in isolation.
        orig_dense3 = he._dense_levels_encode

        def dense_sg16(spec, dense, planes, x, y, z, dtype):
            e0, e1 = orig_dense3(spec, dense, planes, x, y, z, dtype)
            return jax.lax.stop_gradient(e0), jax.lax.stop_gradient(e1)

        he._dense_levels_encode = dense_sg16
        try:
            run("dense-sg16")
        finally:
            he._dense_levels_encode = orig_dense3

        def dense_packed(spec, dense, planes, x, y, z, dtype):
            e0_rows, e1_rows = [], []
            for lp in dense:
                r = lp["res"]
                sl = planes[:, lp["offset"] : lp["offset"] + lp["size"]]
                g = sl[:, : r * r * r].reshape(2, r, r, r)
                slots = []
                for dxc, dyc, dzc in he._CORNERS:
                    block = g[:, dzc : dzc + r - 1, dyc : dyc + r - 1, dxc : dxc + r - 1]
                    slots.append(
                        he._pack_pairs_bf16(
                            jnp.stack(
                                [block[0].reshape(-1), block[1].reshape(-1)]
                            )
                        )
                    )
                rows = jnp.stack(slots, axis=-1)  # [(r-1)^3, 8] f32 words
                px, py, pz = x * lp["scale"] + 0.5, y * lp["scale"] + 0.5, z * lp["scale"] + 0.5
                bx = jnp.clip(jnp.floor(px), 0, r - 2).astype(jnp.int32)
                by = jnp.clip(jnp.floor(py), 0, r - 2).astype(jnp.int32)
                bz = jnp.clip(jnp.floor(pz), 0, r - 2).astype(jnp.int32)
                row_idx = bx + by * (r - 1) + bz * (r - 1) * (r - 1)
                G = jnp.take(rows, row_idx, axis=0)  # [N, 8] f32 words
                f0, f1 = he._unpack_pairs(G)  # [N, 8] each
                tx = jnp.clip(px - bx, 0.0, 1.0).astype(dtype)
                ty = jnp.clip(py - by, 0.0, 1.0).astype(dtype)
                tz = jnp.clip(pz - bz, 0.0, 1.0).astype(dtype)
                e0 = jnp.zeros_like(tx)
                e1 = jnp.zeros_like(tx)
                for c, (dxc, dyc, dzc) in enumerate(he._CORNERS):
                    wx = tx if dxc else (1.0 - tx)
                    wy = ty if dyc else (1.0 - ty)
                    wz = tz if dzc else (1.0 - tz)
                    w = wx * wy * wz
                    e0 = e0 + f0[:, c].astype(dtype) * w
                    e1 = e1 + f1[:, c].astype(dtype) * w
                e0_rows.append(e0)
                e1_rows.append(e1)
            return (
                jax.lax.stop_gradient(jnp.stack(e0_rows, axis=0)),
                jax.lax.stop_gradient(jnp.stack(e1_rows, axis=0)),
            )

        he._dense_levels_encode = dense_packed
        try:
            run("dense-packed")
        finally:
            he._dense_levels_encode = orig_dense3


if __name__ == "__main__":
    main()
