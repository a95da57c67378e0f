"""Prototype: hash-table gradient accumulation as a Pallas MXU kernel.

The NGP backward must compute grad[t] = sum_k v_k * [idx_k == t] for
T = 2^19 table entries and K ~ 4-17M (point, corner) pairs per level. XLA
scatter-add does this at ~15-30 ns/index on v5e (see micro_scatter2) — the
train step's dominant cost. Idea: decompose idx = hi*128 + lo and compute

    grad.reshape(4096, 128)[a, b] = sum_k v_k * [hi_k == a] * [lo_k == b]
                                  = (onehot(hi) * 1)^T @ (onehot(lo) * v)

i.e. a [4096, Kb]^T @ [Kb, 128] matmul per chunk with on-the-fly one-hots,
accumulated in a VMEM-resident [4096, 256] f32 block (both feature planes
side by side). FLOPs = 2*T*K ~ 4.4e12 per level — ~10-30 ms at MXU rates
vs ~120 ms scatter. A second variant scatters 256-wide rows into VMEM with
dynamic row indices (no one-hot build, but issue-bound again).

Usage: python benchmarks/micro_onehot.py [--k K] [--iters N]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    from nerfjax.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

T = 1 << 19
A_ROWS = T // 128  # 4096
KB = 1024  # chunk of (point, corner) pairs per grid step (8x128 block)


def _onehot_kernel(idx_ref, g0_ref, g1_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Flatten the [8,128] block, then sub-chunk the one-hot build so the
    # [sub, 4096] comparison temporaries stay within VMEM (the full
    # [1024, 4096] int32 iota would need 16 MB).
    SUB = 256
    idx = idx_ref[0].reshape(KB)  # [KB] int32
    g0 = g0_ref[0].reshape(KB)
    g1 = g1_ref[0].reshape(KB)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    arow = jax.lax.broadcasted_iota(jnp.int32, (SUB, A_ROWS), 1)
    acc = jnp.zeros((A_ROWS, 256), jnp.float32)
    for s in range(KB // SUB):
        sl = jax.lax.slice(idx, (s * SUB,), ((s + 1) * SUB,))
        hi = (sl >> 7).astype(jnp.int32)[:, None]  # [SUB, 1]
        lo = (sl & 127).astype(jnp.int32)[:, None]
        A = (hi == arow).astype(jnp.bfloat16)  # [SUB, 4096]
        L = lo == lrow  # [SUB, 128]
        gs0 = jax.lax.slice(g0, (s * SUB,), ((s + 1) * SUB,))[:, None]
        gs1 = jax.lax.slice(g1, (s * SUB,), ((s + 1) * SUB,))[:, None]
        B0 = jnp.where(L, gs0, 0.0).astype(jnp.bfloat16)
        B1 = jnp.where(L, gs1, 0.0).astype(jnp.bfloat16)
        B = jnp.concatenate([B0, B1], axis=1)  # [SUB, 256]
        acc = acc + jax.lax.dot_general(
            A, B, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    out_ref[:] += acc


@jax.jit
def grad_onehot(idx, g0, g1):
    K = idx.shape[0]
    grid = K // KB
    out = pl.pallas_call(
        _onehot_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (A_ROWS, 256), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((A_ROWS, 256), jnp.float32),
    )(idx.reshape(grid, 8, 128), g0.reshape(grid, 8, 128), g1.reshape(grid, 8, 128))
    # [4096, 256] -> two [T] planes
    return out[:, :128].reshape(-1), out[:, 128:].reshape(-1)


def _rowscatter_kernel(idx_ref, g0_ref, g1_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[0].reshape(KB)
    hi = (idx >> 7).astype(jnp.int32)
    lo = (idx & 127).astype(jnp.int32)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (KB, 128), 1)
    L = lo[:, None] == lrow
    B0 = jnp.where(L, g0_ref[0].reshape(KB)[:, None], 0.0)  # [KB, 128] f32
    B1 = jnp.where(L, g1_ref[0].reshape(KB)[:, None], 0.0)

    def body(k, _):
        r = hi[k]
        row0 = jax.lax.dynamic_slice(B0, (k, 0), (1, 128))
        row1 = jax.lax.dynamic_slice(B1, (k, 0), (1, 128))
        out_ref[pl.ds(r, 1), 0:128] += row0
        out_ref[pl.ds(r, 1), 128:256] += row1
        return 0

    jax.lax.fori_loop(0, KB, body, 0)


@jax.jit
def grad_rowscatter(idx, g0, g1):
    K = idx.shape[0]
    grid = K // KB
    out = pl.pallas_call(
        _rowscatter_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (A_ROWS, 256), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((A_ROWS, 256), jnp.float32),
    )(idx.reshape(grid, 8, 128), g0.reshape(grid, 8, 128), g1.reshape(grid, 8, 128))
    return out[:, :128].reshape(-1), out[:, 128:].reshape(-1)


@jax.jit
def grad_scatter(idx, g0, g1):
    a = jnp.zeros((T,), jnp.float32).at[idx].add(g0, mode="drop")
    b = jnp.zeros((T,), jnp.float32).at[idx].add(g1, mode="drop")
    return a, b


def timeit(fn, args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(out[0])[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(out[0])[:1]
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=4_194_304)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, T, size=args.k, dtype=np.int32))
    g0 = jnp.asarray(rng.normal(size=args.k).astype(np.float32) * 1e-3)
    g1 = jnp.asarray(rng.normal(size=args.k).astype(np.float32) * 1e-3)

    print(f"devices={jax.devices()} K={args.k:,} T={T:,}")

    ref = grad_scatter(idx, g0, g1)
    for name, fn in [("onehot-mxu", grad_onehot), ("rowscatter", grad_rowscatter)]:
        try:
            got = fn(idx, g0, g1)
            # bf16 product rounding: compare with loose tolerance + exact
            # support pattern
            err = float(jnp.abs(got[0] - ref[0]).max())
            rel = err / (float(jnp.abs(ref[0]).max()) + 1e-12)
            support_ok = bool(
                jnp.array_equal(got[0] != 0, ref[0] != 0)
            ) if name == "rowscatter" else True
            print(f"  {name:11s} max_abs_err={err:.3e} rel={rel:.3e} support_ok={support_ok}")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:11s} CORRECTNESS FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue

    for name, fn in [
        ("xla-scatter", grad_scatter),
        ("onehot-mxu", grad_onehot),
        ("rowscatter", grad_rowscatter),
    ]:
        try:
            dt = timeit(fn, (idx, g0, g1), iters=args.iters)
            print(f"  {name:11s} {dt*1e3:8.1f} ms ({dt/args.k*1e9:.2f} ns/index, 2 planes)")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:11s} TIMING FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
