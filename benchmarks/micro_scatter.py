"""Microbenchmark: alternatives for the hash-table gradient scatter-add.

The NGP train step's backward scatters ~1e8 gradient elements into the
13 hash-level tables (2 feature planes x 8 corners x points); docs/PERF.md
measured plain XLA scatter-add at ~5-7 ns/element on v5e, making it the
step's hard floor. This benchmark measures candidate replacements on the
real chip at the train step's actual shapes:

  A. baseline      — two f32 .at[idx].add (one per feature plane)
  B. fused2        — one scatter into a [2T] interleaved table (idx*2, idx*2+1)
  C. complex64     — one scatter of g0 + i*g1 (tests whether TPU complex
                     scatter decomposes or issues as one op)
  D. segment_sum   — jax.ops.segment_sum per plane
  E. sort+unique   — sort by index, run-boundary cumsum-diff reduction,
                     then a unique-index scatter (duplication factor ~8-32x
                     means the final scatter touches far fewer elements)
  F. sorted-scatter— sort by index, then .at[].add(indices_are_sorted=True)

Usage: python benchmarks/micro_scatter.py [--n N] [--t T] [--iters K]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from nerfjax.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:  # pragma: no cover - cache is an optimization only
    pass


def timeit(fn, args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # host fetch forces sync through the axon tunnel (see docs/PERF.md)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


@partial(jax.jit, static_argnames=("T",))
def baseline(idx, g0, g1, T):
    a = jnp.zeros((T,), jnp.float32).at[idx].add(g0, mode="drop")
    b = jnp.zeros((T,), jnp.float32).at[idx].add(g1, mode="drop")
    return a, b


@partial(jax.jit, static_argnames=("T",))
def fused2(idx, g0, g1, T):
    i2 = jnp.concatenate([idx * 2, idx * 2 + 1])
    g = jnp.concatenate([g0, g1])
    return jnp.zeros((2 * T,), jnp.float32).at[i2].add(g, mode="drop")


@partial(jax.jit, static_argnames=("T",))
def complex_scatter(idx, g0, g1, T):
    g = jax.lax.complex(g0, g1)
    return jnp.zeros((T,), jnp.complex64).at[idx].add(g, mode="drop")


@partial(jax.jit, static_argnames=("T",))
def segsum(idx, g0, g1, T):
    a = jax.ops.segment_sum(g0, idx, num_segments=T)
    b = jax.ops.segment_sum(g1, idx, num_segments=T)
    return a, b


@partial(jax.jit, static_argnames=("T",))
def sort_unique(idx, g0, g1, T):
    """Sort by index, reduce each equal-index run via cumsum differencing,
    scatter only the per-run totals (at run-end positions; other positions
    contribute an exact 0 to the same slot)."""
    sidx, s0, s1 = jax.lax.sort((idx, g0, g1), num_keys=1)
    n = sidx.shape[0]
    c0 = jnp.cumsum(s0)
    c1 = jnp.cumsum(s1)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    is_last = jnp.concatenate([sidx[1:] != sidx[:-1], jnp.ones((1,), bool)])
    # run start position for every element: running max of first-positions
    starts = jnp.where(is_first, jnp.arange(n, dtype=jnp.int32), 0)
    starts = jax.lax.associative_scan(jnp.maximum, starts)
    base0 = jnp.where(starts > 0, jnp.take(c0, starts - 1, mode="clip"), 0.0)
    base1 = jnp.where(starts > 0, jnp.take(c1, starts - 1, mode="clip"), 0.0)
    tot0 = jnp.where(is_last, c0 - base0, 0.0)
    tot1 = jnp.where(is_last, c1 - base1, 0.0)
    a = jnp.zeros((T,), jnp.float32).at[sidx].add(tot0, mode="drop")
    b = jnp.zeros((T,), jnp.float32).at[sidx].add(tot1, mode="drop")
    return a, b


@partial(jax.jit, static_argnames=("T",))
def sorted_scatter(idx, g0, g1, T):
    sidx, s0, s1 = jax.lax.sort((idx, g0, g1), num_keys=1)
    a = jnp.zeros((T,), jnp.float32).at[sidx].add(
        s0, mode="drop", indices_are_sorted=True
    )
    b = jnp.zeros((T,), jnp.float32).at[sidx].add(
        s1, mode="drop", indices_are_sorted=True
    )
    return a, b


@partial(jax.jit, static_argnames=("T",))
def sort_only(idx, g0, g1, T):
    return jax.lax.sort((idx, g0, g1), num_keys=1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=55_000_000,
                   help="scatter elements per plane (train-step scale)")
    p.add_argument("--t", type=int, default=13 * (1 << 19),
                   help="table entries (13 hash levels x 2^19)")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, args.t, size=args.n, dtype=np.int32))
    g0 = jnp.asarray(rng.normal(size=args.n).astype(np.float32))
    g1 = jnp.asarray(rng.normal(size=args.n).astype(np.float32))

    print(f"devices={jax.devices()} n={args.n:,} T={args.t:,}")

    # correctness cross-check at small scale first
    si = jnp.asarray(rng.integers(0, 97, size=4096, dtype=np.int32))
    s0 = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    s1 = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    ref = baseline(si, s0, s1, 97)
    for name, fn, unwrap in [
        ("fused2", fused2, lambda o: (o[0::2], o[1::2])),
        ("complex64", complex_scatter, lambda o: (o.real, o.imag)),
        ("segment_sum", segsum, lambda o: o),
        ("sort+unique", sort_unique, lambda o: o),
        ("sorted-scatter", sorted_scatter, lambda o: o),
    ]:
        try:
            got = unwrap(fn(si, s0, s1, 97))
            err = max(
                float(jnp.abs(got[0] - ref[0]).max()),
                float(jnp.abs(got[1] - ref[1]).max()),
            )
            status = "OK" if err < 1e-3 else f"WRONG (err={err:.2e})"
        except Exception as e:  # noqa: BLE001
            status = f"FAILED ({type(e).__name__}: {e})"
        print(f"  correctness {name:15s} {status}")

    results = {}
    for name, fn in [
        ("baseline", baseline),
        ("fused2", fused2),
        ("complex64", complex_scatter),
        ("segment_sum", segsum),
        ("sort_only", sort_only),
        ("sorted-scatter", sorted_scatter),
        ("sort+unique", sort_unique),
    ]:
        try:
            dt = timeit(fn, (idx, g0, g1, args.t), iters=args.iters)
            ns_per_elem = dt / (2 * args.n) * 1e9
            results[name] = dt
            print(f"  {name:15s} {dt*1e3:9.1f} ms  ({ns_per_elem:.2f} ns/elem over 2 planes)")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:15s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
