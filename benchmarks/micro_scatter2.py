"""Scatter microbench round 2: in-graph-derived indices (the real backward's
situation — docs/PERF.md measured a ~1000x gather cliff for input-fed index
arrays, and scatter may have the same emitter split), plus width-2-row and
per-level variants.

Usage: python benchmarks/micro_scatter2.py [--n N] [--t T] [--iters K]
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
except Exception:
    pass


def timeit(fn, args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


P1 = np.uint32(2654435761)
P2 = np.uint32(805459861)


def derive_idx(x, y, z, T):
    """In-graph index derivation mirroring the hash backward (clip keeps XLA
    on the fast emitter per PERF.md)."""
    ix = jnp.floor(x * 1024.0).astype(jnp.int32)
    iy = jnp.floor(y * 1024.0).astype(jnp.int32)
    iz = jnp.floor(z * 1024.0).astype(jnp.int32)
    h = ix.astype(jnp.uint32) * P1 ^ iy.astype(jnp.uint32) * P2 ^ iz.astype(jnp.uint32)
    return (h % np.uint32(T)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("T",))
def ingraph_baseline(x, y, z, g0, g1, T):
    idx = derive_idx(x, y, z, T)
    a = jnp.zeros((T,), jnp.float32).at[idx].add(g0, mode="drop")
    b = jnp.zeros((T,), jnp.float32).at[idx].add(g1, mode="drop")
    return a, b


@partial(jax.jit, static_argnames=("T",))
def ingraph_width2(x, y, z, g0, g1, T):
    idx = derive_idx(x, y, z, T)
    g = jnp.stack([g0, g1], axis=-1)  # [n, 2]
    return jnp.zeros((T, 2), jnp.float32).at[idx].add(g, mode="drop")


@partial(jax.jit, static_argnames=("T",))
def ingraph_width8(x, y, z, g0, g1, T):
    # 8 planes of the same grads: does row width amortize at all?
    idx = derive_idx(x, y, z, T)
    g = jnp.stack([g0, g1, g0, g1, g0, g1, g0, g1], axis=-1)  # [n, 8]
    return jnp.zeros((T, 8), jnp.float32).at[idx].add(g, mode="drop")


@partial(jax.jit, static_argnames=("T",))
def ingraph_single(x, y, z, g0, g1, T):
    # one plane only: the per-element floor
    idx = derive_idx(x, y, z, T)
    return jnp.zeros((T,), jnp.float32).at[idx].add(g0, mode="drop")


@partial(jax.jit, static_argnames=("T", "L"))
def ingraph_perlevel(x, y, z, g0, g1, T, L):
    # L separate scatters into T//L-sized tables (table size effect)
    outs = []
    tl = T // L
    for l in range(L):
        idx = derive_idx(x[l], y[l], z[l], tl)
        outs.append(jnp.zeros((tl,), jnp.float32).at[idx].add(g0[l], mode="drop"))
        outs.append(jnp.zeros((tl,), jnp.float32).at[idx].add(g1[l], mode="drop"))
    return jnp.concatenate(outs)


@partial(jax.jit, static_argnames=("T",))
def gather_ref(x, y, z, g0, g1, T):
    # matching in-graph gather for a direct gather-vs-scatter rate comparison
    idx = derive_idx(x, y, z, T)
    tab = jnp.arange(T, dtype=jnp.float32)
    return jnp.take(tab, idx) * g0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=20_000_000)
    p.add_argument("--t", type=int, default=13 * (1 << 19))
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    n = args.n
    x = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    z = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    g0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    g1 = jnp.asarray(rng.normal(size=n).astype(np.float32))

    print(f"devices={jax.devices()} n={n:,} T={args.t:,}")

    for name, fn, fargs, elems in [
        ("single-plane", ingraph_single, (x, y, z, g0, g1, args.t), n),
        ("baseline-2pl", ingraph_baseline, (x, y, z, g0, g1, args.t), 2 * n),
        ("width2-rows", ingraph_width2, (x, y, z, g0, g1, args.t), 2 * n),
        ("width8-rows", ingraph_width8, (x, y, z, g0, g1, args.t), 8 * n),
        ("gather-ref", gather_ref, (x, y, z, g0, g1, args.t), n),
    ]:
        try:
            dt = timeit(fn, fargs, iters=args.iters)
            print(f"  {name:13s} {dt*1e3:9.1f} ms  ({dt/elems*1e9:.2f} ns/elem, {dt/n*1e9:.2f} ns/index)")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:13s} FAILED: {type(e).__name__}: {str(e)[:100]}")

    # per-level variant: 13 levels
    L = 13
    nl = n // L
    xs = jnp.asarray(rng.uniform(size=(L, nl)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(size=(L, nl)).astype(np.float32))
    zs = jnp.asarray(rng.uniform(size=(L, nl)).astype(np.float32))
    g0s = jnp.asarray(rng.normal(size=(L, nl)).astype(np.float32))
    g1s = jnp.asarray(rng.normal(size=(L, nl)).astype(np.float32))
    try:
        dt = timeit(ingraph_perlevel, (xs, ys, zs, g0s, g1s, args.t, L), iters=args.iters)
        elems = 2 * L * nl
        print(f"  per-level     {dt*1e3:9.1f} ms  ({dt/elems*1e9:.2f} ns/elem)")
    except Exception as e:  # noqa: BLE001
        print(f"  per-level     FAILED: {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
