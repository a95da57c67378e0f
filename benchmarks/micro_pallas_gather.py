"""Is hand-scheduled gather/compute overlap expressible+profitable on TPU?

Round-3 verdict #3: docs/PERF.md left one open perf question — whether a
Pallas kernel that double-buffers hash-row fetches against the MLP
matmuls could hide part of the non-gather 38% of the tuned train step
(reference anchor: tcnn's fused HashGrid encode+MLP,
scripts/instantngp.py:23-52; the op under study is
nerfjax.ops.hash_encode._hash_levels_fwd). This probe answers it with
measurements, in three parts:

1. **In-kernel vector gather from a VMEM-staged table** (the design that
   would get DMA/compute overlap for free from Pallas' block pipeline):
   Mosaic lowers `lax.gather` ONLY as `tpu.dynamic_gather` on a 2D
   operand with indices.shape == operand.shape
   (jax/_src/pallas/mosaic/lowering.py:2464-2525), i.e. the
   `jnp.take_along_axis` form. Measured on jax 0.9.0 / v5e: it is
   **tile-local** — axis=1 within 128 lanes and axis=0 within 8
   sublanes compile and return correct values; the same op at
   [8, 65536] (axis=1) or [4096, 128] (axis=0) extents dies inside the
   Mosaic compiler. A 2^19-entry hash level cannot be vector-gathered
   from VMEM, so the free-pipelining design is inexpressible.

2. **Per-row dynamic-index DMA** (`make_async_copy(tbl.at[idx[i]], ...)`
   — the one dynamic-index fetch Mosaic does express): measured at
   **~306 ns/row for 512-byte rows** (depth-8 pipelined issue loop,
   steady state), vs XLA's native gather at **7.2 ns per 4-byte index**
   (docs/PERF.md forward attribution). Even if one DMA row carried all
   8 corners of a cell (the dense-level layout), 306 ns/cell loses to
   8 x 7.2 = 58 ns by 5x; at the hashed levels' 4-byte entries it loses
   by 42x. 32-byte rows fail to lower at all. DMA descriptor issue --
   from the same scalar core that would run the "overlapped" compute --
   costs more than the gathers it would hide.

3. Corollary: on v5e the gather issue rate IS the wall. Gathers execute
   on the core's single instruction stream (which is why XLA shows no
   overlap against them, PERF.md step attribution), and the only
   Mosaic-expressible alternative fetch path is 5-42x slower per row.
   The ~38% non-gather step time cannot be hidden behind them by hand
   scheduling; the remaining levers are gather-volume reduction (done:
   dense promotion, k-corner backward, fwd-corner dithering) — not
   scheduling.

Usage:
  python benchmarks/micro_pallas_gather.py            # compile probes only
  python benchmarks/micro_pallas_gather.py --run      # + run/verify/time
Writes benchmarks/pallas_gather.json with the measured numbers.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = pathlib.Path(__file__).parent / "pallas_gather.json"

C_DMA = 2048  # rows per DMA-probe call
DEPTH = 8     # DMA pipeline depth


# -- part 1: dynamic_gather extents ------------------------------------------


def _take_along_axis_probe(shape: tuple[int, int], axis: int):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    def fn(x, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i)

    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    idx = rng.integers(0, shape[axis], size=shape, dtype=np.int32)
    try:
        out = np.asarray(jax.jit(fn)(jnp.asarray(x), jnp.asarray(idx)))
        ok = bool(np.array_equal(out, np.take_along_axis(x, idx, axis=axis)))
        return {"status": "ok", "correct": ok}
    except Exception as e:  # noqa: BLE001 — the failure class is the datum
        return {"status": "fails", "error": f"{type(e).__name__}: {str(e)[:160]}"}


# -- part 2: per-row dynamic-index DMA ---------------------------------------


def _dma_gather_fn(row_w: int, T: int):
    def kernel(idx_ref, tbl_ref, out_ref, sem):
        def get_dma(slot, i):
            return pltpu.make_async_copy(
                tbl_ref.at[idx_ref[i]], out_ref.at[i], sem.at[slot]
            )

        def body(i, _):
            get_dma(i % DEPTH, i).start()

            @pl.when(i >= DEPTH - 1)
            def _():
                j = i - (DEPTH - 1)
                get_dma(j % DEPTH, j).wait()

            return 0

        jax.lax.fori_loop(0, C_DMA, body, 0)

        def drain(j, _):
            get_dma(j % DEPTH, j).wait()
            return 0

        jax.lax.fori_loop(C_DMA - DEPTH + 1, C_DMA, drain, 0)

    def fn(idx, tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C_DMA, row_w), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, tbl)

    return fn


def _dma_probe(row_w: int, run: bool) -> dict:
    T = 1 << 17
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(T, row_w)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, size=(C_DMA,), dtype=np.int32))
    try:
        fn = jax.jit(_dma_gather_fn(row_w, T))
        out = fn(idx, tbl)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        return {"status": "fails", "error": f"{type(e).__name__}: {str(e)[:160]}"}
    res = {
        "status": "ok",
        "correct": bool(
            np.array_equal(np.asarray(out), np.asarray(tbl)[np.asarray(idx)])
        ),
    }
    if run:
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            out = fn(idx, tbl)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        res["us_per_call"] = round(dt * 1e6, 1)
        res["ns_per_row"] = round(dt / C_DMA * 1e9, 1)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    args = ap.parse_args()

    print(f"devices={jax.devices()}")
    results = {"device": str(jax.devices()[0]), "jax": jax.__version__}

    extents = {}
    for name, shape, axis in [
        ("axis1_in_tile_8x128", (8, 128), 1),
        ("axis0_in_tile_8x128", (8, 128), 0),
        ("axis1_wide_8x65536", (8, 65536), 1),
        ("axis0_tall_4096x128", (4096, 128), 0),
    ]:
        extents[name] = _take_along_axis_probe(shape, axis)
        print(f"  dynamic_gather {name}: {extents[name]}")
    results["dynamic_gather_extents"] = extents

    dma = {}
    for row_w in (8, 128):
        dma[f"row_w{row_w}"] = _dma_probe(row_w, args.run)
        print(f"  dma row_w={row_w}: {dma[f'row_w{row_w}']}")
    results["per_row_dma"] = dma
    results["xla_gather_ns_per_idx"] = 7.2  # docs/PERF.md forward attribution

    OUT.write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
