"""Probe which Mosaic lowering patterns work for the one-hot grad kernel:
reshape across tiles, transpose, dot_general contracting dim 0.
"""

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


def probe(name, kernel, out_shape, *args, **kw):
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape, **kw)(*args)
        np.asarray(out).ravel()[:1]
        print(f"  {name:28s} OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:140]
        print(f"  {name:28s} FAIL: {type(e).__name__}: {msg}")
        return False


def main():
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2**19, (8, 128), np.int32))
    a = jnp.asarray(np.random.default_rng(1).normal(size=(128, 512)).astype(np.float32))
    b = jnp.asarray(np.random.default_rng(2).normal(size=(128, 128)).astype(np.float32))

    def k_reshape(x_ref, o_ref):
        v = x_ref[:].reshape(1024)
        o_ref[:] = (v[None, :] & 127).astype(jnp.float32)

    probe(
        "reshape (8,128)->(1024,)",
        k_reshape,
        jax.ShapeDtypeStruct((1, 1024), jnp.float32),
        x,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def k_transpose(x_ref, o_ref):
        o_ref[:] = x_ref[:].T.astype(jnp.float32)

    probe(
        "transpose (8,128)->(128,8)",
        k_transpose,
        jax.ShapeDtypeStruct((128, 8), jnp.float32),
        x,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def k_dot_dim0(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    probe(
        "dot contract dim0 (f32)",
        k_dot_dim0,
        jax.ShapeDtypeStruct((512, 128), jnp.float32),
        a, b,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def k_dot_dim0_bf16(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16),
            b_ref[:].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    probe(
        "dot contract dim0 (bf16)",
        k_dot_dim0_bf16,
        jax.ShapeDtypeStruct((512, 128), jnp.float32),
        a, b,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def k_onehot_row(x_ref, o_ref):
        # broadcast a [1,128] lane-vector row against sublane iota
        hi = (x_ref[0:1, :] >> 7).astype(jnp.int32)  # [1, 128]
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        o_ref[:] = (rows == hi).astype(jnp.float32)  # [512, 128]

    probe(
        "one-hot row bcast [1,128]",
        k_onehot_row,
        jax.ShapeDtypeStruct((512, 128), jnp.float32),
        x,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def k_col_slice(x_ref, o_ref):
        # take a [128,1] sublane-vector column from a transposed block and
        # broadcast against lane iota
        xt = x_ref[:].T  # [128, 8]
        col = (xt[:, 0:1] >> 7).astype(jnp.int32)  # [128, 1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 512), 1)
        o_ref[:] = (lanes == col).astype(jnp.float32)

    probe(
        "transpose+col one-hot",
        k_col_slice,
        jax.ShapeDtypeStruct((128, 512), jnp.float32),
        x,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


if __name__ == "__main__":
    main()
