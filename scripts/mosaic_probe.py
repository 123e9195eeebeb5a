"""Probe Mosaic lowering support for primitives the factorization rewrite
wants (run on the real TPU):

1. lax.dynamic_index_in_dim with a traced index on axis 0 (outer, untiled)
   of an (n, b, TL) value inside a fori_loop;
2. lax.dynamic_update_index_in_dim on axis 0 likewise;
3. jnp.swapaxes(A, 0, 1) of an (m, n, TL) value (outer <-> sublane);
4. contraction as axis-0 FMA loop vs axis-1 (sublane) reduce — timing.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(kernel, out_shape, *args, name=""):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(f)(*args)
        out = np.asarray(out)
        print(f"{name}: OK")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    n, b, TL = 32, 8, 128
    A = jnp.asarray(np.random.randn(n, b, TL), jnp.float32)

    # 1. dynamic read on axis 0
    def k_read(a_ref, o_ref):
        a = a_ref[:]

        def body(i, acc):
            row = lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False)  # (b, TL)
            return acc + row

        o_ref[:] = lax.fori_loop(0, n, body, jnp.zeros((b, TL), jnp.float32))

    out = run(k_read, jax.ShapeDtypeStruct((b, TL), jnp.float32), A, name="dyn read axis0")
    if out is not None:
        np.testing.assert_allclose(out, np.asarray(A).sum(0), rtol=1e-6)
        print("  numeric OK")

    # 2. dynamic write on axis 0
    def k_write(a_ref, o_ref):
        a = a_ref[:]

        def body(i, acc):
            row = lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False) * 2.0
            return lax.dynamic_update_index_in_dim(acc, row, i, axis=0)

        o_ref[:] = lax.fori_loop(0, n, body, jnp.zeros((n, b, TL), jnp.float32))

    out = run(k_write, jax.ShapeDtypeStruct((n, b, TL), jnp.float32), A, name="dyn write axis0")
    if out is not None:
        np.testing.assert_allclose(out, np.asarray(A) * 2.0, rtol=1e-6)
        print("  numeric OK")

    # 3. swapaxes(0, 1)
    def k_swap(a_ref, o_ref):
        o_ref[:] = jnp.swapaxes(a_ref[:], 0, 1)

    out = run(k_swap, jax.ShapeDtypeStruct((b, n, TL), jnp.float32), A, name="swapaxes01")
    if out is not None:
        np.testing.assert_allclose(out, np.asarray(A).swapaxes(0, 1), rtol=1e-6)
        print("  numeric OK")

    # 4. dynamic read from the REF (not the value)
    def k_readref(a_ref, o_ref):
        def body(i, acc):
            row = a_ref[i]  # (b, TL)
            return acc + row

        o_ref[:] = lax.fori_loop(0, n, body, jnp.zeros((b, TL), jnp.float32))

    out = run(k_readref, jax.ShapeDtypeStruct((b, TL), jnp.float32), A, name="dyn read ref axis0")
    if out is not None:
        np.testing.assert_allclose(out, np.asarray(A).sum(0), rtol=1e-6)
        print("  numeric OK")


if __name__ == "__main__":
    main()
