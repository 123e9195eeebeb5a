"""Probe 2: dynamic ref writes on axis 0, scratch refs, and sublane-axis
dynamic ref reads (run on the real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(build, name):
    try:
        out = np.asarray(jax.jit(build)())
        print(f"{name}: OK")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    n, b, TL = 32, 8, 128
    A = jnp.asarray(np.random.randn(n, b, TL), jnp.float32)

    # 1. dynamic ref WRITE on axis 0
    def k_wr(a_ref, o_ref):
        def body(i, _):
            o_ref[i] = a_ref[i] * 2.0
            return 0

        lax.fori_loop(0, n, body, 0)

    out = run(
        lambda: pl.pallas_call(
            k_wr,
            out_shape=jax.ShapeDtypeStruct((n, b, TL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(A),
        "dyn ref write axis0",
    )
    if out is not None:
        np.testing.assert_allclose(out, np.asarray(A) * 2.0, rtol=1e-6)
        print("  numeric OK")

    # 2. scratch VMEM ref with dynamic read+write
    def k_scratch(a_ref, o_ref, s_ref):
        def body(i, _):
            s_ref[i] = a_ref[i] + 1.0
            return 0

        lax.fori_loop(0, n, body, 0)

        def body2(i, acc):
            return acc + s_ref[i]

        o_ref[:] = lax.fori_loop(0, n, body2, jnp.zeros((b, TL), jnp.float32))

    out = run(
        lambda: pl.pallas_call(
            k_scratch,
            out_shape=jax.ShapeDtypeStruct((b, TL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, b, TL), jnp.float32)],
        )(A),
        "scratch dyn rw",
    )
    if out is not None:
        np.testing.assert_allclose(out, (np.asarray(A) + 1.0).sum(0), rtol=1e-5)
        print("  numeric OK")

    # 3. dynamic ref read on the SUBLANE axis (axis 1 of (n, b, TL))
    def k_sub(a_ref, o_ref):
        def body(j, acc):
            return acc + a_ref[:, j]  # (n, TL)

        o_ref[:] = lax.fori_loop(0, b, body, jnp.zeros((n, TL), jnp.float32))

    out = run(
        lambda: pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((n, TL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(A),
        "dyn ref read sublane",
    )
    if out is not None:
        np.testing.assert_allclose(out, np.asarray(A).sum(1), rtol=1e-5)
        print("  numeric OK")

    # 4. dynamic ref read of a 2D row block: a_ref[pl.ds(i*8, 8)] style
    def k_blk(a_ref, o_ref):
        def body(i, acc):
            blk = a_ref[pl.ds(i * 8, 8)]  # (8, b, TL)
            return acc + jnp.sum(blk, axis=0)

        o_ref[:] = lax.fori_loop(0, n // 8, body, jnp.zeros((b, TL), jnp.float32))

    out = run(
        lambda: pl.pallas_call(
            k_blk,
            out_shape=jax.ShapeDtypeStruct((b, TL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(A),
        "dyn ref block read axis0",
    )
    if out is not None:
        np.testing.assert_allclose(out, np.asarray(A).sum(0), rtol=1e-5)
        print("  numeric OK")


if __name__ == "__main__":
    main()
