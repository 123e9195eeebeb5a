"""Probe 3: dynamic sublane-axis ref WRITE, two-axis dynamic ref read,
fori_loop with traced bounds, inside Pallas TPU kernels."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(build, name, check=None):
    try:
        out = np.asarray(jax.jit(build)())
        print(f"{name}: OK")
        if check is not None:
            np.testing.assert_allclose(out, check, rtol=2e-5)
            print("  numeric OK")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    n, b, TL = 32, 8, 128
    rng = np.random.default_rng(0)
    A_np = rng.standard_normal((n, b, TL)).astype(np.float32)
    A = jnp.asarray(A_np)

    # 1. dynamic sublane-axis ref write: o_ref[:, j] = v
    def k1(a_ref, o_ref):
        def body(j, _):
            o_ref[:, j] = a_ref[:, j] * 3.0
            return 0

        lax.fori_loop(0, b, body, 0)

    run(
        lambda: pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((n, b, TL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(A),
        "dyn sublane ref write",
        check=A_np * 3.0,
    )

    # 2. two-axis dynamic ref read: a_ref[i, j] -> (TL,)
    def k2(a_ref, o_ref):
        def body(i, acc):
            v = a_ref[i, i % b]  # (TL,)
            return acc + v

        o_ref[:] = lax.fori_loop(0, n, body, jnp.zeros((TL,), jnp.float32))[None, :]

    want = np.zeros((TL,), np.float32)
    for i in range(n):
        want += A_np[i, i % b]
    run(
        lambda: pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((1, TL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(A),
        "two-axis dyn ref read",
        check=want[None, :],
    )

    # 3. fori_loop with traced (dynamic) trip bound inside a fori
    def k3(a_ref, o_ref):
        def outer(j, acc):
            def inner(k, acc2):
                return acc2 + a_ref[k]

            return acc + lax.fori_loop(0, j, inner, jnp.zeros((b, TL), jnp.float32))

        o_ref[:] = lax.fori_loop(0, 4, outer, jnp.zeros((b, TL), jnp.float32))

    want3 = np.zeros((b, TL), np.float32)
    for j in range(4):
        for k in range(j):
            want3 += A_np[k]
    run(
        lambda: pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((b, TL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(A),
        "dynamic-bound fori",
        check=want3,
    )

    # 4. dynamic block-row ref write: o_ref[pl.ds(i*8, 8)] = blk
    def k4(a_ref, o_ref):
        def body(i, _):
            o_ref[pl.ds(i * 8, 8)] = a_ref[pl.ds(i * 8, 8)] + 1.0
            return 0

        lax.fori_loop(0, n // 8, body, 0)

    run(
        lambda: pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((n, b, TL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(A),
        "dyn block ref write",
        check=A_np + 1.0,
    )


if __name__ == "__main__":
    main()
