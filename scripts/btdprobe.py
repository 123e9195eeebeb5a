"""De-risk probe for the structured (block-tridiagonal) whole-solve kernel.

Checks the Mosaic patterns the kernel needs, on the real chip:
  P1. pl.ds(traced_start, static_size) READ and WRITE on the outer axis
      of an (n, b, TL) scratch ref (the Li/F block stores).
  P2. pl.ds(traced_start, static_size) READ on the sublane axis of an
      (m, n, TL) input ref, 8-aligned starts (the A block reads).
  P3. single dynamic sublane index A_ref[:, o + j] with o, j both traced
      (the Gram column reads).
  P4. staging a value into an (n, TL) scratch and reading traced-start
      sublane slices back (the per-iteration sweep pattern).
Prints max abs error vs a numpy reference and PASS/FAIL.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TL = 128
n, m, b = 32, 16, 8
T = n // b


def kernel(A_ref, v_ref, o1_ref, o2_ref, o3_ref, li_ref, vec_ref):
    dtype = A_ref.dtype
    # P4: stage a value into the vector scratch
    vec_ref[...] = jnp.sum(A_ref[...], axis=0)  # (n, TL)

    def blk(k, acc):
        o = k * b
        # P2: sublane-axis dynamic slice of the input ref
        Ak = A_ref[:, pl.ds(o, b)]  # (m, b, TL)

        # P3: single dynamic sublane index with traced o + j
        def col(j, a2):
            aj = A_ref[:, o + j]  # (m, TL)
            return a2 + jnp.sum(aj, axis=0, keepdims=True)

        acc2 = lax.fori_loop(0, b, col, jnp.zeros((1, TL), dtype))
        # P1: outer-axis traced-start slice WRITE of a (b, b, TL) slab
        slab = Ak[:b] + Ak[-b:]  # (b, b, TL)
        li_ref[pl.ds(o, b)] = slab
        # P4: traced-start sublane slice read of the vector scratch
        vk = vec_ref[pl.ds(o, b)]  # (b, TL)
        return acc + acc2 + jnp.sum(vk, axis=0, keepdims=True)

    acc = lax.fori_loop(0, T, blk, jnp.zeros((1, TL), dtype))

    # P1 read-back: outer-axis traced-start slice READ
    def rd(k, s):
        return s + jnp.sum(li_ref[pl.ds(k * b, b)], axis=(0, 1))[None]

    o1_ref[...] = acc
    o2_ref[...] = lax.fori_loop(0, T, rd, jnp.zeros((1, TL), dtype))
    o3_ref[...] = vec_ref[...]


@jax.jit
def run(A, v):
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((m, n, TL), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, TL), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TL), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TL), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, TL), lambda: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, TL), A.dtype),
            jax.ShapeDtypeStruct((1, TL), A.dtype),
            jax.ShapeDtypeStruct((n, TL), A.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, b, TL), A.dtype),
            pltpu.VMEM((n, TL), A.dtype),
        ],
    )(A, v)


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(m, n, TL)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, b, TL)), jnp.float32)
    o1, o2, o3 = run(A, v)
    An = np.asarray(A)
    vec = An.sum(axis=0)  # (n, TL)
    acc = np.zeros((1, TL), np.float32)
    li = np.zeros((n, b, TL), np.float32)
    for k in range(T):
        o = k * b
        for j in range(b):
            acc += An[:, o + j].sum(axis=0, keepdims=True)
        Ak = An[:, o : o + b]
        li[o : o + b] = Ak[:b] + Ak[-b:]
        acc += vec[o : o + b].sum(axis=0, keepdims=True)
    rd = li.sum(axis=(0, 1), keepdims=True)[0]
    e1 = np.max(np.abs(np.asarray(o1) - acc))
    e2 = np.max(np.abs(np.asarray(o2) - rd))
    e3 = np.max(np.abs(np.asarray(o3) - vec))
    print(f"e_acc={e1:.2e} e_li={e2:.2e} e_vec={e3:.2e}")
    print("PROBE", "PASS" if max(e1, e2, e3) < 1e-3 else "FAIL")


if __name__ == "__main__":
    main()
