#!/usr/bin/env python
"""Factorization-kernel microbench: current `_factor_schur` vs the
ref-based rewrite, at the north-star shape (n=128, m=129, TL=128, 8-tile
grid).  Marginal cost per factorization via IN-KERNEL repetition (fori
over K factors with perturbed rho), so neither the relay dispatch floor
nor operand pipelining pollutes the number.  Also checks numerics of each
variant against the XLA inverse."""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--variants", type=str, default="current,v3")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from sqp_solver_tpu.ops.qp_kernel import _factor_schur, _factor_schur_refs

    n, B = args.n, args.B
    m = n + 1
    TL = 128
    dtype = jnp.float32

    def kernel_current(P_ref, A_ref, rho_ref, out_ref, *, K):
        P = P_ref[:]
        A = A_ref[:]
        rho = rho_ref[:]
        row_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        col_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
        eye_n = (row_i == col_i).astype(dtype)

        def body(i, acc):
            rho_k = rho * (1.0 + 1e-3 * i.astype(dtype))
            Minv, fail = _factor_schur(P, A, rho_k, 1e-6, eye_n)
            return acc + Minv

        out_ref[:] = lax.fori_loop(0, K, body, jnp.zeros((n, n, TL), dtype))

    def kernel_v3(P_ref, A_ref, rho_ref, out_ref, at_ref, w_ref, lt_ref,
                  lr_ref, li_ref, *, K):
        A = A_ref[:]
        rho = rho_ref[:]

        def body(i, acc):
            rho_k = rho * (1.0 + 1e-3 * i.astype(dtype))
            Minv, fail = _factor_schur_refs(
                P_ref, A, rho_k, 1e-6, at_ref, w_ref, lt_ref, lr_ref, li_ref
            )
            return acc + Minv

        out_ref[:] = lax.fori_loop(0, K, body, jnp.zeros((n, n, TL), dtype))

    def build(variant, K):
        if variant == "current":
            kern = functools.partial(kernel_current, K=K)
            scratch = []
        else:
            kern = functools.partial(kernel_v3, K=K)
            scratch = [
                pltpu.VMEM((n, m, TL), dtype),   # At
                pltpu.VMEM((n, n, TL), dtype),   # M work
                pltpu.VMEM((n, n, TL), dtype),   # L columns
                pltpu.VMEM((n, n, TL), dtype),   # L rows
                pltpu.VMEM((n, n, TL), dtype),   # Li rows
            ]

        def spec(*lead):
            return pl.BlockSpec(
                lead + (TL,),
                lambda i: (0,) * len(lead) + (i,),
                memory_space=pltpu.VMEM,
            )

        return pl.pallas_call(
            kern,
            grid=(B // TL,),
            in_specs=[spec(n, n), spec(m, n), spec(1)],
            out_specs=spec(n, n),
            out_shape=jax.ShapeDtypeStruct((n, n, B), dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024
            ),
        )

    def make_inputs(key):
        ks = jax.random.split(key, 3)
        G = jax.random.normal(ks[0], (n, n, B), dtype) / np.sqrt(n)
        eye = jnp.eye(n, dtype=dtype)[:, :, None]
        P = jnp.einsum("kib,kjb->ijb", G, G) + eye
        A = jax.random.normal(ks[1], (m, n, B), dtype) / np.sqrt(m)
        rho = jnp.full((1, B), 0.1, dtype)
        return P, A, rho

    # numeric reference for K=1 (sum of one factor = Minv at rho*(1+0))
    inp0 = jax.jit(make_inputs)(jax.random.PRNGKey(42))
    _ = np.asarray(inp0[0])

    def xla_minv(P, A, rho):
        Pb = jnp.moveaxis(P, -1, 0)
        Ab = jnp.moveaxis(A, -1, 0)
        rb = jnp.moveaxis(rho, -1, 0)
        M = Pb + 1e-6 * jnp.eye(n) + jnp.einsum(
            "bmi,bm,bmj->bij", Ab, jnp.broadcast_to(rb, (B, 1))[:, 0][:, None] * jnp.ones((B, m)), Ab,
            precision=lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(jnp.linalg.inv(M), 0, -1)

    ref = None

    for variant in args.variants.split(","):
        for K in (1, 5):
            f = jax.jit(build(variant, K))
            t0 = time.perf_counter()
            out = np.asarray(f(*inp0))
            log(f"  [{variant} K={K}] compile+first: {time.perf_counter()-t0:.1f}s")
            if K == 1:
                if ref is None:
                    Mi = np.asarray(jax.jit(xla_minv)(*inp0))
                    ref = Mi
                err = np.abs(out - ref).max()
                log(f"  [{variant}] max |Minv - inv(M)| = {err:.2e}")
            ts = []
            for rep in range(1, 4):
                inp = jax.jit(make_inputs)(jax.random.PRNGKey(rep))
                _ = np.asarray(inp[0])
                t0 = time.perf_counter()
                _ = np.asarray(f(*inp))
                ts.append(time.perf_counter() - t0)
            if K == 1:
                t1 = min(ts)
            else:
                tK = min(ts)
                per = (tK - t1) / 4.0
                log(
                    f"  [{variant}] K=1 {t1*1e3:.1f}ms K=5 {tK*1e3:.1f}ms -> "
                    f"{per*1e3:.2f} ms/factor (B={B}; bound ~5ms)"
                )


if __name__ == "__main__":
    main()
