#!/usr/bin/env python
"""Component-level factor microbench: where do the current and ref-based
factorizations spend time?  Variants time the M-build (Gram), the
Cholesky, and the inverse+LtL in isolation, each via in-kernel K
repetition with an (n, TL) checksum carry."""

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
    ap.add_argument(
        "--variants",
        type=str,
        default="m_cur,m_v3,chol_cur,chol_v3,inv_cur,inv_v3",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from sqp_solver_tpu.ops.qp_kernel import (
        _chol_blocked,
        _ltl_blocked,
        _t_atb,
        _tri_inv_blocked,
    )

    n, B = args.n, args.B
    m = n + 1
    TL = 128
    dtype = jnp.float32
    K = 5

    def eye3():
        row_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        col_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
        return (row_i == col_i).astype(dtype)

    iota_col = lambda: lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    # ---------------- M build -------------------------------------------
    def k_m_cur(P_ref, A_ref, rho_ref, out_ref, *, K):
        P, A, rho = P_ref[:], A_ref[:], rho_ref[:]
        eye_n = eye3()

        def body(i, acc):
            SA = A * (rho * (1.0 + 1e-3 * i.astype(dtype)))[:, None, :]
            M = P + 1e-6 * eye_n + _t_atb(A, SA)
            return acc + jnp.sum(M, axis=1)

        out_ref[...] = lax.fori_loop(0, K, body, jnp.zeros((n, TL), dtype))

    def k_m_v3(P_ref, A_ref, rho_ref, out_ref, at_ref, w_ref, *, K):
        A, rho = A_ref[:], rho_ref[:]
        at_ref[...] = jnp.swapaxes(A, 0, 1)
        ic = iota_col()

        def body(i, acc):
            SA = A * (rho * (1.0 + 1e-3 * i.astype(dtype)))[:, None, :]

            def m_row(r, _):
                a_r = at_ref[r]
                contrib = jnp.sum(a_r[:, None, :] * SA, axis=0)
                e_r = (ic == r).astype(dtype)
                w_ref[r] = P_ref[r] + 1e-6 * e_r + contrib
                return 0

            lax.fori_loop(0, n, m_row, 0)
            return acc + jnp.sum(w_ref[...], axis=1)

        out_ref[...] = lax.fori_loop(0, K, body, jnp.zeros((n, TL), dtype))

    # ---------------- Cholesky ------------------------------------------
    def k_chol_cur(P_ref, A_ref, rho_ref, out_ref, *, K):
        P = P_ref[:]
        eye_n = eye3()

        def body(i, acc):
            M = P + (1e-3 * i.astype(dtype)) * eye_n
            L, _ = _chol_blocked(M)
            return acc + jnp.sum(L, axis=1)

        out_ref[...] = lax.fori_loop(0, K, body, jnp.zeros((n, TL), dtype))

    def k_chol_v3(P_ref, A_ref, rho_ref, out_ref, w_ref, lt_ref, lr_ref, *, K):
        P = P_ref[:]
        eye_n = eye3()

        def body(i, acc):
            w_ref[...] = P + (1e-3 * i.astype(dtype)) * eye_n
            cb = 32
            for r0 in range(0, n, cb):
                b = min(cb, n - r0)
                nb = n - r0
                Pan = w_ref[r0:n, r0 : r0 + b]
                cols_i = lax.broadcasted_iota(jnp.int32, (nb, b, 1), 1)
                rows_i = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

                def col_step(j, carry, r0=r0, b=b, cols_i=cols_i, rows_i=rows_i):
                    Pan, fail = carry
                    colj = jnp.sum(Pan * (cols_i == j).astype(dtype), axis=1)
                    dj = jnp.sum(
                        colj * (rows_i == j).astype(dtype), axis=0, keepdims=True
                    )
                    djc = jnp.maximum(dj, 1e-30)
                    lcol = jnp.where(
                        rows_i > j, colj * lax.rsqrt(djc), 0.0
                    ) + jnp.where(rows_i == j, jnp.sqrt(djc), 0.0)
                    Pan = Pan - lcol[:, None, :] * lcol[:b][None, :, :]
                    if r0:
                        full = jnp.concatenate(
                            [jnp.zeros((r0, TL), dtype), lcol], axis=0
                        )
                    else:
                        full = lcol
                    lt_ref[r0 + j] = full
                    lr_ref[:, r0 + j] = full
                    return Pan, fail

                Pan, _ = lax.fori_loop(
                    0, b, col_step, (Pan, jnp.zeros((1, TL), dtype))
                )
                r = n - r0 - b
                if r > 0:
                    T22 = w_ref[r0 + b : n, r0 + b : n]

                    def upd(k, T22, r0=r0, b=b):
                        ct = lt_ref[r0 + k][r0 + b :]
                        return T22 - ct[:, None, :] * ct[None, :, :]

                    T22 = lax.fori_loop(0, b, upd, T22)
                    w_ref[r0 + b : n, r0 + b : n] = T22
            return acc + jnp.sum(lt_ref[...], axis=1)

        out_ref[...] = lax.fori_loop(0, K, body, jnp.zeros((n, TL), dtype))

    # ---------------- inverse + LtL -------------------------------------
    def k_inv_cur(P_ref, A_ref, rho_ref, out_ref, *, K):
        P = P_ref[:]
        eye_n = eye3()
        L0, _ = _chol_blocked(P + eye_n)

        def body(i, acc):
            L = L0 + (1e-3 * i.astype(dtype)) * eye_n
            Li = _tri_inv_blocked(L)
            Minv = _ltl_blocked(Li)
            return acc + jnp.sum(Minv, axis=1)

        out_ref[...] = lax.fori_loop(0, K, body, jnp.zeros((n, TL), dtype))

    def k_inv_v3(P_ref, A_ref, rho_ref, out_ref, w_ref, lr_ref, li_ref, lc_ref, *, K):
        P = P_ref[:]
        eye_n = eye3()
        L0, _ = _chol_blocked(P + eye_n)
        ic = iota_col()
        li_ref[...] = jnp.zeros((n, n, TL), dtype)

        def body(i, acc):
            lr_ref[...] = L0 + (1e-3 * i.astype(dtype)) * eye_n

            def inv_row(r, _):
                lrow = lr_ref[r]
                ljj = jnp.sum(lrow * (ic == r).astype(dtype), axis=0, keepdims=True)
                lrow_s = jnp.where(ic < r, lrow, 0.0)
                acc2 = jnp.sum(lrow_s[:, None, :] * li_ref[...], axis=0)
                e_r = (ic == r).astype(dtype)
                row_r = (e_r - acc2) / jnp.maximum(ljj, 1e-30)
                li_ref[r] = row_r
                lc_ref[:, r] = row_r  # Li columns for the LtL pass
                return 0

            lax.fori_loop(0, n, inv_row, 0)

            # Minv rows: Minv[i, :] = sum_k Li[k, i] * Li[k, :]
            def ltl_row(r, _):
                col_r = lc_ref[r]  # (n, TL): Li[:, r]
                w_ref[r] = jnp.sum(col_r[:, None, :] * li_ref[...], axis=0)
                return 0

            lax.fori_loop(0, n, ltl_row, 0)
            return acc + jnp.sum(w_ref[...], axis=1)

        out_ref[...] = lax.fori_loop(0, K, body, jnp.zeros((n, TL), dtype))

    SCRATCH = {
        "m_cur": [],
        "m_v3": [pltpu.VMEM((n, m, TL), dtype), pltpu.VMEM((n, n, TL), dtype)],
        "chol_cur": [],
        "chol_v3": [pltpu.VMEM((n, n, TL), dtype)] * 3,
        "inv_cur": [],
        "inv_v3": [pltpu.VMEM((n, n, TL), dtype)] * 4,
    }
    KERNELS = {
        "m_cur": k_m_cur, "m_v3": k_m_v3, "chol_cur": k_chol_cur,
        "chol_v3": k_chol_v3, "inv_cur": k_inv_cur, "inv_v3": k_inv_v3,
    }

    def build(variant, K):
        kern = functools.partial(KERNELS[variant], K=K)

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
            out_specs=spec(n),
            out_shape=jax.ShapeDtypeStruct((n, B), dtype),
            scratch_shapes=SCRATCH[variant],
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

    inp0 = jax.jit(make_inputs)(jax.random.PRNGKey(42))
    _ = np.asarray(inp0[0])

    for variant in args.variants.split(","):
        t1 = None
        for KK in (1, K):
            f = jax.jit(build(variant, KK))
            t0 = time.perf_counter()
            _ = np.asarray(f(*inp0))
            log(f"  [{variant} K={KK}] compile+first: {time.perf_counter()-t0:.1f}s")
            ts = []
            for rep in range(1, 4):
                inp = jax.jit(make_inputs)(jax.random.PRNGKey(rep))
                _ = np.asarray(inp[0])
                t0 = time.perf_counter()
                _ = np.asarray(f(*inp))
                ts.append(time.perf_counter() - t0)
            if KK == 1:
                t1 = min(ts)
            else:
                per = (min(ts) - t1) / (K - 1)
                log(f"  [{variant}] -> {per*1e3:.2f} ms/rep (B={B})")


if __name__ == "__main__":
    main()
