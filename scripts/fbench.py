#!/usr/bin/env python
"""Factorization/iteration kernel microbench at the north-star shape
(n=128, m=129, TL=128, 8-tile grid over B=1024).

Marginal cost per factorization / per ADMM chunk via IN-KERNEL repetition
(fori over K with perturbed inputs), so neither the relay dispatch floor
nor output-fetch cost pollutes the number.  The K-loop carries only an
(n, TL) checksum (a full (n, n, TL) carry adds ~50 MB of register spills
and OOMs VMEM).  Correctness of each factor variant is checked separately
against the XLA inverse."""

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
    ap.add_argument("--variants", type=str, default="current,v3,iters")
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

    def iota_eye():
        row_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        col_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
        return (row_i == col_i).astype(dtype)

    # ---- kernels -----------------------------------------------------------
    def k_current(P_ref, A_ref, rho_ref, out_ref, *, K, full):
        P = P_ref[:]
        A = A_ref[:]
        rho = rho_ref[:]
        eye_n = iota_eye()

        def body(i, acc):
            rho_k = rho * (1.0 + 1e-3 * i.astype(dtype))
            Minv, _ = _factor_schur(P, A, rho_k, 1e-6, eye_n)
            if full:
                out_ref[...] = Minv
                return acc
            return acc + jnp.sum(Minv, axis=1)

        acc = lax.fori_loop(0, K, body, jnp.zeros((n, TL), dtype))
        if not full:
            out_ref[...] = acc

    def k_v3(P_ref, A_ref, rho_ref, out_ref, w_ref, l_ref, li_ref, *, K, full):
        A = A_ref[:]
        rho = rho_ref[:]

        def body(i, acc):
            rho_k = rho * (1.0 + 1e-3 * i.astype(dtype))
            SA = A * rho_k[:, None, :]
            _ = _factor_schur_refs(
                lambda r: P_ref[r],
                lambda c: A_ref[:, c],
                SA, 1e-6, w_ref, l_ref, li_ref,
            )
            if full:
                out_ref[...] = w_ref[...]
                return acc
            return acc + jnp.sum(w_ref[...], axis=1)

        acc = lax.fori_loop(0, K, body, jnp.zeros((n, TL), dtype))
        if not full:
            out_ref[...] = acc

    def k_iters(P_ref, A_ref, rho_ref, out_ref, *, K, full):
        """One factor, then K chunks of 25 ADMM iterations (q perturbed
        per chunk) — isolates the per-iteration cost."""
        del full
        P = P_ref[:]
        A = A_ref[:]
        rho = rho_ref[:]
        eye_n = iota_eye()
        Minv, _ = _factor_schur(P, A, rho, 1e-6, eye_n)
        rho_vec = rho * jnp.ones((m, TL), dtype)
        rho_inv = 1.0 / rho_vec
        q = jnp.sum(A, axis=0)  # (n, TL) arbitrary
        l = jnp.full((m, TL), -1.0, dtype)
        u = jnp.full((m, TL), 1.0, dtype)

        def admm_iter(x, z, y, qk):
            rhs2 = rho_vec * z - y
            b = 1e-6 * x - qk + jnp.sum(A * rhs2[:, None, :], axis=0)
            xt = jnp.sum(Minv * b[None, :, :], axis=1)
            zt = jnp.sum(A * xt[None, :, :], axis=1)
            xn = 1.6 * xt + (1.0 - 1.6) * x
            z_pre = 1.6 * zt + (1.0 - 1.6) * z
            zn = jnp.clip(z_pre + rho_inv * y, l, u)
            yn = y + rho_vec * (z_pre - zn)
            return xn, zn, yn

        def chunk(i, carry):
            x, z, y = carry
            qk = q * (1.0 + 1e-3 * i.astype(dtype))

            def it(_, xzy):
                return admm_iter(*xzy, qk)

            return lax.fori_loop(0, 25, it, (x, z, y))

        x, z, y = lax.fori_loop(
            0, K, chunk,
            (jnp.zeros((n, TL), dtype), jnp.zeros((m, TL), dtype),
             jnp.zeros((m, TL), dtype)),
        )
        out_ref[...] = x

    KERNELS = {"current": (k_current, False), "v3": (k_v3, True),
               "iters": (k_iters, False)}

    def build(variant, K, full=False):
        kern_fn, needs_scratch = KERNELS[variant]
        kern = functools.partial(kern_fn, K=K, full=full)
        scratch = (
            [
                pltpu.VMEM((n, n, TL), dtype),
                pltpu.VMEM((n, n, TL), dtype),
                pltpu.VMEM((n, n, TL), dtype),
            ]
            if needs_scratch
            else []
        )

        def spec(*lead):
            return pl.BlockSpec(
                lead + (TL,),
                lambda i: (0,) * len(lead) + (i,),
                memory_space=pltpu.VMEM,
            )

        out_spec = spec(n, n) if full else spec(n)
        out_shape = jax.ShapeDtypeStruct(
            ((n, n, B) if full else (n, B)), dtype
        )
        return pl.pallas_call(
            kern,
            grid=(B // TL,),
            in_specs=[spec(n, n), spec(m, n), spec(1)],
            out_specs=out_spec,
            out_shape=out_shape,
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

    inp0 = jax.jit(make_inputs)(jax.random.PRNGKey(42))
    _ = np.asarray(inp0[0])

    def xla_minv(P, A, rho):
        Pb = jnp.moveaxis(P, -1, 0)
        Ab = jnp.moveaxis(A, -1, 0)
        r = rho[0][:, None]
        M = Pb + (1e-6 + 1e-3 * 0.0) * jnp.eye(n) + jnp.einsum(
            "bmi,bmj->bij", Ab * r[:, :, None] * jnp.ones((1, m, 1)), Ab,
            precision=lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(jnp.linalg.inv(M), 0, -1)

    ref = None
    for variant in args.variants.split(","):
        if variant in ("current", "v3"):
            fc = jax.jit(build(variant, 1, full=True))
            t0 = time.perf_counter()
            out = np.asarray(fc(*inp0))
            log(f"  [{variant} full] compile+first: {time.perf_counter()-t0:.1f}s")
            if ref is None:
                ref = np.asarray(jax.jit(xla_minv)(*inp0))
            log(f"  [{variant}] max |Minv - inv(M)| = {np.abs(out-ref).max():.2e}")
        t1 = None
        for K in (1, 5):
            f = jax.jit(build(variant, K))
            t0 = time.perf_counter()
            _ = np.asarray(f(*inp0))
            log(f"  [{variant} K={K}] compile+first: {time.perf_counter()-t0:.1f}s")
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
                per = (min(ts) - t1) / 4.0
                unit = "25-iter chunk" if variant == "iters" else "factor"
                log(
                    f"  [{variant}] K=1 {t1*1e3:.1f}ms K=5 {min(ts)*1e3:.1f}ms"
                    f" -> {per*1e3:.2f} ms/{unit} (B={B})"
                )


if __name__ == "__main__":
    main()
