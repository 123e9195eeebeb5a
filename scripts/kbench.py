#!/usr/bin/env python
"""Microbenchmark of the whole-solve QP kernel at the north-star shape
(n=128, m=129, B=1024, f32): separates factorization cost from per-chunk
ADMM iteration cost by varying the fixed iteration schedule.

Run on the real TPU.  Methodology per CLAUDE.md: fresh PRNG inputs per rep
(the relay memoizes identical dispatches), completion forced with a host
fetch, min over reps, and the ~35-45 ms relay dispatch floor noted.
"""

import argparse
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from sqp_solver_tpu.ops.qp_kernel import sqp_step_kernel
    from sqp_solver_tpu.qp.types import QPSettings

    n, B = args.n, args.B
    m = n + 1
    dtype = jnp.float32

    def make_inputs(key):
        ks = jax.random.split(key, 6)
        G = jax.random.normal(ks[0], (n, n, B), dtype) / np.sqrt(n)
        eye = jnp.eye(n, dtype=dtype)[:, :, None]
        Bt = jnp.einsum("kib,kjb->ijb", G, G) + eye
        Jt = jax.random.normal(ks[1], (m, n, B), dtype)
        gt = jax.random.normal(ks[2], (n, B), dtype)
        ct = jax.random.normal(ks[3], (m, B), dtype)
        lt = ct - 0.5
        ut = ct + 0.5
        st = jnp.zeros((n, B), dtype)
        dgl = jnp.zeros((n, B), dtype)
        ones = jnp.ones((B,), dtype)
        zeros = jnp.zeros((B,), dtype)
        mskt = jnp.stack(
            [zeros, zeros, ones, zeros, zeros, zeros, zeros, zeros], axis=0
        )
        xt = jnp.zeros((n, B), dtype)
        zt = jnp.zeros((m, B), dtype)
        yt = jnp.zeros((m, B), dtype)
        return Bt, Jt, gt, lt, ut, st, dgl, mskt, xt, zt, yt

    def bench(label, settings, flop_note=""):
        f = jax.jit(
            lambda *a: sqp_step_kernel(*a, settings=settings, do_bfgs=False)
        )
        inp = jax.jit(make_inputs)(jax.random.PRNGKey(0))
        jax.block_until_ready(inp)
        t0 = time.perf_counter()
        out = f(*inp)
        _ = np.asarray(out[0])
        log(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s")
        ts = []
        for rep in range(1, args.reps + 1):
            inp = jax.jit(make_inputs)(jax.random.PRNGKey(rep))
            jax.block_until_ready(inp)
            t0 = time.perf_counter()
            out = f(*inp)
            _ = np.asarray(out[0])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        it_mean = float(np.mean(np.asarray(out[4][1])))
        log(
            f"  [{label}] t={t*1e3:.1f}ms  iters_mean={it_mean:.0f} "
            f"done={float(np.mean(np.asarray(out[4][0]))):.2f} {flop_note}"
        )
        return t

    # never-converging tolerances isolate the schedule cost
    base = dict(
        alpha=1.6, eps_abs=1e-30, eps_rel=0.0, adaptive_rho=False,
        check_termination=10, schedule="fixed",
    )

    log(f"kbench n={n} m={m} B={B} f32; relay dispatch floor ~35-45 ms")
    t1 = bench("factor + 10 iters ", QPSettings(max_iter=10, **base))
    t2 = bench("factor + 50 iters ", QPSettings(max_iter=50, **base))
    t3 = bench("factor + 200 iters", QPSettings(max_iter=200, **base))

    per_iter = (t3 - t2) / 150.0
    factor_launch = t1 - 10 * per_iter
    # FLOP model per problem
    iter_flop = 2 * (n * n + 2 * m * n)
    factor_flop = 2 * (m * n * n + n**3 // 3 + n**3 // 2 + n**3 // 2)
    vpu = 2.0e12
    log(
        f"per-iter: {per_iter*1e6:.1f} us/iter for B={B} "
        f"({iter_flop*B/per_iter/1e9:.0f} GFLOP/s; bound {iter_flop*B/vpu*1e6:.1f} us)"
    )
    log(
        f"factor+launch+epilogue: {factor_launch*1e3:.1f} ms "
        f"({factor_flop*B/vpu*1e3:.1f} ms at VPU bound for 1 factor)"
    )


if __name__ == "__main__":
    main()
