#!/usr/bin/env python
"""Per-outer-iteration glue cost of the kernel-tier SQP at n=32, B=4096:
slope over outer max_iter, and the line-search share via trip count."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, "/root/repo")
    from bench import make_problem_generator
    from sqp_solver_tpu.parallel.batch import sqp_solve_batch
    from sqp_solver_tpu.qp import QPSettings
    from sqp_solver_tpu.sqp import SQPSettings

    B, N = 4096, 32
    build = make_problem_generator(B, N, jnp.float32)

    def settings(max_iter, ls):
        return SQPSettings(
            max_iter=max_iter,
            eps_prim=1e-30,  # never converge: isolates per-outer cost
            eps_dual=1e-30,
            termination="kkt",
            schedule="fixed",
            qp_impl="kernel",
            polish=False,
            line_search_max_iter=ls,
            qp=QPSettings(
                alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
                check_termination=10, warm_start=True, adaptive_rho=True,
                adaptive_rho_interval=50, schedule="fixed",
            ),
        )

    def timed(s, label):
        def run(key):
            problem, x0 = build(key)
            return sqp_solve_batch(problem, x0, None, s, impl="fused")

        solve = jax.jit(run)
        t0 = time.perf_counter()
        _ = np.asarray(solve(jax.random.PRNGKey(0)).x)
        log(f"  [{label}] compile+first {time.perf_counter()-t0:.1f}s")
        ts = []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            _ = np.asarray(solve(key).x)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        log(f"  [{label}] t={t*1e3:.1f}ms")
        return t

    t5 = timed(settings(5, 10), "outer=5  ls=10")
    t10 = timed(settings(10, 10), "outer=10 ls=10")
    t10_ls2 = timed(settings(10, 2), "outer=10 ls=2 ")
    per_outer = (t10 - t5) / 5.0
    ls_share = (t10 - t10_ls2) / 10.0
    log(
        f"per-outer total {per_outer*1e3:.2f} ms; line-search share "
        f"{ls_share*1e3:.2f} ms/outer (8 extra trips)"
    )


if __name__ == "__main__":
    main()
