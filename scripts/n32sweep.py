#!/usr/bin/env python
"""n=32 headline budget sweep with the in-kernel polish: can 2 outers or
a shorter line search hold solved=1.000 / err<=1e-6?"""

import os
import sys
import time
import dataclasses

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

    from bench import make_problem_generator, solution
    from sqp_solver_tpu.parallel.batch import sqp_solve_batch
    from sqp_solver_tpu.qp import QPSettings
    from sqp_solver_tpu.sqp import SQPSettings

    B, N = 4096, 32
    build = make_problem_generator(B, N, jnp.float32)
    base = SQPSettings(
        max_iter=3, eps_prim=2e-3, eps_dual=2e-3, termination="kkt",
        schedule="fixed", qp_impl="kernel", polish=True, polish_passes=3,
        line_search_max_iter=5,
        qp=QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
            check_termination=10, warm_start=True, adaptive_rho=True,
            adaptive_rho_interval=50, schedule="fixed",
        ),
    )
    configs = [
        ("bench 3out 3pass ls5", base),
        ("2out 3pass", dataclasses.replace(base, max_iter=2)),
        ("2out 4pass", dataclasses.replace(base, max_iter=2, polish_passes=4)),
        ("3out 2pass", dataclasses.replace(base, polish_passes=2)),
        ("3out 3pass ls3", dataclasses.replace(base, line_search_max_iter=3)),
        ("2out qp30 4pass", dataclasses.replace(
            base, max_iter=2, polish_passes=4,
            qp=dataclasses.replace(base.qp, max_iter=30))),
    ]
    for label, s in configs:
        solve = jax.jit(
            lambda key, s=s: sqp_solve_batch(*build(key), None, s, impl="fused")
        )
        t0 = time.perf_counter()
        r = solve(jax.random.PRNGKey(0))
        _ = np.asarray(r.info.status)
        log(f"  [{label}] compile+first {time.perf_counter()-t0:.1f}s")
        salt = int(time.time_ns()) % (2**30)
        ts = []
        for rep in (1, 2, 3, 4):
            k = jax.random.PRNGKey(salt + rep)
            jax.block_until_ready(k)
            t0 = time.perf_counter()
            r = solve(k)
            _ = np.asarray(r.info.status)
            ts.append(time.perf_counter() - t0)
        st = np.asarray(r.info.status)
        prob, _ = jax.jit(build)(jax.random.PRNGKey(9))
        racc = solve(jax.random.PRNGKey(9))
        err = np.percentile(
            np.abs(np.asarray(racc.x, np.float64) - solution(prob)), 99
        )
        t = min(ts)
        log(
            f"  [{label}] t={t*1e3:.1f}ms -> {B/t:.0f}/s solved="
            f"{np.mean(st==0):.4f} err_p99={err:.2e}"
        )


if __name__ == "__main__":
    main()
