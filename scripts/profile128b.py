#!/usr/bin/env python
"""n=128 bench-config decomposition: cost per outer iteration and per
polish pass at the EXACT BENCH_r03 configuration (2 outers + 3 passes).

Linear model: t = floor + outers * c_outer + passes * c_pass.
"""

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

    B, N = 1024, 128
    build = make_problem_generator(B, N, jnp.float32)

    bench_cfg = SQPSettings(
        max_iter=2, eps_prim=2e-3, eps_dual=2e-3, termination="kkt",
        schedule="fixed", qp_impl="kernel", polish=True, polish_passes=3,
        line_search_max_iter=10,
        qp=QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
            check_termination=10, warm_start=True, adaptive_rho=True,
            adaptive_rho_interval=50, schedule="fixed",
        ),
    )
    configs = [
        ("bench 2out 3pass", bench_cfg),
        ("2out 0pass", dataclasses.replace(bench_cfg, polish=False)),
        ("2out 1pass", dataclasses.replace(bench_cfg, polish_passes=1)),
        ("2out 2pass", dataclasses.replace(bench_cfg, polish_passes=2)),
        ("1out 3pass", dataclasses.replace(bench_cfg, max_iter=1)),
        ("3out 3pass", dataclasses.replace(bench_cfg, max_iter=3)),
        ("1out 4pass", dataclasses.replace(bench_cfg, max_iter=1, polish_passes=4)),
    ]
    for label, s in configs:
        solve = jax.jit(
            lambda key, s=s: sqp_solve_batch(*build(key), None, s, impl="fused")
        )
        t0 = time.perf_counter()
        r = solve(jax.random.PRNGKey(0))
        _ = np.asarray(r.x)
        log(f"  [{label}] compile+first {time.perf_counter()-t0:.1f}s")
        ts = []
        for rep in (1, 2, 3, 4):
            k = jax.random.PRNGKey(rep)
            jax.block_until_ready(k)
            t0 = time.perf_counter()
            r = solve(k)
            _ = np.asarray(r.x)
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
            f"{np.mean(st==0):.3f} err_p99={err:.2e}"
        )


if __name__ == "__main__":
    main()
