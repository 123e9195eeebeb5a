#!/usr/bin/env python
"""Round-4 glue-harvest check at the exact n=128 B=1024 bench config:
time + accuracy after (a) active-masked BFGS passthrough (no XLA Bt
select), (b) carried polish linearization, (c) in-kernel J masking.
Also sweep polish_sweeps 6 -> 4/5 (each sweep contracts err by ~delta;
the f32 floor may need fewer than 6).
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
    salt = int(time.time_ns()) % (2**30)

    bench_cfg = SQPSettings(
        max_iter=2, eps_prim=2e-3, eps_dual=2e-3, termination="kkt",
        schedule="fixed", qp_impl="kernel", polish=True, polish_passes=3,
        line_search_max_iter=5,
        qp=QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
            check_termination=10, warm_start=True, adaptive_rho=True,
            adaptive_rho_interval=50, schedule="fixed",
        ),
    )
    configs = [
        ("bench 2out 3pass sw6", bench_cfg),
        ("sw5", dataclasses.replace(bench_cfg, polish_sweeps=5)),
        ("sw4", dataclasses.replace(bench_cfg, polish_sweeps=4)),
        ("sw4 2pass", dataclasses.replace(
            bench_cfg, polish_sweeps=4, polish_passes=2)),
        ("ls4 sw5", dataclasses.replace(
            bench_cfg, polish_sweeps=5, line_search_max_iter=4)),
    ]
    for label, s in configs:
        solve = jax.jit(
            lambda key, s=s: sqp_solve_batch(*build(key), None, s, impl="fused")
        )
        t0 = time.perf_counter()
        r = solve(jax.random.PRNGKey(0))
        _ = np.asarray(r.info.status)
        log(f"[{label}] compile+first {time.perf_counter()-t0:.1f}s")
        ts = []
        for rep in (1, 2, 3, 4, 5):
            key = jax.random.PRNGKey(salt + rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            r = solve(key)
            _ = np.asarray(r.info.status)
            ts.append(time.perf_counter() - t0)
        prob, _ = jax.jit(build)(jax.random.PRNGKey(salt + 99))
        ra = solve(jax.random.PRNGKey(salt + 99))
        err = float(np.percentile(
            np.abs(np.asarray(ra.x, np.float64) - solution(prob)), 99))
        log(f"[{label}] {min(ts)*1e3:.1f}ms -> {B/min(ts):.0f}/s "
            f"solved={float(np.mean(np.asarray(ra.info.status)==0)):.3f} "
            f"err_p99={err:.2e}")


if __name__ == "__main__":
    main()
