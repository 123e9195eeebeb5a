#!/usr/bin/env python
"""How much of the bench's measured time is the host fetch of res.x?

block_until_ready waits for device completion without the D2H transfer;
np.asarray additionally downloads (measured ~30 MB/s through the relay).
Sanity check: block_until_ready on a long solve must NOT return early —
its time must scale with the work.
"""

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

    from bench import make_problem_generator
    from sqp_solver_tpu.parallel.batch import sqp_solve_batch
    from sqp_solver_tpu.qp import QPSettings
    from sqp_solver_tpu.sqp import SQPSettings

    B, N = 1024, 128
    build = make_problem_generator(B, N, jnp.float32)
    settings = SQPSettings(
        max_iter=2, eps_prim=2e-3, eps_dual=2e-3, termination="kkt",
        schedule="fixed", qp_impl="kernel", polish=True, polish_passes=3,
        line_search_max_iter=10,
        qp=QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
            check_termination=10, warm_start=True, adaptive_rho=True,
            adaptive_rho_interval=50, schedule="fixed",
        ),
    )

    solve = jax.jit(lambda key: sqp_solve_batch(*build(key), None, settings,
                                                impl="fused"))
    _ = np.asarray(solve(jax.random.PRNGKey(0)).x)

    for mode in ("asarray_x", "block_x", "asarray_status"):
        ts = []
        for rep in (1, 2, 3, 4):
            key = jax.random.PRNGKey(10 * rep + hash(mode) % 7)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            res = solve(key)
            if mode == "asarray_x":
                _ = np.asarray(res.x)
            elif mode == "block_x":
                jax.block_until_ready(res.x)
            else:
                _ = np.asarray(res.info.status)
            ts.append(time.perf_counter() - t0)
        log(f"  {mode}: min={min(ts)*1e3:.1f}ms  all={[f'{t*1e3:.0f}' for t in ts]}")

    # sanity: block_until_ready must scale with work (not return early)
    s1 = SQPSettings(**{**settings.__dict__, "max_iter": 8})
    solve8 = jax.jit(lambda key: sqp_solve_batch(*build(key), None, s1,
                                                 impl="fused"))
    jax.block_until_ready(solve8(jax.random.PRNGKey(0)).x)
    ts = []
    for rep in (1, 2, 3):
        key = jax.random.PRNGKey(rep)
        jax.block_until_ready(key)
        t0 = time.perf_counter()
        jax.block_until_ready(solve8(key).x)
        ts.append(time.perf_counter() - t0)
    log(f"  block_x at max_iter=8: min={min(ts)*1e3:.1f}ms (must be >> 2-outer)")


if __name__ == "__main__":
    main()
