"""Marginal-cost breakdown of the n=128 B=1024 headline config.

In-program K-repetition slope (dispatch-floor-free) for polish_passes
in (0, 1, 3): the slope difference isolates the per-pass polish cost.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench as bench_mod  # noqa: E402
from sqp_solver_tpu.qp import QPSettings  # noqa: E402
from sqp_solver_tpu.sqp import SQPSettings, sqp_solve_batch  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)

B, N = 1024, 128
build = bench_mod.make_problem_generator(B, N, jnp.float32)


def settings_for(passes):
    return SQPSettings(
        max_iter=2, eps_prim=2e-3, eps_dual=2e-3, termination="kkt",
        schedule="fixed", qp_impl="kernel", polish=passes > 0,
        polish_passes=max(passes, 1), line_search_max_iter=10,
        qp=QPSettings(alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
                      check_termination=10, warm_start=True,
                      adaptive_rho=True, adaptive_rho_interval=50,
                      schedule="fixed"),
    )


def slope(make_solve, label):
    def runK(key, K, s):
        acc = 0.0
        for i in range(K):
            problem, x0 = build(jax.random.fold_in(key, i))
            r = sqp_solve_batch(problem, x0, None, s, impl="fused")
            acc = acc + jnp.sum(r.x) * 1e-9
        return acc

    ts = {}
    for K in (1, 3):
        f = jax.jit(lambda key, K=K: runK(key, K, make_solve))
        _ = np.asarray(f(jax.random.PRNGKey(0)))
        best = []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            _ = np.asarray(f(key))
            best.append(time.perf_counter() - t0)
        ts[K] = min(best)
    marg = (ts[3] - ts[1]) / 2
    log(f"{label}: K1={ts[1]*1e3:.1f}ms K3={ts[3]*1e3:.1f}ms "
        f"marginal={marg*1e3:.1f}ms -> {B/marg:.0f}/s floor-free")
    return marg


m0 = slope(settings_for(0), "passes=0")
m1 = slope(settings_for(1), "passes=1")
m3 = slope(settings_for(3), "passes=3")
log(f"per-pass polish cost: p1-p0={1e3*(m1-m0):.1f}ms  (p3-p1)/2={1e3*(m3-m1)/2:.1f}ms")
