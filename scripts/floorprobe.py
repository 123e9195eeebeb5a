#!/usr/bin/env python
"""Measure the relay dispatch floor on the n=128 SQP config: time programs
that run the FULL batched solve K times (fresh on-device problems each) in
one dispatch; the K->K+1 slope is the true per-batch compute cost."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
sys.path.insert(0, "/root/repo")
import bench as bench_mod
from sqp_solver_tpu.parallel.batch import sqp_solve_batch
from sqp_solver_tpu.qp import QPSettings
from sqp_solver_tpu.sqp import SQPSettings

log = lambda *a: print(*a, file=sys.stderr, flush=True)

B, N = 1024, 128
build = bench_mod.make_problem_generator(B, N, jnp.float32)
settings = SQPSettings(
    max_iter=2, eps_prim=2e-3, eps_dual=2e-3, termination="kkt",
    schedule="fixed", qp_impl="kernel", polish=True, polish_passes=3,
    polish_sweeps=4, line_search_max_iter=5,
    qp=QPSettings(alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
                  check_termination=10, warm_start=True, adaptive_rho=True,
                  adaptive_rho_interval=50, schedule="fixed"),
)

def runK(key, K):
    acc = 0.0
    for i in range(K):
        problem, x0 = build(jax.random.fold_in(key, i))
        r = sqp_solve_batch(problem, x0, None, settings, impl="fused")
        acc = acc + jnp.sum(r.x) * 1e-9
    return acc

salt = int(time.time_ns()) % (2**30)
for K in (1, 2, 3):
    f = jax.jit(lambda key, K=K: runK(key, K))
    _ = np.asarray(f(jax.random.PRNGKey(0)))
    ts = []
    for rep in (1, 2, 3, 4):
        key = jax.random.PRNGKey(salt + rep); jax.block_until_ready(key)
        t0 = time.perf_counter(); _ = np.asarray(f(key)); ts.append(time.perf_counter() - t0)
    log(f"K={K}: {min(ts)*1e3:.1f}ms  (all: {[f'{t*1e3:.0f}' for t in ts]})")
