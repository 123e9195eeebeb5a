#!/usr/bin/env python
"""Benchmark harness: batched SQP throughput on one TPU chip.

Prints exactly ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline metric is the north-star config (BASELINE.md): batched SQP
solves/sec at n<=128 on one chip, vs the 1e4 solves/sec target.
Supplementary metrics (QP-only throughput, accuracy vs closed form,
timings) go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from sqp_solver_tpu.models.benchmark import sphere_cap_nlp_batch, sphere_cap_solution
    from sqp_solver_tpu.models.mpc import mpc_qp_batch
    from sqp_solver_tpu.parallel.batch import qp_solve_batch, sqp_solve_batch
    from sqp_solver_tpu.qp import QPSettings
    from sqp_solver_tpu.sqp import SQPSettings, SQPStatus

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # ---- headline: batched SQP, n=32, B=4096, f32 --------------------------
    B, N = 4096, 32
    problem, x0 = sphere_cap_nlp_batch(B, N, dtype=jnp.float32)
    settings = SQPSettings(
        max_iter=40,
        eps_prim=5e-4,
        eps_dual=5e-4,
        termination="kkt",
        qp=QPSettings(
            alpha=1.6,
            eps_abs=1e-5,
            eps_rel=1e-5,
            max_iter=250,
            check_termination=25,
            warm_start=True,
            adaptive_rho=True,
            adaptive_rho_interval=50,
        ),
    )

    solve = jax.jit(lambda pr, x: sqp_solve_batch(pr, x, None, settings))

    t0 = time.perf_counter()
    res = solve(problem, x0)
    jax.block_until_ready(res)
    t_compile = time.perf_counter() - t0
    log(f"sqp compile+first run: {t_compile:.2f}s")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solve(problem, x0)
    jax.block_until_ready(res)
    t_solve = (time.perf_counter() - t0) / reps

    status = np.asarray(res.info.status)
    solved_frac = float(np.mean(status == SQPStatus.SOLVED))
    x_star = sphere_cap_solution(problem)
    err = float(np.max(np.abs(np.asarray(res.x, np.float64) - x_star)))
    iters = np.asarray(res.info.iter)
    sqp_per_sec = B / t_solve
    log(
        f"sqp batch: B={B} n={N} time={t_solve*1e3:.1f}ms -> {sqp_per_sec:.0f} solves/s; "
        f"solved={solved_frac:.3f} max|x-x*|={err:.2e} iters p50={np.percentile(iters,50):.0f} "
        f"p99={np.percentile(iters,99):.0f}"
    )

    # ---- supplementary: batched MPC QP throughput ---------------------------
    qp = mpc_qp_batch(batch=B, horizon=16, dtype=jnp.float32)
    qp_settings = QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=500, check_termination=25)
    qsolve = jax.jit(lambda p: qp_solve_batch(p, qp_settings))
    jax.block_until_ready(qsolve(qp))
    t0 = time.perf_counter()
    for _ in range(reps):
        qres = qsolve(qp)
    jax.block_until_ready(qres)
    t_qp = (time.perf_counter() - t0) / reps
    log(
        f"mpc qp batch: B={B} h=16 time={t_qp*1e3:.1f}ms -> {B/t_qp:.0f} solves/s; "
        f"solved={float(np.mean(np.asarray(qres.info.status)==0)):.3f}"
    )

    print(
        json.dumps(
            {
                "metric": "batched_sqp_solves_per_sec_n32_b4096",
                "value": round(sqp_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(sqp_per_sec / 1e4, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
