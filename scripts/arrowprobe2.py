#!/usr/bin/env python
"""Round-4 probe: find a factor-dominated coupled-MPC config where the
arrow backend's O(S b^3 + c^3) visibly beats dense O((S b + c)^3).

Pressure levers vs the round-3 bench config (which was solve-dominated):
tight eps + adaptive rho (repeated refactorization) and larger per-agent
blocks (b^3 work per block on the MXU).  Timed with salted fresh
problems and tiny status fetches (bench.py methodology).
"""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from sqp_solver_tpu.models.mpc import mpc_qp_coupled_batch
from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp import QPSettings

log = lambda *a: print(*a, file=sys.stderr, flush=True)

salt = int(time.time_ns()) % (2**20)

CONFIGS = [
    # (B, agents, horizon) — n = agents*horizon + 2
    (64, 48, 16),   # round-3 bench config (baseline)
    (64, 24, 32),   # fewer, bigger blocks
    (32, 16, 64),   # b=64 blocks
    (16, 8, 128),   # b=128 blocks: MXU-tile-sized
    (64, 8, 128),   # same, more batch
]

for (B, Ag, Hz) in CONFIGS:
    qp0, b, c = mpc_qp_coupled_batch(B, agents=Ag, horizon=Hz, dtype=jnp.float32)
    n = qp0.P.shape[-1]
    jax.block_until_ready(qp0)
    for label, s in (
        ("dense ", QPSettings(adaptive_rho=True, adaptive_rho_interval=25,
                              eps_abs=1e-6, eps_rel=1e-6, max_iter=1000)),
        ("arrow ", QPSettings(adaptive_rho=True, adaptive_rho_interval=25,
                              eps_abs=1e-6, eps_rel=1e-6, max_iter=1000,
                              linear_solver="schur_arrow", block_size=b,
                              arrow_width=c)),
    ):
        f = jax.jit(lambda p, s=s: qp_solve_batch(p, s, impl="vmap"))
        try:
            _ = np.asarray(f(qp0).info.status)
        except Exception as e:
            log(f"B={B} S={Ag} h={Hz} n={n} {label}: FAIL {type(e).__name__}: {str(e)[:100]}")
            continue
        ts = []
        for rep in (1, 2):
            qp2, _, _ = mpc_qp_coupled_batch(
                B, agents=Ag, horizon=Hz, seed=salt + rep, dtype=jnp.float32
            )
            jax.block_until_ready(qp2)
            t0 = time.perf_counter()
            r = f(qp2)
            _ = np.asarray(r.info.status)
            ts.append(time.perf_counter() - t0)
        log(f"B={B} S={Ag} h={Hz} n={n} {label}: {min(ts)*1e3:.0f}ms "
            f"solved={float(np.mean(np.asarray(r.info.status)==0)):.3f} "
            f"iters_p50={float(np.percentile(np.asarray(r.info.iter),50)):.0f}")
