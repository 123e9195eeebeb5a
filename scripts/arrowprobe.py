#!/usr/bin/env python
"""Probe dense-vs-arrow backend timing across coupled-MPC shapes (real TPU)."""
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

for (B, Ag, Hz) in [(128, 24, 16), (64, 48, 16), (64, 24, 32), (32, 32, 32)]:
    qp0, b, c = mpc_qp_coupled_batch(B, agents=Ag, horizon=Hz, dtype=jnp.float32)
    n = qp0.P.shape[-1]
    jax.block_until_ready(qp0)
    for label, s in (
        ("dense", QPSettings(adaptive_rho=True, max_iter=500)),
        ("arrow", QPSettings(adaptive_rho=True, max_iter=500,
                             linear_solver="schur_arrow", block_size=b, arrow_width=c)),
    ):
        f = jax.jit(lambda p, s=s: qp_solve_batch(p, s, impl="vmap"))
        try:
            _ = np.asarray(f(qp0).x)
        except Exception as e:
            log(f"B={B} agents={Ag} h={Hz} n={n} {label}: FAIL {type(e).__name__}: {e}")
            continue
        ts = []
        for seed in (1, 2):
            qp2, _, _ = mpc_qp_coupled_batch(B, agents=Ag, horizon=Hz, seed=seed, dtype=jnp.float32)
            jax.block_until_ready(qp2)
            t0 = time.perf_counter()
            r = f(qp2)
            _ = np.asarray(r.x)
            ts.append(time.perf_counter() - t0)
        log(f"B={B} agents={Ag} h={Hz} n={n} {label}: {min(ts)*1e3:.0f}ms "
            f"solved={float(np.mean(np.asarray(r.info.status)==0)):.3f} "
            f"iters_p50={float(np.percentile(np.asarray(r.info.iter),50)):.0f}")
