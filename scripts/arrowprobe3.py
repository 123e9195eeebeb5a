#!/usr/bin/env python
"""Isolate the FACTOR phase: dense schur_cholesky vs schur_arrow at the
coupled-MPC shapes, K-chained fresh factorizations per dispatch (slope =
true per-factor cost, relay floor cancels).  Then a refactor-heavy solve
row probe (SQP-style: every outer refactors)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
sys.path.insert(0, "/root/repo")
from sqp_solver_tpu.models.mpc import mpc_qp_coupled_batch
from sqp_solver_tpu.ops import linear_solver as ls

log = lambda *a: print(*a, file=sys.stderr, flush=True)
salt = int(time.time_ns()) % (2**20)

for (B, Ag, Hz) in [(64, 48, 16), (64, 24, 32), (64, 8, 128)]:
    qp0, b, c = mpc_qp_coupled_batch(B, agents=Ag, horizon=Hz, dtype=jnp.float32)
    n = qp0.P.shape[-1]
    m = qp0.A.shape[-2]
    arrow_fac = ls._arrow_factor_factory(b, c).factor

    def dense_fac(P, A, sigma, rho_vec):
        return ls._schur_factor(P, A, sigma, rho_vec)

    P1 = qp0.P if qp0.P.ndim == 2 else qp0.P[0]
    A1 = qp0.A if qp0.A.ndim == 2 else qp0.A[0]
    for label, fac in (("dense", dense_fac), ("arrow", arrow_fac)):
        fac_b = jax.vmap(fac, in_axes=(None, None, None, 0))

        def runK(key, K):
            out = 0.0
            for i in range(K):
                kk = jax.random.fold_in(key, i)
                # fresh rho per factor (mimics adaptive-rho refactors);
                # P/A fixed = the SQP/adaptive-rho pattern
                rho = jnp.exp(
                    jax.random.uniform(kk, (B, m), jnp.float32, -1.0, 1.0)
                )
                f = fac_b(P1, A1, 1e-6, rho)
                leaves = jax.tree_util.tree_leaves(f)
                out = out + sum(jnp.sum(l_[..., :1]) * 1e-9 for l_ in leaves)
            return out

        ts = {}
        for K in (1, 3):
            fK = jax.jit(lambda key, K=K: runK(key, K))
            _ = np.asarray(fK(jax.random.PRNGKey(0)))
            best = 1e9
            for rep in (1, 2):
                key = jax.random.PRNGKey(salt + 31 * K + rep)
                jax.block_until_ready(key)
                t0 = time.perf_counter()
                _ = np.asarray(fK(key))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        slope = (ts[3] - ts[1]) / 2
        log(f"B={B} S={Ag} h={Hz} n={n} {label} factor: slope={slope*1e3:.1f}ms/factor (t1={ts[1]*1e3:.0f}ms t3={ts[3]*1e3:.0f}ms)")
