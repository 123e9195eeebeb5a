#!/usr/bin/env python
"""Isolate the in-kernel polish pass cost at n=128 B=1024.

Measures (in-program repetition slopes, ROADMAP fact: standalone timings
are useless on the tunneled chip):
  1. chained polish_kkt_kernel calls alone
  2. chained full polish_nlp_t passes (via polish_passes=K configs)
  3. the old batch-first epilogue (polish=False solve + common.polish_nlp)
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

    from bench import make_problem_generator
    from sqp_solver_tpu.ops.qp_kernel import polish_kkt_kernel
    from sqp_solver_tpu.parallel.batch import sqp_solve_batch
    from sqp_solver_tpu.qp import QPSettings
    from sqp_solver_tpu.sqp import SQPSettings
    from sqp_solver_tpu.sqp import common

    B, N = 1024, 128
    m = N + 1

    # ---- 1. kernel alone, chained K times -------------------------------
    def chain(K):
        def run(key):
            k1, k2 = jax.random.split(key)
            G = jax.random.normal(k1, (N, N, B), jnp.float32)
            H = jnp.einsum("ikb,jkb->ijb", G, G) * (1.0 / N) + 2.0 * jnp.eye(
                N, dtype=jnp.float32
            )[:, :, None]
            J = jax.random.normal(k2, (m, N, B), jnp.float32) * 0.3
            act = (jax.random.uniform(k2, (m, B)) < 0.5).astype(jnp.float32)
            Jm = J * act[:, None, :]
            r1 = jax.random.normal(k1, (N, B), jnp.float32)
            b = jax.random.normal(k2, (m, B), jnp.float32) * act
            nu0 = jnp.zeros((m, B), jnp.float32)
            out = jnp.zeros((N, B), jnp.float32)
            for _ in range(K):
                dx, nu, fail, _li = polish_kkt_kernel(H, Jm, act, r1 + out, b, nu0)
                out = out + dx * 1e-6  # data dependence, keeps passes live
            return out[0]

        return jax.jit(run)

    for K in (1, 4):
        f = chain(K)
        _ = np.asarray(f(jax.random.PRNGKey(0)))
        ts = []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            _ = np.asarray(f(key))
            ts.append(time.perf_counter() - t0)
        log(f"  kernel x{K}: {min(ts)*1e3:.1f}ms")

    # ---- 2/3. epilogue comparison on the bench problem -------------------
    build = make_problem_generator(B, N, jnp.float32)
    base = SQPSettings(
        max_iter=2, eps_prim=2e-3, eps_dual=2e-3, termination="kkt",
        schedule="fixed", qp_impl="kernel", polish=False,
        line_search_max_iter=10,
        qp=QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
            check_termination=10, warm_start=True, adaptive_rho=True,
            adaptive_rho_interval=50, schedule="fixed",
        ),
    )

    def old_epilogue(problem, res, passes):
        """The round-3-commit batch-first epilogue reconstructed: moveaxis
        adapters + common.polish_nlp (what solver_kernel.py did before the
        in-kernel polish)."""
        params = problem.params
        s = dataclasses.replace(base, polish_passes=passes)

        def f_lin_u(xx):
            f = lambda x_, p: problem.objective(x_, p)
            return jax.vmap(jax.value_and_grad(f))(xx, params)

        def c_lin_u(xx):
            cv, Jt_ = problem.constraint_linearized_t(xx, params)
            return cv, jnp.moveaxis(Jt_, -1, 0)

        def hess_u(xx, ll):
            H_t = problem.lagrangian_hessian_t(xx, ll, params)
            return jnp.moveaxis(H_t, -1, 0)

        return common.polish_nlp(
            res.x, res.lam, problem.l, problem.u, f_lin_u, c_lin_u, hess_u, s
        )

    def new_epilogue(problem, res, passes):
        params = problem.params
        s = dataclasses.replace(base, polish_passes=passes)

        def f_lin_u(xx):
            f = lambda x_, p: problem.objective(x_, p)
            return jax.vmap(jax.value_and_grad(f))(xx, params)

        def c_lin_t_u(xx):
            return problem.constraint_linearized_t(xx, params)

        def hess_t_u(xx, ll):
            return problem.lagrangian_hessian_t(xx, ll, params)

        return common.polish_nlp_t(
            res.x, res.lam, problem.l, problem.u, f_lin_u, c_lin_t_u,
            hess_t_u, s
        )

    for label, epi in (("old batch-first", old_epilogue), ("new in-kernel", new_epilogue)):
        for passes in (1, 3):
            def run(key, passes=passes, epi=epi):
                problem, x0 = build(key)
                res = sqp_solve_batch(problem, x0, None, base, impl="fused")
                x, lam, resc = epi(problem, res, passes)
                return x, lam, resc

            f = jax.jit(run)
            t0 = time.perf_counter()
            r = f(jax.random.PRNGKey(0))
            _ = np.asarray(r[0])
            c = time.perf_counter() - t0
            ts = []
            for rep in (1, 2, 3):
                key = jax.random.PRNGKey(rep)
                jax.block_until_ready(key)
                t0 = time.perf_counter()
                r = f(key)
                _ = np.asarray(r[0])
                ts.append(time.perf_counter() - t0)
            log(f"  loop + {label} x{passes}: {min(ts)*1e3:.1f}ms (compile {c:.0f}s)")


if __name__ == "__main__":
    main()
