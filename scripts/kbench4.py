#!/usr/bin/env python
"""MARGINAL cost of the SQP outer-loop XLA ops at n=128, B=1024, by
in-program repetition: scan K applications (inputs perturbed per trip to
defeat CSE/memoization), time K=1 vs K=9, slope = per-application cost.
This removes the ~30-40 ms relay dispatch floor that dominates any
standalone timing."""

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
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    n, B = 128, 1024
    m = n + 1
    dtype = jnp.float32
    hp = lax.Precision.HIGHEST

    def repeat(op, K):
        """Build f(inputs) applying op K times with per-trip perturbation."""

        def f(*inputs):
            def body(acc, i):
                pert = tuple(
                    v + (i.astype(dtype) * 1e-6) for v in inputs
                )
                out = op(*pert)
                return acc + jnp.sum(out), None

            acc, _ = lax.scan(body, jnp.zeros((), dtype), jnp.arange(K))
            return acc

        return jax.jit(f)

    def marginal(label, op, make, K=9, reps=3):
        f1 = repeat(op, 1)
        fK = repeat(op, K)
        ts = {1: [], K: []}
        for which, f in ((1, f1), (K, fK)):
            inp = jax.jit(make)(jax.random.PRNGKey(0))
            _ = np.asarray(jax.tree.leaves(inp)[0])
            t0 = time.perf_counter()
            _ = np.asarray(f(*inp))
            c = time.perf_counter() - t0
            for rep in range(1, reps + 1):
                inp = jax.jit(make)(jax.random.PRNGKey(rep))
                _ = np.asarray(jax.tree.leaves(inp)[0])
                t0 = time.perf_counter()
                _ = np.asarray(f(*inp))
                ts[which].append(time.perf_counter() - t0)
        t1, tK = min(ts[1]), min(ts[K])
        per = (tK - t1) / (K - 1)
        log(f"  [{label}] K=1 {t1*1e3:6.1f}ms  K={K} {tK*1e3:6.1f}ms  -> {per*1e3:6.2f} ms/app")
        return per

    def mk_J_lam(key):
        k1, k2 = jax.random.split(key)
        return (
            jax.random.normal(k1, (m, n, B), dtype),
            jax.random.normal(k2, (B, m), dtype),
        )

    marginal(
        "einsum mnb,bm->bn",
        lambda Jt, lam: jnp.einsum("mnb,bm->bn", Jt, lam, precision=hp),
        mk_J_lam,
    )
    marginal(
        "bcast  mnb,bm->bn",
        lambda Jt, lam: jnp.sum(Jt * lam.T[:, None, :], axis=0).T,
        mk_J_lam,
    )

    def mk_B_p(key):
        k1, k2 = jax.random.split(key)
        return (
            jax.random.normal(k1, (n, n, B), dtype),
            jax.random.normal(k2, (B, n), dtype),
        )

    marginal(
        "einsum ijb,bj->bi",
        lambda Bt, p: jnp.einsum("ijb,bj->bi", Bt, p, precision=hp),
        mk_B_p,
    )
    marginal(
        "bcast  ax1 reduce",
        lambda Bt, p: jnp.sum(Bt * p.T[None, :, :], axis=1).T,
        mk_B_p,
    )
    marginal(
        "bcast  ax0 reduce",
        lambda Bt, p: jnp.sum(Bt * p.T[:, None, :], axis=0).T,
        mk_B_p,
    )

    from sqp_solver_tpu.sqp.solver_kernel import _bfgs_update_t

    def mk_bfgs(key):
        ks = jax.random.split(key, 3)
        Bt = jnp.eye(n, dtype=dtype)[:, :, None] * (
            1.0 + jax.random.uniform(ks[0], (1, 1, B), dtype)
        )
        s = jax.random.normal(ks[1], (B, n), dtype) * 0.01
        y = jax.random.normal(ks[2], (B, n), dtype) * 0.01
        return Bt, s, y

    marginal(
        "bfgs_update_t    ",
        lambda Bt, s, y: _bfgs_update_t(
            Bt, s, y, jnp.zeros((B,), jnp.bool_), jnp.ones((B,), jnp.bool_)
        ),
        mk_bfgs,
        K=5,
    )

    marginal(
        "J hook build     ",
        lambda x: jnp.concatenate(
            [
                2.0 * x.T[None, :, :],
                jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, B)),
            ],
            axis=0,
        ),
        lambda k: (jax.random.uniform(k, (B, n), dtype),),
        K=5,
    )

    # the moveaxis relayout (polish path) for reference
    marginal(
        "moveaxis (n,n,B)->(B,n,n)",
        lambda Bt: jnp.moveaxis(Bt, -1, 0),
        lambda k: (jax.random.normal(k, (n, n, B), dtype),),
        K=5,
    )


if __name__ == "__main__":
    main()
