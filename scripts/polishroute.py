#!/usr/bin/env python
"""QP polish: kernel route vs XLA route on the real TPU (n=128 B=1024)."""

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

    from sqp_solver_tpu.qp.polish import kkt_solve_schur_refined

    B, n, m = 1024, 128, 129

    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        G = jax.random.normal(k1, (B, n, n), jnp.float32) / jnp.sqrt(n * 1.0)
        H = jnp.einsum("bij,bkj->bik", G, G) + jnp.eye(n, dtype=jnp.float32)
        J = jax.random.normal(k2, (B, m, n), jnp.float32) / jnp.sqrt(n * 1.0)
        act = jax.random.uniform(k3, (B, m)) < 0.3
        Jm = jnp.where(act[..., None], J, 0.0)
        r1 = jax.random.normal(k4, (B, n), jnp.float32)
        r2 = jnp.where(act, jax.random.normal(k4, (B, m), jnp.float32), 0.0)
        return H, Jm, act, r1, r2

    for label, uk in (("xla route", False), ("kernel route", True)):
        f = jax.jit(
            lambda key, uk=uk: kkt_solve_schur_refined(
                *gen(key), use_kernel=uk
            )[0]
        )
        t0 = time.perf_counter()
        jax.block_until_ready(f(jax.random.PRNGKey(0)))
        log(f"  [{label}] compile+first {time.perf_counter()-t0:.1f}s")
        salt = int(time.time_ns()) % (2**30)
        ts = []
        for rep in (1, 2, 3, 4):
            k = jax.random.PRNGKey(salt + rep)
            jax.block_until_ready(k)
            t0 = time.perf_counter()
            jax.block_until_ready(f(k))
            ts.append(time.perf_counter() - t0)
        log(f"  [{label}] t={min(ts)*1e3:.1f}ms (incl on-device gen)")

    # agreement on identical data
    H, Jm, act, r1, r2 = jax.jit(gen)(jax.random.PRNGKey(7))
    xa = kkt_solve_schur_refined(H, Jm, act, r1, r2, use_kernel=False)[0]
    xb = kkt_solve_schur_refined(H, Jm, act, r1, r2, use_kernel=True)[0]
    log(f"  max |xla - kernel| = {float(jnp.max(jnp.abs(xa - xb))):.2e}")


if __name__ == "__main__":
    main()
