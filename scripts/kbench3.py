#!/usr/bin/env python
"""Time batch-minor contraction forms at the n=128 shape: XLA dot_general
(einsum) vs broadcast-FMA (reduce over a non-batch axis, no relayout).
All timed functions return a small (B,)-sized checksum so host-fetch cost
does not pollute the measurement."""

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

    def timeit(label, fn, make, reps=3):
        inp = jax.jit(make)(jax.random.PRNGKey(0))
        _ = np.asarray(jax.tree.leaves(inp)[0])
        t0 = time.perf_counter()
        _ = np.asarray(fn(*inp))
        log(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s")
        ts = []
        for rep in range(1, reps + 1):
            inp = jax.jit(make)(jax.random.PRNGKey(rep))
            _ = np.asarray(jax.tree.leaves(inp)[0])
            t0 = time.perf_counter()
            _ = np.asarray(fn(*inp))
            ts.append(time.perf_counter() - t0)
        log(f"  [{label}] t={min(ts)*1e3:.1f}ms")
        return min(ts)

    def mk_J_lam(key):
        k1, k2 = jax.random.split(key)
        return (
            jax.random.normal(k1, (m, n, B), dtype),
            jax.random.normal(k2, (B, m), dtype),
        )

    # grad_L contraction: einsum vs broadcast-FMA
    f1 = jax.jit(
        lambda Jt, lam: jnp.sum(
            jnp.einsum("mnb,bm->bn", Jt, lam, precision=hp), axis=-1
        )
    )
    f2 = jax.jit(
        lambda Jt, lam: jnp.sum(jnp.sum(Jt * lam.T[:, None, :], axis=0), axis=0)
    )
    timeit("einsum mnb,bm->bn + sum", f1, mk_J_lam)
    timeit("bcast  mnb,bm->nb + sum", f2, mk_J_lam)

    def mk_B_p(key):
        k1, k2 = jax.random.split(key)
        return (
            jax.random.normal(k1, (n, n, B), dtype),
            jax.random.normal(k2, (B, n), dtype),
        )

    f3 = jax.jit(
        lambda Bt, p: jnp.sum(jnp.einsum("ijb,bj->bi", Bt, p, precision=hp), axis=-1)
    )
    f4 = jax.jit(
        lambda Bt, p: jnp.sum(jnp.sum(Bt * p.T[None, :, :], axis=1), axis=0)
    )
    f5 = jax.jit(  # axis-0 reduce variant (valid when Bt symmetric)
        lambda Bt, p: jnp.sum(jnp.sum(Bt * p.T[:, None, :], axis=0), axis=0)
    )
    timeit("einsum ijb,bj->bi + sum", f3, mk_B_p)
    timeit("bcast  axis1 reduce     ", f4, mk_B_p)
    timeit("bcast  axis0 reduce(sym)", f5, mk_B_p)

    # BFGS transposed, checksum output
    from sqp_solver_tpu.sqp.solver_kernel import _bfgs_update_t

    def mk_bfgs(key):
        ks = jax.random.split(key, 3)
        Bt = jnp.eye(n, dtype=dtype)[:, :, None] * (
            1.0 + jax.random.uniform(ks[0], (1, 1, B), dtype)
        )
        s = jax.random.normal(ks[1], (B, n), dtype) * 0.01
        y = jax.random.normal(ks[2], (B, n), dtype) * 0.01
        return Bt, s, y, jnp.zeros((B,), jnp.bool_), jnp.ones((B,), jnp.bool_)

    f6 = jax.jit(lambda *a: jnp.sum(_bfgs_update_t(*a), axis=(0, 1)))
    timeit("bfgs_update_t + checksum", f6, mk_bfgs)

    # J hook build + checksum
    def hook(x):
        eye_t = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, B))
        Jt = jnp.concatenate([2.0 * x.T[None, :, :], eye_t], axis=0)
        return jnp.sum(Jt, axis=(0, 1))

    timeit("J hook + checksum       ", jax.jit(hook),
           lambda k: (jax.random.uniform(k, (B, n), dtype),))

    # transposed-vector transposes (B,n)<->(n,B)
    f7 = jax.jit(lambda x: jnp.sum(x.T, axis=0))
    timeit("(B,n)->(n,B) transpose  ", f7,
           lambda k: (jax.random.uniform(k, (B, n), dtype),))


if __name__ == "__main__":
    main()
