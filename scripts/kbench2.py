#!/usr/bin/env python
"""Decompose the n=128 SQP outer-iteration cost WITHOUT new Mosaic
compiles: reuse the bench's exact kernel static config (warm persistent
cache) and vary only the data; separately time the XLA-level pieces the
outer loop runs per iteration (BFGS in transposed layout, the einsums,
line-search evals).

Methodology per CLAUDE.md: fresh PRNG inputs per rep, completion forced
with a host fetch, min over reps; the relay has a ~35-45 ms dispatch
floor per standalone jitted call — measure it explicitly with a no-op
kernel call (all lanes inactive) and subtract.
"""

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

    from sqp_solver_tpu.ops.qp_kernel import sqp_step_kernel
    from sqp_solver_tpu.qp.types import QPSettings

    n, B = 128, 1024
    m = n + 1
    dtype = jnp.float32

    # the bench's inner-QP config (bench.py settings.qp) — warm cache
    settings = QPSettings(
        alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
        check_termination=10, warm_start=True, adaptive_rho=True,
        adaptive_rho_interval=50, schedule="fixed",
    )

    def make_inputs(key, active):
        ks = jax.random.split(key, 6)
        # sphere-cap-like subproblem data, built directly in kernel layout
        eye = jnp.eye(n, dtype=dtype)[:, :, None]
        d = 1.0 + jax.random.uniform(ks[0], (1, 1, B), dtype)
        Bt = eye * d  # SPD diagonal Hessian per lane
        x = jax.random.uniform(ks[1], (n, B), dtype, 0.2, 0.8)
        Jt = jnp.concatenate([2.0 * x[None, :, :], jnp.broadcast_to(eye, (n, n, B))], axis=0)
        gt = -jnp.ones((n, B), dtype)
        ct = jnp.concatenate([jnp.sum(x * x, axis=0, keepdims=True), x], axis=0)
        lt = jnp.zeros((m, B), dtype) - ct
        ut = jnp.concatenate(
            [jax.random.uniform(ks[2], (1, B), dtype, 40.0, 90.0), jnp.ones((n, B), dtype)],
            axis=0,
        ) - ct
        st = jnp.zeros((n, B), dtype)
        dgl = jnp.zeros((n, B), dtype)
        act = jnp.full((B,), float(active), dtype)
        zeros = jnp.zeros((B,), dtype)
        mskt = jnp.stack([zeros, zeros, act, zeros, zeros, zeros, zeros, zeros], axis=0)
        xt = jnp.zeros((n, B), dtype)
        zt = jnp.zeros((m, B), dtype)
        yt = jnp.zeros((m, B), dtype)
        return Bt, Jt, gt, lt, ut, st, dgl, mskt, xt, zt, yt

    f = jax.jit(lambda *a: sqp_step_kernel(*a, settings=settings, do_bfgs=False))

    def fetch(out):
        # force completion with a host fetch — block_until_ready does NOT
        # synchronize through the relay (CLAUDE.md methodology note)
        leaves = jax.tree.leaves(out)
        _ = np.asarray(leaves[0])
        return out

    def timeit(label, fn, make, reps=3):
        inp = jax.jit(make)(jax.random.PRNGKey(0))
        _ = [np.asarray(v) for v in jax.tree.leaves(inp)][:1]
        t0 = time.perf_counter()
        out = fetch(fn(*inp) if isinstance(inp, tuple) else fn(inp))
        log(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s")
        ts = []
        for rep in range(1, reps + 1):
            inp = jax.jit(make)(jax.random.PRNGKey(rep))
            _ = [np.asarray(v) for v in jax.tree.leaves(inp)][:1]
            t0 = time.perf_counter()
            out = fetch(fn(*inp) if isinstance(inp, tuple) else fn(inp))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        log(f"  [{label}] t={t*1e3:.1f}ms")
        return t, out

    log(f"kbench2 n={n} m={m} B={B}")

    # 1. kernel, all lanes INACTIVE: launch + operand pipe + skip
    t_skip, _ = timeit("kernel all-skip   ", f, lambda k: make_inputs(k, 0.0))
    # 2. kernel, active, cold start (full 5 chunks of 10 iters + factor)
    t_cold, out = timeit("kernel cold-active", f, lambda k: make_inputs(k, 1.0))
    it_mean = float(np.mean(np.asarray(out[4][1])))
    nfact = float(np.mean(np.asarray(out[4][8])))
    log(f"    cold: iters_mean={it_mean:.1f} nfact_mean={nfact:.2f}")

    # 3. XLA pieces at the same shapes
    hp = lax.Precision.HIGHEST

    def mk_einsum_inputs(key):
        k1, k2 = jax.random.split(key)
        Jt = jax.random.normal(k1, (m, n, B), dtype)
        lam = jax.random.normal(k2, (B, m), dtype)
        return Jt, lam

    e1 = jax.jit(lambda Jt, lam: jnp.einsum("mnb,bm->bn", Jt, lam, precision=hp))
    timeit("einsum mnb,bm->bn ", e1, mk_einsum_inputs)

    def mk_e2(key):
        k1, k2 = jax.random.split(key)
        return jax.random.normal(k1, (n, n, B), dtype), jax.random.normal(k2, (B, n), dtype)

    e2 = jax.jit(lambda Bt, p: jnp.einsum("ijb,bj->bi", Bt, p, precision=hp))
    timeit("einsum ijb,bj->bi ", e2, mk_e2)

    from sqp_solver_tpu.sqp.solver_kernel import _bfgs_update_t

    def mk_bfgs(key):
        ks = jax.random.split(key, 4)
        Bt = jnp.eye(n, dtype=dtype)[:, :, None] * jnp.ones((1, 1, B), dtype)
        s = jax.random.normal(ks[1], (B, n), dtype) * 0.01
        y = jax.random.normal(ks[2], (B, n), dtype) * 0.01
        reset = jnp.zeros((B,), jnp.bool_)
        upd = jnp.ones((B,), jnp.bool_)
        return Bt, s, y, reset, upd

    bf = jax.jit(_bfgs_update_t)
    timeit("bfgs_update_t     ", bf, mk_bfgs)

    # 4. J build via the layout-native hook (bench problem)
    def mk_x(key):
        return (jax.random.uniform(key, (B, n), dtype),)

    def hook(x):
        eye_t = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, B))
        return jnp.concatenate([2.0 * x.T[None, :, :], eye_t], axis=0)

    timeit("J hook (m,n,B)    ", jax.jit(hook), lambda k: mk_x(k)[0])

    log(
        f"summary: launch/skip={t_skip*1e3:.1f}ms  cold-call={t_cold*1e3:.1f}ms "
        f"-> factor+iters={((t_cold-t_skip))*1e3:.1f}ms"
    )


if __name__ == "__main__":
    main()
