#!/usr/bin/env python
"""A/B the polish sweep formulations via in-program repetition slopes.

Old form: 6 batched matvecs per sweep.  New form: stacked S=[P;A~] + carried
w, 3 matvecs.  Standalone wall times sit on the ~30-37 ms dispatch floor, so
each timed program runs K sweeps via lax.scan and the per-sweep cost is the
slope between K=6 and K=30.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
sys.path.insert(0, "/root/repo")
from sqp_solver_tpu.utils.precision import hmat

log = lambda *a: print(*a, file=sys.stderr, flush=True)
hp = lax.Precision.HIGHEST
_mv = lambda M, v: jnp.einsum("...ij,...j->...i", M, v, precision=hp)
_mtv = lambda M, v: jnp.einsum("...ij,...i->...j", M, v, precision=hp)

B, n, m = 4096, 32, 33
d_c = jnp.float32(1e-2)

def setup(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    G = jax.random.normal(k1, (B, n, n), jnp.float32)
    P = hmat(G, G.mT) / n + 0.1 * jnp.eye(n)
    A_m = jax.random.normal(k2, (B, m, n), jnp.float32)
    act = jnp.ones((B, m), bool)
    r1 = jax.random.normal(k3, (B, n), jnp.float32)
    r2 = jax.random.normal(k4, (B, m), jnp.float32)
    M = P + d_c * jnp.eye(n) + (1.0 / d_c) * hmat(A_m.mT, A_m)
    L = jnp.linalg.cholesky(M)
    Li = jax.scipy.linalg.solve_triangular(L, jnp.broadcast_to(jnp.eye(n), M.shape), lower=True)
    Minv = hmat(Li.mT, Li)
    return P, A_m, act, r1, r2, Minv

def run_old(ops, K):
    P, A_m, act, r1, r2, Minv = ops
    def sweep(c, _):
        x, nu = c
        res1 = r1 - (_mv(P, x) + _mtv(A_m, nu))
        res2 = jnp.where(act, r2 - _mv(A_m, x), 0.0)
        dx = _mv(Minv, res1 + (1.0 / d_c) * _mtv(A_m, res2))
        dnu = jnp.where(act, (_mv(A_m, dx) - res2) / d_c, 0.0)
        return (x + dx, nu + dnu), None
    (x, nu), _ = lax.scan(sweep, (jnp.zeros_like(r1), jnp.zeros_like(r2)), None, length=K)
    return x + nu.sum(-1, keepdims=True)

def run_new(ops, K):
    P, A_m, act, r1, r2, Minv = ops
    S = jnp.concatenate([P, A_m], axis=-2)
    def sweep(c, _):
        x, nu, w = c
        res2 = jnp.where(act, r2 - w[..., n:], 0.0)
        dx = _mv(Minv, r1 - w[..., :n] - _mtv(A_m, nu - (1.0 / d_c) * res2))
        dw = _mv(S, dx)
        return (x + dx, nu + jnp.where(act, (dw[..., n:] - res2) / d_c, 0.0), w + dw), None
    x0 = jnp.zeros_like(r1)
    (x, nu, w), _ = lax.scan(sweep, (x0, jnp.zeros_like(r2), _mv(S, x0)), None, length=K)
    return x + nu.sum(-1, keepdims=True)

for name, fn in (("old6", run_old), ("new3", run_new)):
    for K in (6, 30):
        f = jax.jit(lambda key, K=K, fn=fn: fn(setup(key), K))
        _ = np.asarray(f(jax.random.PRNGKey(0)))
        ts = []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(rep); jax.block_until_ready(key)
            t0 = time.perf_counter(); _ = np.asarray(f(key)); ts.append(time.perf_counter() - t0)
        log(f"{name} K={K}: {min(ts)*1e3:.1f}ms")
