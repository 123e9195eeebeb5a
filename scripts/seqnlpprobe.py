"""Sustained nonlinear serving probe: sqp_solve_sequence on TPU.

The nonlinear twin of scripts/sustainedprobe.py — K warm-started batch
SQP solves of the shrinking-cap sphere family inside ONE compiled
program (sqp.sequence.sqp_solve_sequence).  Consecutive steps shrink
each problem's cap radius 2%, so steps are small perturbations (the
receding-horizon regime) and a 1-outer + polish budget tracks the
optimum from the previous step's (x, lam) warm pair.

Run on the real TPU: python scripts/seqnlpprobe.py
"""

import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from sqp_solver_tpu.qp.types import QPSettings
from sqp_solver_tpu.sqp import SQPSettings, sqp_solve_sequence
from sqp_solver_tpu.sqp.types import NonlinearProblem
from sqp_solver_tpu.parallel.batch import sqp_solve_batch

B, N, K = 4096, 32, 8
DT = jnp.float32


def objective(x, params):
    del params
    return -jnp.sum(x)


def constraint(x, params):
    del params
    return jnp.concatenate([jnp.array([x @ x]), x])


def constraint_linearized_t(x, params):
    del params
    Bx, nx = x.shape
    cv = jnp.concatenate([jnp.sum(x * x, axis=1, keepdims=True), x], axis=1)
    eye_t = jnp.broadcast_to(jnp.eye(nx, dtype=x.dtype)[:, :, None], (nx, nx, Bx))
    return cv, jnp.concatenate([2.0 * x.T[None, :, :], eye_t], axis=0)


def lagrangian_hessian_t(x, lam, params):
    del params
    nx = x.shape[1]
    return jnp.eye(nx, dtype=x.dtype)[:, :, None] * (2.0 * lam[:, 0])[None, None, :]


def make_nlp(r):
    l = jnp.zeros((B, N + 1), DT)
    u = jnp.concatenate([(r**2)[:, None], jnp.ones((B, N), DT)], axis=1)
    prob = NonlinearProblem(
        l=l, u=u, params=r, objective=objective, constraint=constraint,
        constraint_linearized_t=constraint_linearized_t,
        lagrangian_hessian_t=lagrangian_hessian_t,
    )
    return prob, jnp.full((B, N), 0.25, DT)


def advance(r, res):
    return 0.98 * r, jnp.mean((res.info.status == 0).astype(jnp.float32))


cold_settings = SQPSettings(
    max_iter=3, eps_prim=2e-3, eps_dual=2e-3, termination="kkt",
    schedule="fixed", qp_impl="kernel", polish=True, polish_passes=2,
    line_search_max_iter=5,
    qp=QPSettings(
        alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
        check_termination=10, warm_start=True, adaptive_rho=True,
        adaptive_rho_interval=50, schedule="fixed",
    ),
)
import dataclasses
warm_settings = dataclasses.replace(cold_settings, max_iter=1)


def serve(r0):
    # cold start: full 3-outer budget on the first problem
    prob0, x00 = make_nlp(r0)
    res0 = sqp_solve_batch(prob0, x00, None, cold_settings, impl="fused")
    r1, _ = advance(r0, res0)
    # warm horizon: K steps at 1 outer + 2 polish passes each
    fr, carry_f, warm_f = sqp_solve_sequence(
        make_nlp, advance, r1, K, warm_settings, impl="fused",
        warm0=(res0.x, res0.lam),
    )
    return fr, carry_f, warm_f


run = jax.jit(serve)
sqn = float(np.sqrt(N))
salt = int(time.time_ns()) % (2**30)


def r0_of(key):
    return jax.random.uniform(key, (B,), DT, 0.55 * sqn, 0.9 * sqn)


t0 = time.perf_counter()
fr, carry_f, warm_f = run(r0_of(jax.random.PRNGKey(salt)))
_ = np.asarray(fr)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

times = []
for rep in range(1, 4):
    r0 = r0_of(jax.random.PRNGKey(salt + rep))
    jax.block_until_ready(r0)
    t0 = time.perf_counter()
    fr, carry_f, warm_f = run(r0)
    sf = np.asarray(fr)
    times.append(time.perf_counter() - t0)
t = min(times)

# independent f64 KKT certification of the LAST warm step: its problem
# is the final carry un-advanced by one shrink
r_last = np.asarray(carry_f, np.float64) / 0.98
xs = np.asarray(warm_f[0], np.float64)
lam = np.asarray(warm_f[1], np.float64)
st = -1.0 + 2.0 * lam[:, 0:1] * xs + lam[:, 1:]
dr = np.abs(st).max(axis=1)
pv = np.maximum(np.sum(xs * xs, axis=1) - r_last**2, 0.0)
pv = np.maximum(pv, np.maximum(xs - 1.0, -xs).max(axis=1))
cert = float(np.mean((dr <= 1e-4) & (pv <= 1e-4)))

total = (K + 1) * B
print(
    f"sustained NLP: 1 cold + {K} warm steps x B={B} n={N} t={t*1e3:.1f}ms "
    f"-> {total/t:.0f} solves/s; solved(per warm step)={sf.round(3).tolist()} "
    f"last-step f64 KKT cert@1e-4={cert:.3f} "
    f"(dr_p99={np.percentile(dr,99):.1e} pv_p99={np.percentile(pv,99):.1e})",
    file=sys.stderr,
)
