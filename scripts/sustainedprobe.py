"""Sustained receding-horizon MPC throughput (one jit, K chained steps).

The realistic embedded-fleet workload: K control steps of the
double-integrator fleet, each step building q/l/u from the plant state,
solving B QPs warm-started from the previous step, applying the first
input, and stepping the plants — ALL inside one lax.scan, so the ~25 ms
relay dispatch floor is paid once per K solves instead of once per
solve.

Run on the real TPU: python scripts/sustainedprobe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from sqp_solver_tpu.models.mpc import _double_integrator_condensed
from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp.types import QPSettings, QPState, QuadraticProblem

B, H, K = 4096, 16, 10
dt = 0.1
salt = int(time.time() * 1e3) % 100000

Sx, Su = _double_integrator_condensed(H, dt)
Sp_x, Sp_u = Sx[:, 0, :], Su[:, 0, :]
Sv_x, Sv_u = Sx[:, 1, :], Su[:, 1, :]
P1 = jnp.asarray(Sp_u.T @ Sp_u + 0.1 * np.eye(H), jnp.float32)
A1 = jnp.asarray(np.concatenate([np.eye(H), Sv_u], axis=0), jnp.float32)
u_max, v_max = 2.0, 1.5
Ad = jnp.asarray([[1.0, dt], [0.0, 1.0]], jnp.float32)
Bd = jnp.asarray([[0.5 * dt * dt], [dt]], jnp.float32)
Spx_u = jnp.asarray(Sp_u, jnp.float32)
Spx_x = jnp.asarray(Sp_x.T, jnp.float32)
Svx_x = jnp.asarray(Sv_x.T, jnp.float32)

settings = QPSettings(
    alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=200,
    check_termination=25, adaptive_rho=True, adaptive_rho_interval=50,
    schedule="fixed",
)


def rollout(x0):
    qp_state0 = QPState(
        x=jnp.zeros((B, H), jnp.float32),
        z=jnp.zeros((B, 2 * H), jnp.float32),
        y=jnp.zeros((B, 2 * H), jnp.float32),
    )

    def step(carry, _):
        state, qp_state = carry
        q = (state @ Spx_x) @ Spx_u
        vel_off = state @ Svx_x
        l = jnp.concatenate(
            [jnp.full((B, H), -u_max), -v_max - vel_off], axis=1)
        u = jnp.concatenate(
            [jnp.full((B, H), u_max), v_max - vel_off], axis=1)
        qp = QuadraticProblem(
            P=jnp.broadcast_to(P1, (B, H, H)), q=q,
            A=jnp.broadcast_to(A1, (B, 2 * H, H)), l=l, u=u,
        )
        res = qp_solve_batch(qp, settings, state=qp_state, impl="kernel")
        u0 = res.x[:, 0]
        nxt = state @ Ad.T + u0[:, None] * Bd[:, 0]
        ys = (
            jnp.mean((res.info.status == 0).astype(jnp.float32)),
            jnp.sqrt(jnp.mean(nxt[:, 0] ** 2)),
            jnp.mean(res.info.iter.astype(jnp.float32)),
        )
        return (nxt, res.state), ys

    (xf, _), ys = jax.lax.scan(step, (x0, qp_state0), None, length=K)
    return xf, ys


run = jax.jit(rollout)
key = jax.random.PRNGKey(0)
x0 = jax.random.uniform(key, (B, 2), jnp.float32, -1.0, 1.0)
t0 = time.perf_counter()
_ = np.asarray(run(x0)[1][0])
print(f"compile+first: {time.perf_counter()-t0:.0f}s", flush=True)

for rep in (1, 2, 3):
    key = jax.random.PRNGKey(salt + rep)
    x0 = jax.random.uniform(key, (B, 2), jnp.float32, -1.0, 1.0)
    jax.block_until_ready(x0)
    t0 = time.perf_counter()
    xf, ys = run(x0)
    solved = np.asarray(ys[0])
    wall = time.perf_counter() - t0
    pos = np.asarray(ys[1])
    iters = np.asarray(ys[2])
    rate = K * B / wall
    print(
        f"rep {rep}: {wall*1e3:.1f} ms for {K}x{B} solves -> {rate:.0f} "
        f"solves/s sustained; solved_min={solved.min():.3f} "
        f"pos_rms {pos[0]:.3f}->{pos[-1]:.3f} "
        f"iters/step p50={np.percentile(iters,50):.0f} last={iters[-1]:.0f}",
        flush=True,
    )
