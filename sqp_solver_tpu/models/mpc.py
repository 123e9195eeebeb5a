"""Batched QP families for the MPC / throughput benchmarks.

The driver's north-star config is "4096 independent small QPs per step via
vmap" (BASELINE.json configs[3]).  Two generators:

* :func:`mpc_qp_batch` — condensed receding-horizon MPC for a double
  integrator: one shared (P, A) and per-instance (q, l, u) driven by the
  batch of initial states, the classic embedded-MPC pattern.
* :func:`random_qp_batch` — random strictly-convex box-constrained QPs,
  fully heterogeneous across the batch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sqp_solver_tpu.qp.types import QuadraticProblem

__all__ = ["mpc_qp_batch", "mpc_qp_stagewise_batch", "random_qp_batch"]


def _double_integrator_condensed(horizon: int, dt: float = 0.1):
    """Condense pos/vel double-integrator dynamics over `horizon` steps:
    returns (Su_pos, Sx_pos, Su_vel, Sx_vel) with
    pos = Sx_pos @ x0 + Su_pos @ u, vel likewise."""
    A = np.array([[1.0, dt], [0.0, 1.0]])
    B = np.array([[0.5 * dt * dt], [dt]])
    nx = 2
    Sx = np.zeros((horizon, nx, nx))
    Su = np.zeros((horizon, nx, horizon))
    Ak = np.eye(nx)
    for k in range(horizon):
        Ak = A @ Ak
        Sx[k] = Ak
        for j in range(k + 1):
            Su[k][:, j] = (np.linalg.matrix_power(A, k - j) @ B)[:, 0]
    return Sx, Su


def mpc_qp_batch(
    batch: int,
    horizon: int = 16,
    dt: float = 0.1,
    u_max: float = 2.0,
    v_max: float = 1.5,
    r_weight: float = 0.1,
    seed: int = 0,
    dtype=jnp.float32,
) -> QuadraticProblem:
    """Batched condensed MPC QP (n = horizon vars, m = 2*horizon constr).

    Decision variable: input sequence u.  Cost: position tracking to the
    origin + input effort.  Constraints: |u| <= u_max (box rows) and
    |vel| <= v_max (dense rows).  The batch axis varies the initial state,
    so P and A are shared and q, l, u vary — broadcast accordingly.
    """
    Sx, Su = _double_integrator_condensed(horizon, dt)
    Sp_x, Sp_u = Sx[:, 0, :], Su[:, 0, :]  # position maps
    Sv_x, Sv_u = Sx[:, 1, :], Su[:, 1, :]  # velocity maps

    P = Sp_u.T @ Sp_u + r_weight * np.eye(horizon)
    # constraints: u box + velocity bounds
    A_mat = np.concatenate([np.eye(horizon), Sv_u], axis=0)

    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-1.0, 1.0, size=(batch, 2))

    q = (x0 @ Sp_x.T) @ Sp_u  # (batch, horizon)
    vel_off = x0 @ Sv_x.T  # (batch, horizon)
    l = np.concatenate(
        [np.full((batch, horizon), -u_max), -v_max - vel_off], axis=1
    )
    u = np.concatenate([np.full((batch, horizon), u_max), v_max - vel_off], axis=1)

    return QuadraticProblem(
        P=jnp.asarray(np.broadcast_to(P, (batch, horizon, horizon)), dtype=dtype),
        q=jnp.asarray(q, dtype=dtype),
        A=jnp.asarray(
            np.broadcast_to(A_mat, (batch, 2 * horizon, horizon)), dtype=dtype
        ),
        l=jnp.asarray(l, dtype=dtype),
        u=jnp.asarray(u, dtype=dtype),
    )


def mpc_qp_stagewise_batch(
    batch: int,
    horizon: int = 16,
    dt: float = 0.1,
    u_max: float = 2.0,
    v_max: float = 1.5,
    p_max: float = 5.0,
    q_weight=(1.0, 0.1),
    r_weight: float = 0.1,
    seed: int = 0,
    dtype=jnp.float32,
):
    """Stage-wise (non-condensed) MPC QP with a block-tridiagonal Schur
    matrix — the structured-KKT benchmark family.

    Decision variable: z = [(u_0, x_1), (u_1, x_2), ..., (u_{T-1}, x_T)]
    in per-stage blocks of size nu + nx = 3 (double integrator).  The cost
    is block-diagonal and every constraint row (dynamics equalities, input
    box, state box) touches at most two adjacent stage blocks, so
    M = P + sigma I + A' rho A is block-tridiagonal with block size 3 —
    solve with ``QPSettings(linear_solver="schur_block_tridiag",
    block_size=3)``.  This is the TPU-native counterpart of the
    reference's sparse QP path (``src/qp.cpp:161-270`` under
    ``QP_SOLVER_USE_SPARSE``): structure exploited in the factorization,
    dense-masked everywhere else.

    Returns (problem, block_size).  P, A are shared across the batch; the
    initial state enters through the k=0 dynamics equality bounds.
    """
    nx, nu = 2, 1
    b = nx + nu
    T = horizon
    n = b * T
    Ad = np.array([[1.0, dt], [0.0, 1.0]])
    Bd = np.array([[0.5 * dt * dt], [dt]])

    # cost: 0.5 sum x_k' Q x_k + u_k' R u_k  (block diagonal)
    Q = np.diag(q_weight)
    P = np.zeros((n, n))
    for k in range(T):
        o = b * k
        P[o : o + nu, o : o + nu] = r_weight * np.eye(nu)
        P[o + nu : o + b, o + nu : o + b] = Q

    # constraints: dynamics equalities (2T rows), u box (T), x box (2T)
    m = nx * T + nu * T + nx * T
    A_mat = np.zeros((m, n))
    r = 0
    dyn_rows = []
    for k in range(T):
        o = b * k
        # x_{k+1} - Ad x_k - Bd u_k = (Ad x0 if k == 0 else 0)
        A_mat[r : r + nx, o : o + nu] = -Bd
        A_mat[r : r + nx, o + nu : o + b] = np.eye(nx)
        if k > 0:
            o_prev = b * (k - 1)
            A_mat[r : r + nx, o_prev + nu : o_prev + b] = -Ad
        dyn_rows.append(r)
        r += nx
    for k in range(T):
        A_mat[r, b * k] = 1.0  # u_k
        r += 1
    for k in range(T):
        o = b * k + nu
        A_mat[r : r + nx, o : o + nx] = np.eye(nx)  # x_{k+1}
        r += nx

    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-1.0, 1.0, size=(batch, nx))
    rhs0 = x0 @ Ad.T  # (batch, nx): k=0 dynamics equality value

    l = np.zeros((batch, m))
    u = np.zeros((batch, m))
    # dynamics equalities
    l[:, : nx * T] = 0.0
    u[:, : nx * T] = 0.0
    l[:, :nx] = rhs0
    u[:, :nx] = rhs0
    # input box
    l[:, nx * T : nx * T + T] = -u_max
    u[:, nx * T : nx * T + T] = u_max
    # state box (pos, vel per stage)
    xlo = np.tile([-p_max, -v_max], T)
    xhi = np.tile([p_max, v_max], T)
    l[:, nx * T + T :] = xlo
    u[:, nx * T + T :] = xhi

    problem = QuadraticProblem(
        P=jnp.asarray(np.broadcast_to(P, (batch, n, n)), dtype=dtype),
        q=jnp.zeros((batch, n), dtype=dtype),
        A=jnp.asarray(np.broadcast_to(A_mat, (batch, m, n)), dtype=dtype),
        l=jnp.asarray(l, dtype=dtype),
        u=jnp.asarray(u, dtype=dtype),
    )
    return problem, b


def random_qp_batch(
    batch: int,
    n: int = 32,
    m: int = 48,
    seed: int = 0,
    dtype=jnp.float32,
) -> QuadraticProblem:
    """Batch of random strictly-convex QPs with guaranteed-feasible bounds."""
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(batch, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", M, M) + 0.1 * np.eye(n)
    q = rng.normal(size=(batch, n))
    A = rng.normal(size=(batch, m, n)) / np.sqrt(n)
    x_feas = rng.normal(size=(batch, n))
    Ax = np.einsum("bmn,bn->bm", A, x_feas)
    width = rng.uniform(0.1, 2.0, size=(batch, m))
    l = Ax - width
    u = Ax + width
    return QuadraticProblem(
        P=jnp.asarray(P, dtype=dtype),
        q=jnp.asarray(q, dtype=dtype),
        A=jnp.asarray(A, dtype=dtype),
        l=jnp.asarray(l, dtype=dtype),
        u=jnp.asarray(u, dtype=dtype),
    )
