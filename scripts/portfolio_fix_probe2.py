"""Separate classification error from polish-solve error on the bad
portfolio lanes (bench config, CPU).

For each bad lane, solve the reduced active-set KKT system EXACTLY in
f64 numpy (lstsq on the full KKT with inactive rows dropped) using
(a) the oracle's active set and (b) the classifier's guess from the
ADMM duals.  If (a) recovers x* but (b) doesn't, it's classification;
if (a) itself misses, the degenerate system is the problem.

CPU run: JAX_PLATFORMS=cpu python scripts/portfolio_fix_probe2.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from sqp_solver_tpu.models import families as fam
from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp.polish import RHO_TOL
from sqp_solver_tpu.qp.types import QPSettings
from sqp_solver_tpu.runtime.native import native_available, native_qp_solve_batch

B = 128
base = QPSettings(
    alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=300,
    check_termination=25, adaptive_rho=True, adaptive_rho_interval=50,
    polish=True, scaling=10, schedule="fixed",
)
oracle_settings = QPSettings(
    eps_abs=1e-10, eps_rel=1e-10, max_iter=20000, adaptive_rho=True
)

key = jax.random.PRNGKey(7)
prob = jax.jit(lambda k: fam.portfolio_qp_batch_device(k, B, 16, 4))(key)
assert native_available()
P = np.asarray(prob.P, np.float64)
q = np.asarray(prob.q, np.float64)
A = np.asarray(prob.A, np.float64)
l = np.asarray(prob.l, np.float64)
u = np.asarray(prob.u, np.float64)
x_or, y_or, st_or, _ = native_qp_solve_batch(P, q, A, l, u, oracle_settings)
ok = st_or == 0

res = jax.jit(lambda p: qp_solve_batch(p, base, impl="fused"))(prob)
x = np.asarray(res.x, np.float64)
y = np.asarray(res.y, np.float64)
err = np.abs(x - x_or).max(axis=1)
bad = np.where((err > 1e-5) & ok)[0]
print(f"bad lanes: {bad} errs {err[bad]}")


def exact_reduced(i, act, b):
    """f64 exact solve of [P Ã'; Ã 0][x;nu] = [-q; b] via lstsq."""
    n = P.shape[-1]
    Am = A[i][act]
    K = np.block([
        [P[i], Am.T],
        [Am, np.zeros((Am.shape[0], Am.shape[0]))],
    ])
    rhs = np.concatenate([-q[i], b])
    sol, *_ = np.linalg.lstsq(K, rhs, rcond=None)
    return sol[:n]


for i in bad:
    eq = (u[i] - l[i]) < RHO_TOL
    # oracle active set (slack-based, 1e-9)
    z_or = A[i] @ x_or[i]
    act_or = eq | (z_or - l[i] < 1e-9) | (u[i] - z_or < 1e-9)
    b_or = np.where(z_or - l[i] < 1e-9, l[i], u[i])
    b_or = np.where(eq, 0.5 * (l[i] + u[i]), b_or)[act_or]
    xa = exact_reduced(i, act_or, b_or)

    # classifier's guess from the solver duals
    ytol = 1e-5 * (1.0 + np.max(np.abs(y[i])))
    act_low = (y[i] < -ytol) & ~eq
    act_up = (y[i] > ytol) & ~eq
    act_cl = act_low | act_up | eq
    b_cl = np.where(eq, 0.5 * (l[i] + u[i]), np.where(act_low, l[i], u[i]))[act_cl]
    xb = exact_reduced(i, act_cl, b_cl)

    nact_or = int(act_or.sum())
    nact_cl = int(act_cl.sum())
    print(
        f"lane {i}: err_solver={err[i]:.2e} "
        f"| exact(oracle act, {nact_or}) err={np.abs(xa - x_or[i]).max():.2e} "
        f"| exact(classified act, {nact_cl}) err={np.abs(xb - x_or[i]).max():.2e} "
        f"| act diff rows={int((act_or != act_cl).sum())}"
    )
    d = np.where(act_or != act_cl)[0]
    if len(d):
        for r in d:
            print(
                f"    row {r}: oracle_act={bool(act_or[r])} slack_or="
                f"{min(z_or[r]-l[i][r], u[i][r]-z_or[r]):.2e} y_or={y_or[i][r]:.2e} "
                f"y_solver={y[i][r]:.2e} l={l[i][r]:.3g} u={u[i][r]:.3g}"
            )
