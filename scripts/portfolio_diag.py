"""Diagnose the portfolio family's accuracy outlier (VERDICT r4 ask #5).

BENCH_r04: portfolio err_p99 vs the long-double oracle 1.32e-4, solved
0.998 — vs 1.9e-7..1.1e-6 and 1.000 for random/lasso/huber/svm at the
same untuned config.  This probe runs the exact bench config on CPU
(fused tier; same math as the kernel tier) and decomposes the error:
which lanes, which components (active-at-box vs free), what the polish
active-set classification did, and whether passes/eps/scaling move it.

CPU run: JAX_PLATFORMS=cpu python scripts/portfolio_diag.py
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from sqp_solver_tpu.models import families as fam
from sqp_solver_tpu.parallel.batch import qp_solve_batch
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
x_or, y_or, st_or, it_or = native_qp_solve_batch(
    np.asarray(prob.P, np.float64), np.asarray(prob.q, np.float64),
    np.asarray(prob.A, np.float64), np.asarray(prob.l, np.float64),
    np.asarray(prob.u, np.float64), oracle_settings,
)
ok = st_or == 0
print(f"oracle solved {ok.sum()}/{B}")

variants = {
    "bench (300it p=1? scaling10)": base,
    "600 iters": dataclasses.replace(base, max_iter=600),
    "eps 1e-5": dataclasses.replace(base, eps_abs=1e-5, eps_rel=1e-5, max_iter=600),
    "no polish": dataclasses.replace(base, polish=False),
    "no scaling": dataclasses.replace(base, scaling=0),
    "polish sweeps=12": dataclasses.replace(base, polish_sweeps=12),
    "polish delta=1e-4": dataclasses.replace(base, polish_delta=1e-4),
}

for name, s in variants.items():
    res = jax.jit(lambda p, s=s: qp_solve_batch(p, s, impl="fused"))(prob)
    x = np.asarray(res.x, np.float64)
    err = np.abs(x[ok] - x_or[ok])
    per_lane = err.max(axis=1)
    p99 = np.percentile(err, 99)
    print(
        f"{name:30s} solved={float(np.mean(np.asarray(res.info.status)==0)):.3f} "
        f"err_p99={p99:.2e} err_max={err.max():.2e} "
        f"lanes>1e-5: {(per_lane > 1e-5).sum()}/{ok.sum()}"
    )

# decompose the worst lanes under the bench config
res = jax.jit(lambda p: qp_solve_batch(p, base, impl="fused"))(prob)
x = np.asarray(res.x, np.float64)
y = np.asarray(res.y, np.float64)
idx_ok = np.where(ok)[0]
err = np.abs(x[ok] - x_or[ok])
worst = idx_ok[np.argsort(err.max(axis=1))[-5:]]
A = np.asarray(prob.A, np.float64)
l = np.asarray(prob.l, np.float64)
u = np.asarray(prob.u, np.float64)
for i in worst:
    e = np.abs(x[i] - x_or[i])
    z_or = A[i] @ x_or[i]
    # oracle active set: rows at a bound (1e-9 slack)
    act_lo = z_or - l[i] < 1e-9
    act_hi = u[i] - z_or < 1e-9
    zi = A[i] @ x[i]
    act_lo_f = zi - l[i] < 1e-6
    act_hi_f = u[i] - zi < 1e-6
    mism = (act_lo != act_lo_f) | (act_hi != act_hi_f)
    # multiplier magnitude on the misclassified rows (weakly active?)
    ymis = np.abs(y_or[i][mism]) if mism.any() else np.array([0.0])
    print(
        f"lane {i}: err_max={e.max():.2e} at comp {e.argmax()} "
        f"(n={x.shape[1]}) active(oracle)={int(act_lo.sum()+act_hi.sum())} "
        f"mismatched rows={int(mism.sum())} |y_oracle| on mismatches "
        f"max={ymis.max():.2e}"
    )
