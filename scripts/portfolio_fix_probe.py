"""Validate the primal-slack gate for polish active-set classification.

Round-4 diagnosis (scripts/portfolio_diag.py): portfolio's bad lanes each
misclassify exactly one DEGENERATE constraint — oracle-active at zero
slack with multiplier ~0 — because the dual-sign rule (|y| > ytol) can't
see it at 300 ADMM iterations.  Hypothesis: the ADMM z iterate IS clamped
at the bound on those rows (projection), so promoting zero-slack rows to
active recovers them.  This probe compares classification variants on the
exact bench config, on CPU, against the long-double oracle, across ALL
five families (the gate must not regress the healthy ones).

CPU run: JAX_PLATFORMS=cpu python scripts/portfolio_fix_probe.py
"""

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
from sqp_solver_tpu.qp.polish import (
    RHO_TOL,
    kkt_solve_schur_refined,
)
from sqp_solver_tpu.qp.types import QPSettings
from sqp_solver_tpu.runtime.native import native_available, native_qp_solve_batch

B = 128
base = QPSettings(
    alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=300,
    check_termination=25, adaptive_rho=True, adaptive_rho_interval=50,
    polish=False, scaling=10, schedule="fixed",
)
oracle_settings = QPSettings(
    eps_abs=1e-10, eps_rel=1e-10, max_iter=20000, adaptive_rho=True
)

FAMS = {
    "portfolio": lambda k: fam.portfolio_qp_batch_device(k, B, 16, 4),
    "random": lambda k: fam.random_qp_batch_device(k, B, 32, 33),
    "lasso": lambda k: fam.lasso_qp_batch_device(k, B, 16, 24),
    "huber": lambda k: fam.huber_qp_batch_device(k, B, 16, 24),
    "svm": lambda k: fam.svm_qp_batch_device(k, B, 16, 24),
}


def classify(l, u, y, z, mode, ptol_scale):
    eq = (u - l) < RHO_TOL
    ytol = 1e-5 * (1.0 + jnp.max(jnp.abs(y), axis=-1, keepdims=True))
    act_low = (y < -ytol) & ~eq
    act_up = (y > ytol) & ~eq
    if mode != "dual":
        ptol = ptol_scale * (1.0 + jnp.maximum(jnp.abs(l), jnp.abs(u)))
        at_low = jnp.isfinite(l) & (z - l <= ptol)
        at_up = jnp.isfinite(u) & (u - z <= ptol)
        if mode in ("promote", "both"):
            # zero-slack rows become active even with a tiny dual; keep
            # the dual's side when both bounds are touched (eq-like)
            act_low = (act_low | (at_low & ~at_up)) & ~eq
            act_up = (act_up | (at_up & ~at_low)) & ~eq
        if mode in ("demote", "both"):
            act_low = act_low & at_low
            act_up = act_up & at_up
    act = act_low | act_up | eq
    b = jnp.where(
        eq, 0.5 * (l + u), jnp.where(act_low, l, jnp.where(act_up, u, 0.0))
    )
    return act, jnp.where(act, b, 0.0)


def polish_variant(qp, res, mode, ptol_scale, delta=1e-2, sweeps=6):
    P, q, A, l, u = qp.P, qp.q, qp.A, qp.l, qp.u
    x, y, z = res.x, res.y, res.z
    with jax.default_matmul_precision("highest"):
        if mode.startswith("pass2"):
            act, b = classify(l, u, y, z, "dual", 0.0)
        else:
            act, b = classify(l, u, y, z, mode, ptol_scale)
        A_m = jnp.where(act[..., None], A, 0.0)
        x_pol, nu, fail = kkt_solve_schur_refined(
            P, A_m, act, -q, b, x0=x, nu0=y, delta=delta, sweeps=sweeps,
            use_kernel=False,
        )
        if mode.startswith("pass2"):
            eq = (u - l) < RHO_TOL
            ytol = 1e-5 * (1.0 + jnp.max(jnp.abs(y), axis=-1, keepdims=True))
            a1_low = (y < -ytol) & ~eq
            a1_up = (y > ytol) & ~eq
            zp = jnp.einsum("...ij,...j->...i", A, x_pol)
            vtol = ptol_scale * (1.0 + jnp.maximum(
                jnp.where(jnp.isfinite(l), jnp.abs(l), 0.0),
                jnp.where(jnp.isfinite(u), jnp.abs(u), 0.0)))
            # promote rows the pass-1 x visibly violates
            pro_low = jnp.isfinite(l) & (zp < l - vtol) & ~eq
            pro_up = jnp.isfinite(u) & (zp > u + vtol) & ~eq
            # demote pass-1 active rows whose equality multiplier has the
            # wrong sign (classic active-set dual test)
            stol = 1e-12
            act_low = ((a1_low & (nu <= stol)) | pro_low) & ~pro_up
            act_up = ((a1_up & (nu >= -stol)) | pro_up) & ~pro_low
            act2 = act_low | act_up | eq
            b2 = jnp.where(
                eq, 0.5 * (l + u),
                jnp.where(act_low, l, jnp.where(act_up, u, 0.0)))
            A_m2 = jnp.where(act2[..., None], A, 0.0)
            x_pol, nu, fail = kkt_solve_schur_refined(
                P, A_m2, act2, -q, jnp.where(act2, b2, 0.0),
                x0=x_pol, nu0=jnp.where(act2, nu, 0.0),
                delta=delta, sweeps=sweeps, use_kernel=False,
            )
            act = act2
    return x_pol, jnp.where(act, nu, 0.0), fail


assert native_available()
key = jax.random.PRNGKey(7)

for fname, gen in FAMS.items():
    prob = jax.jit(gen)(key)
    x_or, y_or, st_or, it_or = native_qp_solve_batch(
        np.asarray(prob.P, np.float64), np.asarray(prob.q, np.float64),
        np.asarray(prob.A, np.float64), np.asarray(prob.l, np.float64),
        np.asarray(prob.u, np.float64), oracle_settings,
    )
    ok = st_or == 0
    res = jax.jit(lambda p: qp_solve_batch(p, base, impl="fused"))(prob)
    rows = []
    for mode, ps in [
        ("dual", 0.0),
        ("pass2", 1e-9),
        ("pass2", 1e-7),
        ("pass2", 1e-6),
    ]:
        xp, yp, fail = polish_variant(prob, res, mode, ps)
        x = np.asarray(xp, np.float64)
        err = np.abs(x[ok] - x_or[ok])
        p99 = np.percentile(err, 99)
        bad = (err.max(axis=1) > 1e-5).sum()
        rows.append(
            f"  {mode:8s} ptol={ps:.0e} err_p99={p99:.2e} "
            f"max={err.max():.2e} lanes>1e-5={bad}/{ok.sum()} "
            f"fail={int(np.asarray(fail).sum())}"
        )
    print(f"{fname} (oracle ok {ok.sum()}/{B}):")
    print("\n".join(rows), flush=True)
