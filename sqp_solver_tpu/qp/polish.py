"""Solution polish: active-set refinement after ADMM convergence.

ADMM converges linearly, so at practical tolerances the returned iterates
carry O(eps_abs)-level error — the dominant accuracy limit of the whole
stack (and, through the QP duals, of the SQP's KKT residuals in f32).
Polish takes the converged iterate, guesses the active set from the sign
of the duals (the OSQP recipe, with a relative threshold so eps-noise
duals on inactive rows don't count; EQUALITY rows are always active), and
re-solves the *equality-constrained* KKT system on that active set:

    [[P + dI,  Ãᵀ], [Ã, -dI]] [x; nu] = [-q; b̃]

where Ã zeroes the inactive rows (their equations reduce to nu_i = 0) and
d regularizes the factorization.  The d-bias is then removed by iterative
refinement against the IDEAL (d-free) active-set operator

    P x + Ãᵀnu = -q,   Ã x = b̃ (active rows),   nu = 0 (inactive rows),

which converges to the true active-set solution: the factored matrix is
only the preconditioner, so the final accuracy is the dtype floor, not
O(d).  Measured on the badly-scaled huber family in f32: ADMM stalls at
~1e-2, direct d=1e-6 LDLᵀ is unusable (zero Hessian block => 1e-6 pivots
against O(1) couplings), this scheme reaches ~2e-7 vs the long-double
oracle.

The polished candidate is accepted PER PROBLEM only where the KKT error
improves, judged lexicographically: (stationarity, violation) first — the
pair that defines SOLVED — then dual-sign error as tiebreaker (a flat max
over all three lets polish trade stationarity for complementarity and
un-solve a solved problem).

(The reference has no analog; this is the polish step the OSQP paper
[PAPERS.md] specifies, §5.2, upgraded with ideal-operator refinement.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sqp_solver_tpu.ops.linear_solver import ldlt_factor, ldlt_solve
from sqp_solver_tpu.qp.classify import RHO_TOL
from sqp_solver_tpu.qp.types import QPResult, QPSettings, QuadraticProblem

__all__ = ["polish_qp"]


def _mv(M, v):
    return jnp.einsum("...ij,...j->...i", M, v, precision=lax.Precision.HIGHEST)


def _linf(v):
    return jnp.max(jnp.abs(v), axis=-1)


def polish_qp(
    qp: QuadraticProblem,
    result: QPResult,
    settings: QPSettings = QPSettings(),
    delta: float | None = None,
    refine_steps: int = 3,
) -> QPResult:
    """Polish a (possibly batched) QP result.  Shape-polymorphic: works on
    single problems (n,), (m,) and batches (B, n), (B, m).

    ``delta`` defaults per dtype: 1e-6 in f64, 1e-4 in f32 (the larger f32
    value keeps the factorization stable; the refinement removes the bias
    either way).
    """
    del settings  # polish parameters are its own; settings kept for API symmetry
    P, q, A, l, u = qp.P, qp.q, qp.A, qp.l, qp.u
    dtype = P.dtype
    if delta is None:
        delta = 1e-6 if jnp.finfo(dtype).bits >= 64 else 1e-4
    n = P.shape[-1]
    m = A.shape[-2]
    x, y, z = result.x, result.y, result.z

    # --- active set from dual signs (lower if y<0, upper if y>0), with a
    # relative threshold: ADMM leaves O(eps)-noise duals on inactive rows.
    # EQUALITY rows (the classifier's criterion, u-l < RHO_TOL) are always
    # active regardless of the dual: an equality constraint with a small
    # multiplier is still a constraint — guessing it inactive re-solves a
    # different problem (catastrophic on equality-heavy QPs like the huber
    # family). ---
    eq = (u - l) < RHO_TOL
    ytol = 1e-5 * (1.0 + jnp.max(jnp.abs(y), axis=-1, keepdims=True))
    act_low = (y < -ytol) & ~eq
    act_up = (y > ytol) & ~eq
    act = act_low | act_up | eq
    b = jnp.where(
        eq,
        0.5 * (l + u),
        jnp.where(act_low, l, jnp.where(act_up, u, 0.0)),
    )
    b = jnp.where(act, b, 0.0)

    with jax.default_matmul_precision("highest"):
        d_c = jnp.asarray(delta, dtype)
        A_m = jnp.where(act[..., None], A, 0.0)
        eye_n = jnp.eye(n, dtype=dtype)
        eye_m = jnp.eye(m, dtype=dtype)
        top = jnp.concatenate([P + d_c * eye_n, A_m.mT], axis=-1)
        bot = jnp.concatenate(
            [A_m, jnp.zeros_like(A_m[..., :1]) - d_c * eye_m], axis=-1
        )
        K = jnp.concatenate([top, bot], axis=-2)
        rhs = jnp.concatenate([-q, b], axis=-1)
        L, dd = ldlt_factor(K)
        sol = ldlt_solve(L, dd, rhs)
        # iterative refinement against the IDEAL (delta-free) active-set
        # operator: the factored K is only the preconditioner, so the
        # converged solution has no O(delta) bias
        for _ in range(refine_steps):
            xc = sol[..., :n]
            nu = jnp.where(act, sol[..., n:], 0.0)
            r1 = -q - (_mv(P, xc) + _mv(A_m.mT, nu))
            r2 = jnp.where(act, b - _mv(A_m, xc), 0.0)
            sol = sol + ldlt_solve(L, dd, jnp.concatenate([r1, r2], axis=-1))
        x_pol = sol[..., :n]
        y_pol = jnp.where(act, sol[..., n:], 0.0)
        z_pol = jnp.clip(_mv(A, x_pol), l, u)

    # --- accept per problem only where the KKT error improves (lexico) ---
    def kkt_err(xx, yy):
        Ax = _mv(A, xx)
        res_d = _linf(_mv(P, xx) + q + _mv(A.mT, yy))
        viol = jnp.maximum(
            jnp.max(jnp.where(jnp.isfinite(l), l - Ax, 0.0), axis=-1),
            jnp.max(jnp.where(jnp.isfinite(u), Ax - u, 0.0), axis=-1),
        )
        at_l = Ax <= l + 1e-6 * (1.0 + jnp.abs(l))
        at_u = Ax >= u - 1e-6 * (1.0 + jnp.abs(u))
        dsv = jnp.max(
            jnp.where(~at_u, jnp.maximum(yy, 0.0), 0.0)
            + jnp.where(~at_l, jnp.maximum(-yy, 0.0), 0.0),
            axis=-1,
        )
        return jnp.maximum(res_d, viol), dsv

    bad_pol = jnp.isnan(x_pol).any(axis=-1)
    main_new, dsv_new = kkt_err(x_pol, y_pol)
    main_old, dsv_old = kkt_err(x, y)
    better = (
        (main_new < main_old)
        | ((main_new <= main_old) & (dsv_new < dsv_old))
    ) & (~bad_pol)

    def sel(a, bb):
        cond = better
        while cond.ndim < a.ndim:
            cond = cond[..., None]
        return jnp.where(cond, a, bb)

    return QPResult(x=sel(x_pol, x), y=sel(y_pol, y), z=sel(z_pol, z), info=result.info)
