"""Differentiable NLP layer: `jax.grad` THROUGH the SQP solver.

``sqp_solve_diff(problem, x0, lam0, settings, impl)`` returns the primal
solution x*(problem) with a custom VJP that implicitly differentiates
the converged NLP KKT conditions at the guessed active set — the NLP
extension of :mod:`sqp_solver_tpu.qp.diff` (OptNet scheme), enabling
differentiable MPC and end-to-end learning of problem parameters.

Mathematics.  At the solution, with active constraint rows Ã = rows of
J(x*, θ) and their multipliers ν, the KKT system is

    ∇f(x*, θ) + J(x*, θ)'λ* = 0,      c_act(x*, θ) = b̃(l, u)

The adjoint (dz_x, dz_ν) solves the symmetric system with the TRUE
Lagrangian Hessian H = ∇²_x L:

    H dz_x + Ã' dz_ν = -g,      Ã dz_x = 0

(the polish machinery again — kkt_solve_schur_refined), and

    ∂ℓ/∂θ = ⟨dz_x, ∂θ ∇_x L⟩ + ⟨dz_ν, ∂θ c_act⟩     (one jax.vjp)
    ∂ℓ/∂b̃ = -dz_ν  → routed to l / u by which bound is active
             (50/50 on equality rows, whose target is (l+u)/2)

Caveats: exact under strict complementarity, LICQ, and second-order
sufficiency at x* (H positive definite on the active tangent space —
the Schur solve's ``fail`` lanes, where this degrades into a non-SPD
reduced system, return zero gradients).  x0/lam0 receive zero
gradients: the converged solution does not depend on the start.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax

from sqp_solver_tpu.qp.polish import active_masks, kkt_solve_schur_refined
from sqp_solver_tpu.sqp.types import NonlinearProblem, SQPSettings

__all__ = ["sqp_solve_diff"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sqp_solve_diff(
    problem: NonlinearProblem,
    x0: jax.Array,
    lam0=None,
    settings: SQPSettings = SQPSettings(),
    impl: str = "fused",
) -> jax.Array:
    """Solve a (batched) NLP and return x*, differentiably.

    ``jax.grad`` of any scalar function of the result propagates to the
    problem's data leaves (l, u, params) via the implicit function
    theorem at the converged active set.  Batched problems assume
    ``params`` leaves are batched alongside ``x0`` (the tiers'
    convention); a single problem differentiates the same way.
    """
    return _solve_x(problem, x0, lam0, settings, impl)


def _solve_x(problem, x0, lam0, settings, impl):
    if x0.ndim == 1:
        from sqp_solver_tpu.sqp.solver import sqp_solve

        return sqp_solve(problem, x0, lam0, settings).x
    from sqp_solver_tpu.parallel.batch import sqp_solve_batch

    res = sqp_solve_batch(problem, x0, lam0, settings, impl=impl)
    return res.x


def _fwd(problem, x0, lam0, settings, impl):
    if problem.objective is None or problem.constraint is None:
        raise ValueError(
            "sqp_solve_diff requires the raw `objective` and `constraint` "
            "callables: the backward pass re-linearizes the NLP KKT system "
            "with jax.hessian/jax.vjp of those callables.  Problems built "
            "from only the closed-form *_linearized hooks solve fine "
            "forward (sqp_solve) but cannot be differentiated through."
        )
    if x0.ndim == 1:
        from sqp_solver_tpu.sqp.solver import sqp_solve

        res = sqp_solve(problem, x0, lam0, settings)
    else:
        from sqp_solver_tpu.parallel.batch import sqp_solve_batch

        res = sqp_solve_batch(problem, x0, lam0, settings, impl=impl)
    return res.x, (problem, x0, lam0, res.x, res.lam, res.info.status)


def _bwd(settings, impl, residuals, g):
    del impl
    problem, x0, lam0, x, lam, status = residuals
    l, u, params = problem.l, problem.u, problem.params
    has_params = params is not None
    f_raw = problem.objective
    c_raw = problem.constraint
    batched = x.ndim > 1

    # constraint value + Jacobian first: the active-set classification
    # needs c(x*), and the Lagrangian Hessian below uses the multipliers
    # MASKED to that active set (matching qp.diff's treatment of nu —
    # sub-threshold multipliers on inactive rows must not leak into H)
    def cj_one(x1, th1=None):
        c1 = (lambda xx: c_raw(xx, th1)) if has_params else c_raw
        return c1(x1), jax.jacfwd(c1)(x1)

    if batched:
        cv, J = (
            jax.vmap(cj_one)(x, params) if has_params else jax.vmap(cj_one)(x)
        )
    else:
        cv, J = cj_one(x, params) if has_params else cj_one(x)

    # classification at the converged point: the solver's own rule
    # (shifted bounds + multiplier signs, sqp.common.polish_nlp)
    eq, low, up = active_masks(l - cv, u - cv, lam)
    act = eq | low | up
    lam_m = jnp.where(act, lam, 0.0)

    def hess_one(x1, lam1, th1=None):
        f1 = (lambda xx: f_raw(xx, th1)) if has_params else f_raw
        c1 = (lambda xx: c_raw(xx, th1)) if has_params else c_raw
        lagr = lambda xx: f1(xx) + jnp.dot(lam1, c1(xx))
        return jax.hessian(lagr)(x1)

    if batched:
        in_axes = (0, 0, 0) if has_params else (0, 0)
        args = (x, lam_m, params) if has_params else (x, lam_m)
        H = jax.vmap(hess_one, in_axes=in_axes)(*args)
    else:
        H = hess_one(x, lam_m, params) if has_params else hess_one(x, lam_m)

    with jax.default_matmul_precision("highest"):
        J_m = jnp.where(act[..., None], J, 0.0)

        dz_x, dz_nu, fail = kkt_solve_schur_refined(
            H, J_m, act, -g, jnp.zeros_like(l),
            delta=settings.polish_delta, sweeps=settings.polish_sweeps,
        )
        # non-SOLVED lanes (MAX_ITER, NUMERICAL_ISSUES) violate the IFT
        # premise — zero their gradients like adjoint-factorization fails
        ok = jnp.logical_and(~fail, status == 0)
        okx = ok[..., None] if dz_x.ndim > 1 else ok
        dz_x = jnp.where(okx, dz_x, 0.0)
        dz_nu = jnp.where(jnp.logical_and(okx, act), dz_nu, 0.0)

        db = -dz_nu
        dl = jnp.where(low, db, 0.0) + jnp.where(eq, 0.5 * db, 0.0)
        du = jnp.where(up, db, 0.0) + jnp.where(eq, 0.5 * db, 0.0)

        if has_params:
            # ∂ℓ/∂θ = ⟨dz_x, ∂θ∇L⟩ + ⟨dz_ν, ∂θ c_act⟩ via ONE jax.vjp of
            # θ -> (∇_x L(x*, λ*, θ), act ⊙ c(x*, θ))
            def kkt_pieces_one(x1, lam1, a1, th1):
                f1 = lambda xx: f_raw(xx, th1)
                c1 = lambda xx: c_raw(xx, th1)
                gl = jax.grad(lambda xx: f1(xx) + jnp.dot(lam1, c1(xx)))(x1)
                return gl, jnp.where(a1, c1(x1), 0.0)

            if batched:
                F = lambda th: jax.vmap(
                    kkt_pieces_one, in_axes=(0, 0, 0, 0)
                )(x, lam_m, act, th)
            else:
                F = lambda th: kkt_pieces_one(x, lam_m, act, th)
            _, vjp_fn = jax.vjp(F, params)
            (dparams,) = vjp_fn((dz_x, dz_nu))
        else:
            dparams = None

    dproblem = dataclasses.replace(problem, l=dl, u=du, params=dparams)
    dlam0 = None if lam0 is None else jnp.zeros_like(lam0)
    return dproblem, jnp.zeros_like(x0), dlam0


sqp_solve_diff.defvjp(_fwd, _bwd)
