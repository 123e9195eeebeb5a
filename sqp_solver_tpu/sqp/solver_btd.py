"""Structured kernel-fused batch SQP — btd inner QP for stage-wise NLPs.

Same outer algorithm as :mod:`sqp_solver_tpu.sqp.solver_kernel`
(Algorithm 18.3: damped BFGS, l1 merit line search, optional SOC —
reference ``src/sqp.cpp:44-101``), with the QP subproblem solved by the
structured whole-solve kernel (:func:`sqp_solver_tpu.ops.qp_kernel_btd.
btd_step_kernel`): block-Thomas factorization O(T bb^3) instead of the
dense kernel's O(n^3/3) Cholesky, band sweeps O(n bb) instead of O(n^2)
matvecs.  For stage-wise MPC chains at n >= 192 the dense factor
dominates the dense tier's outer iteration; this tier removes it.

The structural price is the Hessian approximation: a dense BFGS rank-2
update fills the whole matrix, so this tier runs a **per-stage
block-diagonal damped BFGS** — Procedure 18.2 applied independently to
each ``bb``-sized diagonal block of the Lagrangian Hessian estimate,
with (s_k, y_k) the block's slice of the step / Lagrangian-gradient
delta.  For stage-separable NLPs (objective a sum of per-stage terms,
dynamics equalities ``x_{k+1} - f(x_k, u_k) = 0``) the TRUE Lagrangian
Hessian is block-diagonal in the stage blocks, so the restriction is
exact in structure; each block update preserves positive definiteness
the same way the dense damped update does.  This is a *different
quasi-Newton sequence* from the dense tiers (documented semantic
deviation — cross-checked against them at the KKT level, not bitwise;
tests/test_sqp_btd.py).

Requirements (raise eagerly): ``settings.qp.block_size`` declared (M =
B + sigma I + J' rho J block-tridiagonal at that size — dynamics
touching only adjacent stages guarantee it), n a multiple of the
internal block, and ``settings.qp.scaling == 0`` (band-layout Ruiz not
implemented).

SOC factor handling: the structured factor lives in kernel scratch and
costs O(T bb^3) to rebuild, so the SOC re-solve carries only the rho the
first solve's factor was computed under (msk row 3 <- st row 8) and
refactors — where the dense tier's Minv reuse saved an O(n^3) setup the
btd rebuild is already cheap (the reference refactors from scratch too:
TODO at ``src/sqp.cpp:273``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from sqp_solver_tpu.ops.qp_kernel_btd import btd_internal_block, btd_step_kernel
from sqp_solver_tpu.qp.types import QPState
from sqp_solver_tpu.sqp import common
from sqp_solver_tpu.sqp.types import (
    NonlinearProblem,
    SQPInfo,
    SQPResult,
    SQPSettings,
    SQPStatus,
)
from sqp_solver_tpu.utils.precision import pin_precision

__all__ = ["sqp_solve_kernel_btd"]


def _bfgs_update_band(pd, s_bf, y_bf, reset, upd, bb):
    """Per-stage block-diagonal damped BFGS in band layout.

    pd is (n, bb, B) — rows [k bb, (k+1) bb) hold the k-th diagonal
    block.  The damped update (Procedure 18.2, reference bfgs.hpp:14-41)
    runs independently per block with the block's slice of s / y; a
    block whose step slice carries no curvature (sr_k < eps) keeps its
    previous estimate, exactly like the dense update's global guard.
    All ops are elementwise/sublane in (T, bb, bb, B) — no relayout.
    """
    dtype = pd.dtype
    n = pd.shape[0]
    B = pd.shape[-1]
    T = n // bb
    eps_m = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    tiny_pos = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    eye_b = jnp.eye(bb, dtype=dtype)[None, :, :, None]  # (1, bb, bb, 1)

    Bd = pd.reshape(T, bb, bb, B)
    s = s_bf.T.reshape(T, bb, B)
    yv = y_bf.T.reshape(T, bb, B)
    Bs = jnp.sum(Bd * s[:, None, :, :], axis=2)  # (T, bb, B)
    sBs = jnp.sum(s * Bs, axis=1, keepdims=True)  # (T, 1, B)
    sy = jnp.sum(s * yv, axis=1, keepdims=True)
    damped = sy < 0.2 * sBs
    theta = 0.8 * sBs / jnp.maximum(sBs - sy, tiny_pos)
    r = jnp.where(damped, theta * yv + (1.0 - theta) * Bs, yv)
    sr = jnp.where(damped, theta * sy + (1.0 - theta) * sBs, sy)
    Bupd = (
        Bd
        - (Bs[:, :, None, :] * Bs[:, None, :, :])
        / jnp.maximum(sBs[:, :, None, :], tiny_pos)
        + (r[:, :, None, :] * r[:, None, :, :])
        / jnp.maximum(sr[:, :, None, :], tiny_pos)
    )
    keep = ((sr < eps_m) | (~upd)[None, None, :])[:, :, None, :]  # (T,1,1,B)
    Bn = jnp.where(keep, Bd, Bupd)
    Bn = jnp.where(reset[None, None, None, :], eye_b, Bn)
    return Bn.reshape(n, bb, B)


def _vdot(a, b):
    return jnp.sum(a * b, axis=-1)


def _linf(v):
    return jnp.max(jnp.abs(v), axis=-1)


class _Carry(NamedTuple):
    x: jax.Array  # (B, n)
    lam: jax.Array  # (B, m)
    pd: jax.Array  # (n, bb, B) — block-diagonal Hessian band, kernel layout
    grad_L: jax.Array  # (B, n)
    step_prev: jax.Array  # (B, n)
    qp_state: QPState  # batch-first vectors
    mu: jax.Array  # (B,)
    ls_failed: jax.Array  # (B,)
    k: jax.Array  # scalar int32
    iter: jax.Array  # (B,)
    done: jax.Array  # (B,)
    failed: jax.Array  # (B,)
    qp_iter: jax.Array  # (B,)
    prim_norm: jax.Array  # (B,)
    dual_norm: jax.Array  # (B,)
    trace: object


@pin_precision
def sqp_solve_kernel_btd(
    problem: NonlinearProblem,
    x0: jax.Array,
    lam0: Optional[jax.Array] = None,
    settings: SQPSettings = SQPSettings(),
    interpret: bool = False,
) -> SQPResult:
    """Solve a batch of stage-wise NLPs through the structured SQP tier.

    ``x0`` is (B, n); problem data leaves are batched (B, ...) or shared.
    Select with ``SQPSettings(qp_impl="kernel_btd",
    qp=QPSettings(block_size=b, ...))`` where every Schur matrix
    B + sigma I + J' rho J is block-tridiagonal at block size b (stage
    blocks with dynamics coupling only adjacent stages).
    """
    settings.validate()
    if settings.qp.block_size <= 0:
        raise ValueError("qp_impl='kernel_btd' requires qp.block_size > 0")
    if settings.qp.scaling > 0:
        raise ValueError(
            "qp_impl='kernel_btd' does not support inner-QP scaling yet "
            "(band-layout Ruiz unimplemented); set qp.scaling=0"
        )
    dtype = x0.dtype
    B, n = x0.shape
    bb = btd_internal_block(int(settings.qp.block_size))
    if n % bb:
        raise ValueError(
            f"qp_impl='kernel_btd': n={n} must be a multiple of the "
            f"internal block {bb} (declared block_size="
            f"{settings.qp.block_size}); pad the stage blocks with "
            f"decoupled variables at the model level"
        )
    l, u = problem.l, problem.u
    m = l.shape[-1]
    tiny = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    if lam0 is None:
        lam0 = jnp.zeros((B, m), dtype)

    # ---- batched problem callables (same plumbing as solver_kernel) -------
    params = problem.params
    has_params = params is not None
    f_raw = problem.objective
    c_raw = problem.constraint
    fl_raw = problem.objective_linearized
    cl_raw = problem.constraint_linearized

    in_axes = (0, 0) if has_params else (0,)

    def call(fn, x):
        return fn(x, params) if has_params else fn(x)

    f_b = jax.vmap(f_raw, in_axes=in_axes)
    c_b = jax.vmap(c_raw, in_axes=in_axes)
    if fl_raw is not None:
        f_lin_b = jax.vmap(fl_raw, in_axes=in_axes)
    else:
        f_lin_b = jax.vmap(
            (lambda x, p: jax.value_and_grad(f_raw)(x, p))
            if has_params
            else jax.value_and_grad(f_raw),
            in_axes=in_axes,
        )
    jac = jax.jacfwd if settings.jacobian_mode == "fwd" else jax.jacrev
    cl_t = problem.constraint_linearized_t
    if cl_t is not None:
        c_lin_b = (
            (lambda x, p: cl_t(x, p)) if has_params else (lambda x: cl_t(x, None))
        )
    else:
        if cl_raw is not None:
            c_lin_raw = cl_raw
        elif has_params:
            c_lin_raw = lambda x, p: (c_raw(x, p), jac(c_raw)(x, p))
        else:
            c_lin_raw = lambda x: (c_raw(x), jac(c_raw)(x))
        c_lin_b = jax.vmap(c_lin_raw, in_axes=in_axes, out_axes=(0, -1))

    def constraint_norm(cv):
        return common.constraint_norm(cv, l, u, tiny)

    def max_violation(cv):
        return common.max_violation(cv, l, u)

    def merit_weight(mu_prev, p, pBp, grad_obj, c_val, lam_qp):
        return common.merit_weight(
            mu_prev,
            _vdot(grad_obj, p),
            pBp,
            constraint_norm(c_val),
            lam_qp,
            settings.rho,
            tiny,
        )

    def line_search(x, p, mu, obj, grad_obj, c_val):
        constr_l1 = constraint_norm(c_val)
        gp = _vdot(grad_obj, p)
        phi = obj + mu * constr_l1
        D = gp - mu * constr_l1

        def eval_merit(alpha):
            x_step = x + alpha[:, None] * p
            return call(f_b, x_step) + mu * constraint_norm(call(c_b, x_step))

        return common.line_search_scan(
            eval_merit, (B,), dtype, phi, D, settings.eta, settings.tau,
            settings.line_search_max_iter,
        )

    # the Hessian estimate is block-DIAGONAL: its sub-diagonal band is
    # identically zero (one shared constant operand for every call)
    pe_zero = jnp.zeros((n, bb, B), dtype)

    def kernel_qp(pd, Jt, grad_obj, lqp, uqp, active, qp_state, rho_in=None):
        zrow = jnp.zeros((B,), dtype)
        rho_row = rho_in if rho_in is not None else zrow
        mskt = jnp.stack(
            [zrow, zrow, active.astype(dtype), rho_row.astype(dtype),
             zrow, zrow, zrow, zrow],
            axis=0,
        )  # (8, B)
        if settings.qp_warm_start:
            xt, zt, yt = qp_state.x.T, qp_state.z.T, qp_state.y.T
        else:
            xt = jnp.zeros((n, B), dtype)
            zt = jnp.zeros((m, B), dtype)
            yt = jnp.zeros((m, B), dtype)
        p_t, z_t, lam_t, stk = btd_step_kernel(
            pd, pe_zero, Jt, grad_obj.T, lqp.T, uqp.T, mskt,
            xt, zt, yt, settings.qp, interpret=interpret,
        )
        return p_t.T, z_t.T, lam_t.T, stk

    def body(c: _Carry) -> _Carry:
        k = c.k + 1
        active = (~c.done) & (~c.failed)

        obj, grad_obj = call(f_lin_b, c.x)
        c_val, Jt = call(c_lin_b, c.x)  # (B, m), (m, n, B)
        grad_L_here = grad_obj + jnp.einsum(
            "mnb,bm->bn", Jt, c.lam, precision=lax.Precision.HIGHEST
        )

        if settings.termination == "kkt":
            kkt_ok = (_linf(grad_L_here) <= settings.eps_dual) & (
                max_violation(c_val) <= settings.eps_prim
            )
            newly_done = active & kkt_ok
            c = c._replace(done=c.done | newly_done)
            active = active & ~newly_done

        delta_grad_L = grad_L_here - c.grad_L
        tiny_step = _linf(c.step_prev) <= 1e3 * tiny * (1.0 + _linf(c.x))
        reset = (jnp.broadcast_to(k == 1, (B,)) | c.ls_failed) & active
        upd = ~tiny_step & active

        pd_new = _bfgs_update_band(
            c.pd, c.step_prev, delta_grad_L, reset, upd, bb
        )
        p, z_qp, lam_qp, stk = kernel_qp(
            pd_new, Jt, grad_obj, l - c_val, u - c_val, active, c.qp_state
        )
        qp_fail = (stk[4] > 0.5) & active
        # a failed block-Thomas factor froze that lane's iterates inside
        # the kernel — the returned p is a warm-start passthrough, not a
        # descent direction.  Zero it and mark ls_failed so the next
        # outer iteration resets the block Hessian to identity (the same
        # recovery path a collapsed line search takes).
        p = jnp.where(qp_fail[:, None], 0.0, p)
        qp_iter = c.qp_iter + jnp.where(active, stk[1].astype(jnp.int32), 0)
        qp_state_next = QPState(x=p, z=z_qp, y=lam_qp)

        if settings.second_order_correction:
            x_p = c.x + p
            cv_p = call(c_b, x_p)
            d = cv_p - jnp.einsum(
                "mnb,bn->bm", Jt, p, precision=lax.Precision.HIGHEST
            )
            # rho carry only: the structured factor is O(T bb^3) to
            # rebuild, so unlike the dense tier no Minv is passed — see
            # module docstring
            p, z_soc, lam_qp, stk2 = kernel_qp(
                pd_new, Jt, grad_obj, l - d, u - d, active & ~qp_fail,
                qp_state_next, rho_in=stk[8],
            )
            p = jnp.where(qp_fail[:, None], 0.0, p)
            qp_iter = qp_iter + jnp.where(active, stk2[1].astype(jnp.int32), 0)
            qp_state_next = QPState(x=p, z=z_soc, y=lam_qp)

        p_lam = lam_qp - c.lam
        # p' B p from the block-diagonal band
        T_ = n // bb
        p3 = p.T.reshape(T_, bb, B)
        Bp3 = jnp.sum(
            pd_new.reshape(T_, bb, bb, B) * p3[:, None, :, :], axis=2
        )
        pBp = jnp.sum(p3 * Bp3, axis=(0, 1))  # (B,)
        mu = jnp.where(
            active, merit_weight(c.mu, p, pBp, grad_obj, c_val, lam_qp), c.mu
        )
        alpha, ls_ok = line_search(c.x, p, mu, obj, grad_obj, c_val)
        ls_ok = ls_ok & ~qp_fail

        x_new = c.x + alpha[:, None] * p
        lam_new = c.lam + alpha[:, None] * p_lam
        step = alpha[:, None] * p
        prim_norm = alpha * _linf(p)
        dual_norm = alpha * _linf(p_lam)

        # ~isfinite, not isnan: freeze inf-bound lanes too (ROADMAP r5 f5)
        bad = (~jnp.isfinite(x_new)).any(-1) | (~jnp.isfinite(lam_new)).any(-1)
        x_new = jnp.where((active & ~bad)[:, None], x_new, c.x)
        lam_new = jnp.where((active & ~bad)[:, None], lam_new, c.lam)

        if settings.termination == "kkt":
            done = c.done
        else:
            cv_new = call(c_b, x_new)
            conv = (
                (prim_norm <= settings.eps_prim)
                & (dual_norm <= settings.eps_dual)
                & (max_violation(cv_new) <= settings.eps_prim)
            )
            done = c.done | (active & conv)

        if settings.record_trace:
            ki = k - 1
            tr = dict(
                x=lax.dynamic_update_index_in_dim(c.trace["x"], x_new, ki, 0),
                lam=lax.dynamic_update_index_in_dim(c.trace["lam"], lam_new, ki, 0),
                alpha=lax.dynamic_update_index_in_dim(
                    c.trace["alpha"], jnp.where(active, alpha, 0.0), ki, 0
                ),
                primal_step_norm=lax.dynamic_update_index_in_dim(
                    c.trace["primal_step_norm"], prim_norm, ki, 0
                ),
                dual_step_norm=lax.dynamic_update_index_in_dim(
                    c.trace["dual_step_norm"], dual_norm, ki, 0
                ),
            )
        else:
            tr = c.trace

        if settings.iteration_callback is not None:
            jax.debug.callback(settings.iteration_callback, x_new, lam_new, k)

        sel = lambda newv, oldv: jnp.where(
            active.reshape((B,) + (1,) * (newv.ndim - 1)), newv, oldv
        )
        # pd: inactive lanes pass through unchanged inside the band BFGS
        # (reset/upd are active-masked above); the band is (n, bb, B) so
        # a lane select would need the batch minor-most — avoided the
        # same way the dense tier avoids its (n, n, B) select
        return _Carry(
            x=x_new,
            lam=lam_new,
            pd=pd_new,
            grad_L=sel(grad_L_here, c.grad_L),
            step_prev=sel(step, c.step_prev),
            qp_state=jax.tree.map(sel, qp_state_next, c.qp_state),
            mu=mu,
            ls_failed=sel(~ls_ok, c.ls_failed),
            k=k,
            iter=jnp.where(active, k, c.iter),
            done=done,
            failed=c.failed | (active & bad),
            qp_iter=qp_iter,
            prim_norm=sel(prim_norm, c.prim_norm),
            dual_norm=sel(dual_norm, c.dual_norm),
            trace=tr,
        )

    def cond(c: _Carry):
        return jnp.any((~c.done) & (~c.failed)) & (c.k < settings.max_iter)

    zero_b = jnp.zeros((B,), dtype)
    T_ = n // bb
    pd0 = jnp.broadcast_to(
        jnp.eye(bb, dtype=dtype)[None, :, :, None], (T_, bb, bb, B)
    ).reshape(n, bb, B)
    if settings.record_trace:
        Tm = settings.max_iter
        trace0 = dict(
            x=jnp.zeros((Tm, B, n), dtype),
            lam=jnp.zeros((Tm, B, m), dtype),
            alpha=jnp.zeros((Tm, B), dtype),
            primal_step_norm=jnp.zeros((Tm, B), dtype),
            dual_step_norm=jnp.zeros((Tm, B), dtype),
        )
    else:
        trace0 = None
    if settings.iteration_callback is not None:
        jax.debug.callback(
            settings.iteration_callback, x0, lam0, jnp.zeros((), jnp.int32)
        )
    init = _Carry(
        x=x0,
        lam=lam0,
        pd=pd0,
        grad_L=jnp.zeros((B, n), dtype),
        step_prev=jnp.zeros((B, n), dtype),
        qp_state=QPState(
            x=jnp.zeros((B, n), dtype),
            z=jnp.zeros((B, m), dtype),
            y=jnp.zeros((B, m), dtype),
        ),
        mu=zero_b,
        ls_failed=jnp.zeros((B,), jnp.bool_),
        k=jnp.zeros((), jnp.int32),
        iter=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
        failed=jnp.zeros((B,), jnp.bool_),
        qp_iter=jnp.zeros((B,), jnp.int32),
        prim_norm=zero_b,
        dual_norm=zero_b,
        trace=trace0,
    )
    if settings.schedule == "fixed":
        final = lax.fori_loop(0, settings.max_iter, lambda i, c: body(c), init)
    else:
        final = lax.while_loop(cond, body, init)

    x_out, lam_out = final.x, final.lam
    if settings.polish:
        # shared Newton-KKT polish (sqp.common.polish_nlp_t) with the
        # TRUE Lagrangian Hessian — a one-time dense O(n^2) epilogue;
        # the BFGS fallback for NaN Hessians expands the band estimate
        def f_lin_u(xx):
            return call(f_lin_b, xx)

        def c_lin_t_u(xx):
            return call(c_lin_b, xx)

        def hess_t_u(xx, ll):
            if problem.lagrangian_hessian_t is not None:
                H_t = problem.lagrangian_hessian_t(xx, ll, params)
            elif has_params:
                lagr = lambda x_, l_, pp: f_raw(x_, pp) + jnp.dot(l_, c_raw(x_, pp))
                H_t = jax.vmap(
                    jax.hessian(lagr, argnums=0), in_axes=(0, 0, 0), out_axes=-1
                )(xx, ll, params)
            else:
                lagr = lambda x_, l_: f_raw(x_) + jnp.dot(l_, c_raw(x_))
                H_t = jax.vmap(
                    jax.hessian(lagr, argnums=0), in_axes=(0, 0), out_axes=-1
                )(xx, ll)
            H_bad = jnp.isnan(H_t).any(axis=(0, 1))  # (B,)
            # densify the band fallback: block-diag pd -> (n, n, B)
            Bd4 = final.pd.reshape(T_, bb, bb, B)
            Bdense = jnp.zeros((n, n, B), dtype)
            for t in range(T_):
                Bdense = Bdense.at[
                    t * bb : (t + 1) * bb, t * bb : (t + 1) * bb
                ].set(Bd4[t])
            return jnp.where(H_bad[None, None, :], Bdense, H_t)

        x_out, lam_out, kkt_rescued = common.polish_nlp_t(
            x_out, lam_out, l, u, f_lin_u, c_lin_t_u, hess_t_u, settings,
            interpret=interpret,
        )
    else:
        kkt_rescued = jnp.zeros((B,), jnp.bool_)

    status = jnp.where(
        final.failed,
        SQPStatus.NUMERICAL_ISSUES,
        jnp.where(
            final.done | kkt_rescued, SQPStatus.SOLVED, SQPStatus.MAX_ITER_EXCEEDED
        ),
    ).astype(jnp.int32)
    info = SQPInfo(
        status=status,
        iter=final.iter,
        qp_solver_iter=final.qp_iter,
        primal_step_norm=final.prim_norm,
        dual_step_norm=final.dual_norm,
    )
    return SQPResult(x=x_out, lam=lam_out, info=info, trace=final.trace)
