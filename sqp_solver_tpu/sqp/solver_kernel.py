"""Kernel-fused batch SQP solver — the TPU flagship path.

Same algorithm and semantics as :mod:`sqp_solver_tpu.sqp.solver_batched`
(Algorithm 18.3: damped BFGS, posdef repair, l1 merit line search,
optional SOC — reference ``src/sqp.cpp:44-101``), re-plumbed around the
fused SQP-step Pallas kernel (:func:`sqp_solver_tpu.ops.qp_kernel.sqp_step_kernel`):

* the BFGS Hessian lives in the kernel's transposed (n, n, B) layout for
  the whole solve — it is updated, posdef-checked, and consumed by the
  QP factorization *inside* the kernel, so no (B, n, n) matrix work or
  layout transpose ever runs at the XLA level between outer iterations
  (measured round 1: those transposes + batched BFGS/Cholesky were ~15 ms
  of every 20 ms outer iteration at B=4096, n=32);
* the constraint Jacobian is produced directly in kernel layout by
  ``vmap(..., out_axes=-1)`` — the batch axis lands minor-most, which is
  exactly the custom call's operand layout, so XLA inserts no relayout;
* per-problem convergence masks feed the kernel, which skips entire
  tiles (factorization and all) once every lane is done — late outer
  iterations cost one scalar predicate per tile.

Only the user-callable evaluations (objective/constraint linearization,
line-search merit evaluations) and O(B·(n+m)) vector arithmetic remain in
XLA.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from sqp_solver_tpu.ops.qp_kernel import _step_lane_tile, sqp_step_kernel
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

__all__ = ["sqp_solve_kernel_fused"]



def _bfgs_update_t(Bt, s_bf, y_bf, reset, upd):
    """Damped BFGS (Procedure 18.2, reference bfgs.hpp:14-41) at the XLA
    level in the kernel's transposed (n, n, B) layout — pure elementwise
    ops and sublane reductions, so NO layout transpose is ever needed.
    Mirrors the in-kernel implementation exactly; used when fusing the
    BFGS into the kernel would shrink the lane tile below 128 (n >= 64),
    where `_chunked_lanes` XLA lane-slicing costs more than it saves."""
    dtype = Bt.dtype
    n = Bt.shape[0]
    eps_m = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    tiny_pos = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    eye_t = jnp.eye(n, dtype=dtype)[:, :, None]
    s = s_bf.T  # (n, B)
    yv = y_bf.T
    Bs = jnp.sum(Bt * s[None, :, :], axis=1)  # (n, B)
    sBs = jnp.sum(s * Bs, axis=0, keepdims=True)  # (1, B)
    sy = jnp.sum(s * yv, axis=0, keepdims=True)
    damped = sy < 0.2 * sBs
    theta = 0.8 * sBs / jnp.maximum(sBs - sy, tiny_pos)
    r = jnp.where(damped, theta * yv + (1.0 - theta) * Bs, yv)
    sr = jnp.where(damped, theta * sy + (1.0 - theta) * sBs, sy)
    Bupd = (
        Bt
        - (Bs[:, None, :] * Bs[None, :, :]) / jnp.maximum(sBs, tiny_pos)
        + (r[:, None, :] * r[None, :, :]) / jnp.maximum(sr, tiny_pos)
    )
    keep = ((sr < eps_m) | (~upd)[None, :])[:, None, :]  # (1, 1, B)
    Bn = jnp.where(keep, Bt, Bupd)
    return jnp.where(reset[None, None, :], eye_t, Bn)


def _vdot(a, b):
    return jnp.sum(a * b, axis=-1)


def _linf(v):
    return jnp.max(jnp.abs(v), axis=-1)


class _Carry(NamedTuple):
    x: jax.Array  # (B, n)
    lam: jax.Array  # (B, m)
    Bt: jax.Array  # (n, n, B) — kernel layout, never transposed in XLA
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
    trace: object  # dict of (max_iter, B, ...) ring buffers, or None


@pin_precision
def sqp_solve_kernel_fused(
    problem: NonlinearProblem,
    x0: jax.Array,
    lam0: Optional[jax.Array] = None,
    settings: SQPSettings = SQPSettings(),
    interpret: bool = False,
) -> SQPResult:
    """Solve a batch of NLPs through the fused SQP-step kernel.

    ``x0`` is (B, n); problem data leaves are batched (B, ...) or shared.
    Semantics-equivalent to ``sqp_solve_fused`` with ``qp_impl="kernel"``
    (cross-checked by tests/test_fused_sqp.py).
    """
    settings.validate()
    dtype = x0.dtype
    B, n = x0.shape
    l, u = problem.l, problem.u
    m = l.shape[-1]
    tiny = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    if lam0 is None:
        lam0 = jnp.zeros((B, m), dtype)

    # fuse the BFGS into the kernel only when it costs no lanes: at n >= 64
    # the fused live set halves the lane tile, and `_chunked_lanes` XLA
    # lane-slicing (~6 GB/s) then floors every sweep at ~32 ms (measured,
    # B=1024 n=128).  Otherwise BFGS runs at the XLA level in the SAME
    # transposed layout (no relayout) and the kernel keeps TL=128.
    # With inner-QP scaling the BFGS must also run at the XLA level: the
    # in-kernel update would see the SCALED Hessian against unscaled s/y.
    fuse_bfgs = (
        _step_lane_tile(n, m, fused_bfgs=True) >= 128 and settings.qp.scaling == 0
    )

    # ---- batched problem callables -----------------------------------------
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
    # Jacobian batched with out_axes=-1: lands in the kernel's (m, n, B)
    # layout with the batch axis minor-most — no XLA relayout at the
    # custom-call boundary
    jac = jax.jacfwd if settings.jacobian_mode == "fwd" else jax.jacrev
    cl_t = problem.constraint_linearized_t
    if cl_t is not None:
        # layout-native hook: builds J directly in (m, n, B) — skips the
        # vmap(out_axes=-1) minor-axis relayout (see NonlinearProblem docs)
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
        # pBp = p'Bp is computed by the caller in the kernel's transposed
        # layout (see body: Bp_prod einsum), so no matrix work runs here
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

    def kernel_qp(Bt, Jt, grad_obj, lqp, uqp, step_prev, dgl, reset, upd,
                  active, qp_state, do_bfgs, minv_in=None, rho_in=None,
                  want_minv=False, scale=None):
        zrow = jnp.zeros((B,), dtype)
        rho_row = rho_in if rho_in is not None else zrow
        mskt = jnp.stack(
            [reset.astype(dtype), upd.astype(dtype), active.astype(dtype),
             rho_row.astype(dtype), zrow, zrow, zrow, zrow],
            axis=0,
        )  # (8, B)
        if settings.qp_warm_start:
            xt, zt, yt = qp_state.x.T, qp_state.z.T, qp_state.y.T
        else:
            xt = jnp.zeros((n, B), dtype)
            zt = jnp.zeros((m, B), dtype)
            yt = jnp.zeros((m, B), dtype)
        qt, lt, ut = grad_obj.T, lqp.T, uqp.T
        Bt_orig = Bt
        if settings.qp.scaling > 0:
            # transposed-layout Ruiz (see qp.scaling): the whole subproblem
            # is equilibrated without leaving the kernel layout.  A SOC
            # re-solve passes the FIRST solve's factors back via ``scale``
            # so the reused Minv matches the scaled operator it iterates.
            from sqp_solver_tpu.qp.scaling import ruiz_equilibrate_t

            if scale is None:
                Bt, qt, Jt, lt, ut, d_s, e_s, c_s = ruiz_equilibrate_t(
                    Bt, qt, Jt, lt, ut, settings.qp.scaling
                )
            else:
                d_s, e_s, c_s = scale
                Bt = c_s * d_s[:, None, :] * Bt * d_s[None, :, :]
                qt = c_s * d_s * qt
                Jt = e_s[:, None, :] * Jt * d_s[None, :, :]
                lt = lt * e_s
                ut = ut * e_s
            scale = (d_s, e_s, c_s)
            xt = xt / d_s
            zt = zt * e_s
            yt = yt * c_s / e_s
        out = sqp_step_kernel(
            Bt, Jt, qt, lt, ut, step_prev.T, dgl.T, mskt,
            xt, zt, yt, settings.qp, do_bfgs=do_bfgs, minv_in=minv_in,
            want_minv=want_minv, interpret=interpret,
        )
        p_t, z_t, lam_t, Bt_new, stk = out[:5]
        minv = out[5] if want_minv else None
        if settings.qp.scaling > 0:
            p_t = p_t * d_s
            z_t = z_t / e_s
            lam_t = lam_t * e_s / c_s
            # the scaled Hessian is internal to the solve: hand back the
            # original so the caller's merit/SOC math stays in true
            # coordinates (do_bfgs is always False under scaling)
            Bt_new = Bt_orig
        return p_t.T, z_t.T, lam_t.T, Bt_new, stk, minv, scale

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

        # BFGS masks; the update itself runs inside the kernel.  reset and
        # upd are masked by `active` HERE so inactive lanes pass their B
        # through unchanged inside the BFGS (kernel or XLA variant) — the
        # previous separate Bt_next = where(active, ...) pass cost ~200 MB
        # of HBM traffic per outer iteration at bench shapes.
        delta_grad_L = grad_L_here - c.grad_L
        tiny_step = _linf(c.step_prev) <= 1e3 * tiny * (1.0 + _linf(c.x))
        reset = (jnp.broadcast_to(k == 1, (B,)) | c.ls_failed) & active
        upd = ~tiny_step & active

        soc = settings.second_order_correction
        if fuse_bfgs:
            Bt_in = c.Bt
        else:
            Bt_in = _bfgs_update_t(c.Bt, c.step_prev, delta_grad_L, reset, upd)
        p, z_qp, lam_qp, Bt_new, stk, minv, qp_scale = kernel_qp(
            Bt_in, Jt, grad_obj, l - c_val, u - c_val, c.step_prev,
            delta_grad_L, reset, upd, active, c.qp_state, do_bfgs=fuse_bfgs,
            want_minv=soc,
        )
        qp_iter = c.qp_iter + jnp.where(active, stk[1].astype(jnp.int32), 0)
        qp_state_next = QPState(x=p, z=z_qp, y=lam_qp)

        if soc:
            x_p = c.x + p
            cv_p = call(c_b, x_p)
            d = cv_p - jnp.einsum(
                "mnb,bn->bm", Jt, p, precision=lax.Precision.HIGHEST
            )
            # factor reuse: only l, u change between the QP and its SOC
            # re-solve, so the Minv and rho from the first solve carry
            # over (the reference refactors from scratch — TODO at
            # src/sqp.cpp:273)
            p, z_soc, lam_qp, _, stk2, _, _ = kernel_qp(
                Bt_new, Jt, grad_obj, l - d, u - d, c.step_prev,
                delta_grad_L, reset, upd, active, qp_state_next,
                do_bfgs=False, minv_in=minv, rho_in=stk[7],
                scale=qp_scale,
            )
            qp_iter = qp_iter + jnp.where(active, stk2[1].astype(jnp.int32), 0)
            qp_state_next = QPState(x=p, z=z_soc, y=lam_qp)

        p_lam = lam_qp - c.lam
        # p' B p for the merit weight, via the kernel layout product
        Bp_prod = jnp.einsum(
            "ijb,bj->bi", Bt_new, p, precision=lax.Precision.HIGHEST
        )
        pBp = _vdot(p, Bp_prod)
        mu = jnp.where(
            active, merit_weight(c.mu, p, pBp, grad_obj, c_val, lam_qp), c.mu
        )
        alpha, ls_ok = line_search(c.x, p, mu, obj, grad_obj, c_val)

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
            # live hook (see solver_batched for the runtime-support note)
            jax.debug.callback(settings.iteration_callback, x_new, lam_new, k)

        sel = lambda newv, oldv: jnp.where(
            active.reshape((B,) + (1,) * (newv.ndim - 1)), newv, oldv
        )
        # Bt_new: inactive lanes pass B through unchanged inside the BFGS
        # itself — reset and upd are active-masked above, so no XLA-level
        # (n, n, B) select is needed here
        Bt_next = Bt_new
        return _Carry(
            x=x_new,
            lam=lam_new,
            Bt=Bt_next,
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
    eye_t = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, B))
    if settings.record_trace:
        T = settings.max_iter
        trace0 = dict(
            x=jnp.zeros((T, B, n), dtype),
            lam=jnp.zeros((T, B, m), dtype),
            alpha=jnp.zeros((T, B), dtype),
            primal_step_norm=jnp.zeros((T, B), dtype),
            dual_step_norm=jnp.zeros((T, B), dtype),
        )
    else:
        trace0 = None
    if settings.iteration_callback is not None:
        # reference calls the hook once with the initial state
        # (src/sqp.cpp:68-70)
        jax.debug.callback(
            settings.iteration_callback, x0, lam0, jnp.zeros((), jnp.int32)
        )
    init = _Carry(
        x=x0,
        lam=lam0,
        Bt=eye_t,
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
        # shared multi-pass Newton-KKT polish in TRANSPOSED layout
        # (sqp.common.polish_nlp_t) with the TRUE Lagrangian Hessian:
        # each pass's whole KKT solve runs as one Pallas call
        # (ops.qp_kernel.polish_kkt_kernel), so J/H never leave the
        # kernel layout — the previous batch-first epilogue paid two
        # (B, n, n)-scale relayouts + ~20 XLA dispatches per pass.
        # (An in-kernel (n+m)^2 LDL' remains off the table: D=257
        # shrinking panels were a pathological >30-min Mosaic compile;
        # the Schur-preconditioned form factors only n x n.)
        def f_lin_u(xx):
            return call(f_lin_b, xx)

        def c_lin_t_u(xx):
            return call(c_lin_b, xx)  # (B, m), (m, n, B)

        def hess_t_u(xx, ll):
            if problem.lagrangian_hessian_t is not None:
                # layout-native hook (see NonlinearProblem docs)
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
            # NaN fallback to the BFGS estimate, all in transposed layout
            H_bad = jnp.isnan(H_t).any(axis=(0, 1))  # (B,)
            return jnp.where(H_bad[None, None, :], final.Bt, H_t)

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
