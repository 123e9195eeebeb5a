"""Shared SQP algorithm blocks — ONE text per block, consumed by all three
tiers (``sqp/solver.py`` per-problem, ``sqp/solver_batched.py`` fused,
``sqp/solver_kernel.py`` kernel-fused).

Round-2 review found the merit weight, line search and polish epilogue
maintained as three intentionally-parallel texts, and the drift risk had
already materialized twice (precision pinning in the scaling pipeline;
``sqp_solve`` ignoring ``polish_passes``).  Everything here is
shape-agnostic: arrays carry an optional leading batch axis, reductions
run over ``axis=-1``, and callables are supplied by the tier in whatever
layout it maintains.

Reference provenance: merit weight + line search are the l1 exact-penalty
scheme of ``src/sqp.cpp:277-308`` (C15) with the penalty lower-bounded by
the N&W Thm-17.3 exactness estimate; the polish epilogue has no reference
analog (it is the OSQP-paper polish, upgraded to a multi-pass active-set
refinement with the true Lagrangian Hessian).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "constraint_norm",
    "max_violation",
    "merit_weight",
    "line_search_scan",
    "line_search_while",
    "polish_nlp",
    "polish_nlp_t",
    "replay_trace",
]


def replay_trace(result, callback):
    """Offline replay of a recorded solve through the reference's
    per-iteration callback signature (``sqp.hpp:23``): calls
    ``callback(x_k, lam_k, k)`` for each recorded outer iteration
    ``k = 1..max(iter)``, with the whole batch per call.

    This is the documented observability contract for runtimes without
    host-callback support (the axon-tunneled TPU relay rejects
    ``jax.debug.callback`` entirely): solve with
    ``settings.record_trace=True``, then replay ``result.trace`` here.
    On CPU and standard TPU runtimes, ``settings.iteration_callback``
    also fires live on every tier.
    """
    import numpy as np

    if result.trace is None:
        raise ValueError(
            "result has no trace — solve with settings.record_trace=True"
        )
    xs = np.asarray(result.trace["x"])
    lams = np.asarray(result.trace["lam"])
    last = int(np.max(np.asarray(result.info.iter)))
    for k in range(last):
        callback(xs[k], lams[k], k + 1)


def _linf(v):
    return jnp.max(jnp.abs(v), axis=-1)


def constraint_norm(cv, l, u, tiny):
    """l1 violation of l <= c <= u (reference src/sqp.cpp:311-319)."""
    return (
        tiny
        + jnp.sum(jnp.maximum(l - cv, 0.0), axis=-1)
        + jnp.sum(jnp.maximum(cv - u, 0.0), axis=-1)
    )


def max_violation(cv, l, u):
    """linf violation (reference src/sqp.cpp:330-343)."""
    return jnp.maximum(
        0.0, jnp.maximum(jnp.max(l - cv, axis=-1), jnp.max(cv - u, axis=-1))
    )


def merit_weight(mu_prev, gp, pBp, constr_l1, lam_qp, rho, tiny):
    """l1 penalty weight.  Three lower bounds, kept monotone:

    * the reference's merit-model formula (src/sqp.cpp:287), used only
      when the violation is numerically meaningful — with constr_l1 at
      machine eps it degenerates to +/-1e16 garbage;
    * the exactness bound mu > ||lambda*||_inf (N&W Thm 17.3), estimated
      from the QP multipliers — this is what stops the merit function
      from accepting large infeasible steps at feasible iterates;
    * the previous weight (monotone non-decreasing, standard practice).

    ``gp`` = grad_f . p, ``pBp`` = p . (B p) — supplied by the tier in its
    own layout so no matrix work happens here.
    """
    meaningful = constr_l1 > 1e4 * tiny
    raw = (gp + 0.5 * pBp) / ((1.0 - rho) * constr_l1)
    model_mu = jnp.where(meaningful, jnp.maximum(raw, 0.0), 0.0)
    dual_mu = 1.5 * _linf(lam_qp)
    return jnp.maximum(mu_prev, jnp.maximum(model_mu, dual_mu))


def line_search_scan(eval_merit, batch_shape, dtype, phi, D, eta, tau, max_iter):
    """Backtracking on the l1 exact-penalty merit function
    (reference src/sqp.cpp:277-308) as a fixed-trip scan — the batched
    tiers' form (a while_loop would add a host-synced condition per trip).
    Same semantics as the reference's backtracking for-loop
    (src/sqp.cpp:294-306: at most max_iter-1 evaluations).

    ``eval_merit(alpha)`` returns the merit value phi(x + alpha p) with
    alpha shaped ``batch_shape``.  Returns (alpha, accepted): ``accepted``
    False means no step passed Armijo — the caller resets the Hessian
    (curvature information is then unreliable; a fresh start beats
    wandering with a corrupted B).
    """

    def body(carry, _):
        alpha, accepted = carry
        phi_step = eval_merit(alpha)
        ok = phi_step <= phi + alpha * eta * D
        accepted = accepted | ok
        alpha = jnp.where(accepted, alpha, tau * alpha)
        return (alpha, accepted), None

    (alpha, accepted), _ = lax.scan(
        body,
        (jnp.ones(batch_shape, dtype), jnp.zeros(batch_shape, jnp.bool_)),
        None,
        length=max_iter - 1,
        unroll=4,
    )
    return alpha, accepted


def line_search_while(eval_merit, dtype, phi, D, eta, tau, max_iter):
    """Scalar (per-problem tier) variant of the same backtracking scheme,
    with early exit via while_loop (free on the per-problem tier where the
    whole solve is one dynamic loop anyway)."""

    def cond(s):
        alpha, i, accepted = s
        return (~accepted) & (i < max_iter)

    def body(s):
        alpha, i, accepted = s
        phi_step = eval_merit(alpha)
        accepted = phi_step <= phi + alpha * eta * D
        alpha = jnp.where(accepted, alpha, tau * alpha)
        return alpha, i + 1, accepted

    alpha, _, accepted = lax.while_loop(
        cond, body, (jnp.ones((), dtype), jnp.int32(1), jnp.zeros((), jnp.bool_))
    )
    return alpha, accepted


def polish_nlp(
    x_out,
    lam_out,
    l,
    u,
    f_lin,
    c_lin,
    hess_fn,
    settings,
):
    """SQP polish epilogue: ``polish_passes`` Newton-KKT steps on the
    guessed active set with the TRUE Lagrangian Hessian.

    Each pass linearizes at the current point, guesses the active set from
    the multiplier signs (equality rows always active), solves the masked
    equality KKT via the Schur-preconditioned ideal-refined solve
    (:func:`sqp_solver_tpu.qp.polish.kkt_solve_schur_refined`: one batched
    MXU matmul + Cholesky + refinement sweeps), and accepts PER PROBLEM
    where the true re-linearized KKT error improves.  Repeated passes
    re-guess the active set from the polished multipliers — a mini
    active-set iteration that rescues instances whose first guess was
    wrong (degenerate sets).  The exact Hessian gives the full quadratic
    correction where the BFGS estimate caps the Newton step's gain at ~1
    digit (measured 6e-4 -> 8e-8 on the benchmark family).

    Shape-agnostic: works on a single problem ((n,), (m,)) or a leading
    batch.  Tier adapters:
      * ``f_lin(x) -> (obj, grad)``
      * ``c_lin(x) -> (c, J)`` with J batch-first (..., m, n)
      * ``hess_fn(x, lam) -> (..., n, n)`` true Lagrangian Hessian WITH
        any NaN fallback already applied by the tier (the kernel tier
        substitutes its BFGS estimate in transposed layout, avoiding an
        extra (B, n, n) relayout of the fallback matrix)

    Returns ``(x, lam, kkt_rescued)``; ``kkt_rescued`` flags problems
    whose FINAL point meets the KKT tolerances — a straggler whose
    polished point is optimal is SOLVED even though the loop phase ran
    out of iterations.
    """
    from sqp_solver_tpu.qp.polish import guess_active_set, kkt_solve_schur_refined

    def _mv(M, v):
        return jnp.einsum("...ij,...j->...i", M, v, precision=lax.Precision.HIGHEST)

    def _mtv(M, v):
        return jnp.einsum("...ij,...i->...j", M, v, precision=lax.Precision.HIGHEST)

    def kkt_parts(xx, ll):
        _, g = f_lin(xx)
        cv, J = c_lin(xx)
        stat = _linf(g + _mtv(J, ll))
        viol = max_violation(cv, l, u)
        return stat, viol

    batch_shape = x_out.shape[:-1]
    kkt_rescued = jnp.zeros(batch_shape, jnp.bool_)
    stat_f = viol_f = None
    for _pol_pass in range(settings.polish_passes):
        _, grad_f = f_lin(x_out)
        c_f, J_f = c_lin(x_out)
        # shifted-bound QP around x_out: active rows enforce
        # J dx = b - c(x); equality rows are always active
        act, b_t = guess_active_set(l - c_f, u - c_f, lam_out)
        H = hess_fn(x_out, lam_out)
        J_m = jnp.where(act[..., None], J_f, 0.0)
        dx, nu, fail_pol = kkt_solve_schur_refined(
            H, J_m, act, -grad_f, b_t, nu0=lam_out,
            delta=settings.polish_delta, sweeps=settings.polish_sweeps,
        )
        x_pol = x_out + dx
        lam_pol = jnp.where(act, nu, 0.0)

        bad = jnp.isnan(x_pol).any(-1) | jnp.isnan(lam_pol).any(-1) | fail_pol
        stat_p, viol_p = kkt_parts(x_pol, lam_pol)
        if _pol_pass == 0:
            stat_o, viol_o = kkt_parts(x_out, lam_out)
        else:
            # the previous pass already scored the accepted point
            stat_o, viol_o = stat_f, viol_f
        better = (jnp.maximum(stat_p, viol_p) < jnp.maximum(stat_o, viol_o)) & (
            ~bad
        )
        x_out = jnp.where(better[..., None], x_pol, x_out)
        lam_out = jnp.where(better[..., None], lam_pol, lam_out)
        # status refresh: judge the FINAL point against the KKT tolerances
        stat_f = jnp.where(better, stat_p, stat_o)
        viol_f = jnp.where(better, viol_p, viol_o)
        kkt_rescued = (stat_f <= settings.eps_dual) & (viol_f <= settings.eps_prim)
    return x_out, lam_out, kkt_rescued


def polish_nlp_t(
    x_out,
    lam_out,
    l,
    u,
    f_lin,
    c_lin_t,
    hess_fn_t,
    settings,
    interpret: bool = False,
):
    """Transposed-layout polish epilogue — the kernel tier's form of
    :func:`polish_nlp`.

    Identical algorithm (``polish_passes`` Newton-KKT steps on the
    guessed active set, per-problem lexicographic accept, status
    refresh), but the Jacobian and Hessian never leave the kernel's
    (..., B)-minor layout: each pass's whole KKT solve (Gram + Cholesky
    + triangular inverse + refinement sweeps) runs as ONE Pallas call
    (:func:`sqp_solver_tpu.ops.qp_kernel.polish_kkt_kernel`).  Measured
    at n=128 B=1024: the batch-first epilogue paid two (B, n, n)-scale
    relayouts plus ~20 XLA dispatches per pass — the dominant cost of
    the whole bench config after round 3's factorization work.

    Every pass factors fresh.  The kernel's per-tile factor-reuse input
    (``polish_kkt_kernel(actt_prev=, li_prev=)``) is deliberately NOT
    used here: each pass RE-LINEARIZES, and the preconditioner's
    (1/delta)-scaled Gram term amplifies Jacobian drift ~1/delta x — a
    5e-3 Newton step moved ||M|| by ~40 x lambda_min on the benchmark
    family and stalled the reused sweeps at the previous pass's error
    (measured round 3: err_p99 1.1e-7 -> 5.7e-5).  Reuse is sound only
    when J is FIXED between solves (linear constraints / QP polish).

    Tier adapters:
      * ``f_lin(x) -> (obj, grad)`` with batch-first vectors
      * ``c_lin_t(x) -> (c (B, m), J_t (m, n, B))`` — kernel layout
      * ``hess_fn_t(x, lam) -> (n, n, B)`` true Lagrangian Hessian in
        kernel layout, NaN fallback already applied

    Returns ``(x, lam, kkt_rescued)`` exactly like :func:`polish_nlp`
    (parity asserted by tests/test_polish.py).
    """
    from sqp_solver_tpu.ops.qp_kernel import polish_kkt_kernel
    from sqp_solver_tpu.qp.polish import guess_active_set

    # The whole-pass polish kernel's design envelope is n <= 128: at
    # n=192 (btd-nlp bench config) Mosaic's register allocator spills
    # ~106 MB and the call exceeds the 127 MB VMEM cap outright
    # (measured round 5).  Larger n delegates to the batch-first
    # epilogue — same algorithm, same accept rule (parity-tested), two
    # extra relayouts that are noise at the small batches where such n
    # appear.
    if x_out.shape[-1] > 128:
        def c_lin(xx):
            cv, Jt = c_lin_t(xx)
            return cv, jnp.moveaxis(Jt, -1, 0)

        def hess_fn(xx, ll):
            return jnp.moveaxis(hess_fn_t(xx, ll), -1, 0)

        return polish_nlp(
            x_out, lam_out, l, u, f_lin, c_lin, hess_fn, settings
        )

    def stat_of(g, Jt, ll):
        return _linf(
            g + jnp.einsum("mnb,bm->bn", Jt, ll, precision=lax.Precision.HIGHEST)
        )

    batch_shape = x_out.shape[:-1]
    dtype = x_out.dtype
    kkt_rescued = jnp.zeros(batch_shape, jnp.bool_)
    stat_f = viol_f = None
    # linearize ONCE up front; later passes reuse the scoring step's
    # linearization of whichever point they accepted (a per-lane select
    # instead of a second full c_lin_t/f_lin evaluation per pass)
    _, grad_f = f_lin(x_out)
    c_f, J_t = c_lin_t(x_out)  # (B, m), (m, n, B)
    for _pol_pass in range(settings.polish_passes):
        act, b_t = guess_active_set(l - c_f, u - c_f, lam_out)
        H_t = hess_fn_t(x_out, lam_out)  # (n, n, B)
        act_t = act.T.astype(dtype)  # (m, B)
        # J is masked by act INSIDE the kernel (saves the (m, n, B)
        # XLA-level mask pass)
        dx_t, nu_t, fail_row, _ = polish_kkt_kernel(
            H_t, J_t, act_t, -grad_f.T, b_t.T, lam_out.T,
            delta=settings.polish_delta, sweeps=settings.polish_sweeps,
            interpret=interpret,
        )
        fail_pol = fail_row > 0.5  # kernel emits an f32 0/1 row
        x_pol = x_out + dx_t.T
        lam_pol = jnp.where(act, nu_t.T, 0.0)

        bad = jnp.isnan(x_pol).any(-1) | jnp.isnan(lam_pol).any(-1) | fail_pol
        _, g_p = f_lin(x_pol)
        c_p, J_p = c_lin_t(x_pol)
        stat_p = stat_of(g_p, J_p, lam_pol)
        viol_p = max_violation(c_p, l, u)
        if _pol_pass == 0:
            stat_o = stat_of(grad_f, J_t, lam_out)
            viol_o = max_violation(c_f, l, u)
        else:
            # the previous pass already scored the accepted point
            stat_o, viol_o = stat_f, viol_f
        better = (jnp.maximum(stat_p, viol_p) < jnp.maximum(stat_o, viol_o)) & (
            ~bad
        )
        x_out = jnp.where(better[..., None], x_pol, x_out)
        lam_out = jnp.where(better[..., None], lam_pol, lam_out)
        stat_f = jnp.where(better, stat_p, stat_o)
        viol_f = jnp.where(better, viol_p, viol_o)
        kkt_rescued = (stat_f <= settings.eps_dual) & (viol_f <= settings.eps_prim)
        if _pol_pass + 1 < settings.polish_passes:
            # next pass's linearization at the accepted point, by select
            grad_f = jnp.where(better[..., None], g_p, grad_f)
            c_f = jnp.where(better[..., None], c_p, c_f)
            J_t = jnp.where(better[None, None, :], J_p, J_t)
    return x_out, lam_out, kkt_rescued
