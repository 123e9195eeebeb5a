"""OSQP §3.4 infeasibility certificates from ADMM iterate deltas.

A nonzero ``dy`` with ``A'dy ~ 0`` and support function
``u'(dy)_+ + l'(dy)_- < 0`` proves no x satisfies ``l <= Ax <= u``
(PRIMAL_INFEASIBLE); a nonzero ``dx`` with ``P dx ~ 0``, ``q'dx < 0`` and
``A dx`` a recession direction of the constraint box proves the objective
is unbounded below on the feasible set (DUAL_INFEASIBLE).  ADMM iterate
deltas converge to such certificates on infeasible problems (Banjac et
al., "Infeasibility detection in the alternating direction method of
multipliers for convex optimization"); checking them at termination-check
cadence is OSQP's scheme.

The reference has no analog: it can only hit MAX_ITER_EXCEEDED on an
infeasible problem (``src/qp.cpp:147-149``).

Loose-bound sentinels (|bound| > LOOSE_BOUNDS_THRESH, possibly ±inf) are
replaced by finite ±BIG before the support products, keeping the math
NaN-free while preserving the semantics: any positive dual delta on a
loose row destroys the certificate.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from sqp_solver_tpu.qp.classify import LOOSE_BOUNDS_THRESH

__all__ = ["infeasibility_certificates"]

_BIG = 1e20


def infeasibility_certificates(P, A, q, l, u, dx, dy, eps_pinf, eps_dinf):
    """Evaluate both certificates for (batches of) QPs.

    All arrays batch over leading dims; returns bool masks
    ``(primal_infeasible, dual_infeasible)`` of the batch shape.
    """
    hp = lax.Precision.HIGHEST
    linf = lambda v: jnp.max(jnp.abs(v), axis=-1)
    # dispatch per operand: P and A may independently be BlockSparse or
    # dense (mixed problems are legal on the CG path)
    P_sparse = hasattr(P, "mv")
    A_sparse = hasattr(A, "mv")

    # --- primal: the dual delta certifies l <= Ax <= u empty --------------
    norm_dy = linf(dy)
    ATdy = (
        A.rmv(dy)
        if A_sparse
        else jnp.einsum("...mn,...m->...n", A, dy, precision=hp)
    )
    dy_pos = jnp.maximum(dy, 0.0)
    dy_neg = jnp.minimum(dy, 0.0)
    u_eff = jnp.where(u > LOOSE_BOUNDS_THRESH, _BIG, u)
    l_eff = jnp.where(l < -LOOSE_BOUNDS_THRESH, -_BIG, l)
    sup = jnp.sum(u_eff * dy_pos + l_eff * dy_neg, axis=-1)
    prim = (
        (norm_dy > 0.0)
        & (linf(ATdy) <= eps_pinf * norm_dy)
        & (sup <= -eps_pinf * norm_dy)
    )

    # --- dual: the primal delta certifies an unbounded descent ray --------
    norm_dx = linf(dx)
    Pdx = (
        P.mv(dx)
        if P_sparse
        else jnp.einsum("...ij,...j->...i", P, dx, precision=hp)
    )
    Adx = (
        A.mv(dx)
        if A_sparse
        else jnp.einsum("...mn,...n->...m", A, dx, precision=hp)
    )
    qdx = jnp.sum(q * dx, axis=-1)
    tol = eps_dinf * norm_dx[..., None]
    ray_ok = jnp.all(
        jnp.where(u <= LOOSE_BOUNDS_THRESH, Adx <= tol, True)
        & jnp.where(l >= -LOOSE_BOUNDS_THRESH, Adx >= -tol, True),
        axis=-1,
    )
    dual = (
        (norm_dx > 0.0)
        & (linf(Pdx) <= eps_dinf * norm_dx)
        & (qdx <= -eps_dinf * norm_dx)
        & ray_ok
    )
    return prim, dual
