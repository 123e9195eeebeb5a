"""Constraint classification and per-constraint step sizes (rho).

Vectorized equivalent of the reference's row loop (C8,
``src/qp.cpp:284-314``): each constraint row is classified as loose /
equality / inequality from its bounds, and gets a per-row ADMM penalty.
Same constants, same precedence (loose wins over equality), expressed as
``jnp.where`` masks so it is jit/vmap-trivial.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "INEQUALITY_CONSTRAINT",
    "EQUALITY_CONSTRAINT",
    "LOOSE_BOUNDS",
    "RHO_MIN",
    "RHO_MAX",
    "RHO_TOL",
    "RHO_EQ_FACTOR",
    "LOOSE_BOUNDS_THRESH",
    "constr_type_init",
    "rho_vec_from_type",
]

# Same enum ordering as the reference (include/solvers/qp.hpp:134).
INEQUALITY_CONSTRAINT = 0
EQUALITY_CONSTRAINT = 1
LOOSE_BOUNDS = 2

# Constants from include/solvers/qp.hpp:136-141.
RHO_MIN = 1e-6
RHO_MAX = 1e6
RHO_TOL = 1e-4
RHO_EQ_FACTOR = 1e3
LOOSE_BOUNDS_THRESH = 1e16


def constr_type_init(l: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Classify each constraint row from its bounds.

    Returns an int32 vector of {INEQUALITY_CONSTRAINT, EQUALITY_CONSTRAINT,
    LOOSE_BOUNDS} codes (reference truth table: ``src/qp.cpp:284-294``).
    """
    loose = (l < -LOOSE_BOUNDS_THRESH) & (u > LOOSE_BOUNDS_THRESH)
    equality = (u - l) < RHO_TOL
    return jnp.where(
        loose,
        LOOSE_BOUNDS,
        jnp.where(equality, EQUALITY_CONSTRAINT, INEQUALITY_CONSTRAINT),
    ).astype(jnp.int32)


def rho_vec_from_type(constr_type: jnp.ndarray, rho0, dtype) -> jnp.ndarray:
    """Per-constraint rho: RHO_MIN on loose rows, RHO_EQ_FACTOR*rho0 on
    equality rows, rho0 otherwise (reference ``src/qp.cpp:297-314``)."""
    rho0 = jnp.asarray(rho0, dtype)
    return jnp.where(
        constr_type == LOOSE_BOUNDS,
        jnp.asarray(RHO_MIN, dtype),
        jnp.where(constr_type == EQUALITY_CONSTRAINT, RHO_EQ_FACTOR * rho0, rho0),
    )
